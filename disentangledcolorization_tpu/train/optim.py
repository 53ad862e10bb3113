"""Optimizers & LR schedules (optax), mirroring the reference recipes.

Capability parity with /root/reference/main/utils_train.py:20-45
(build_optimizer: adam/sgd; build_LR_scheduler: linear-polynomial 'poly',
cosine, plateau). The plateau policy is host-driven (see ``PlateauState``)
because it keys off validation loss between epochs, outside the jitted step.
"""

from __future__ import annotations

from dataclasses import dataclass

import optax


def build_schedule(
    name: str,
    base_lr: float,
    total_epochs: int,
    steps_per_epoch: int,
    decay_ratio: float = 1.0,
):
    import jax.numpy as jnp

    if name in ("poly", "linear"):
        def schedule(step):
            frac_epoch = step / max(steps_per_epoch, 1)
            return base_lr * jnp.maximum(1.0 - decay_ratio * frac_epoch / max(total_epochs, 1), 0.0)
        return schedule
    if name == "cosine":
        return optax.cosine_decay_schedule(base_lr, total_epochs * steps_per_epoch)
    if name in ("plateau", "constant"):
        return base_lr  # plateau handled host-side via PlateauState scaling
    raise ValueError(f"unknown schedule {name!r}")


def build_optimizer(
    name: str = "adam",
    schedule=2e-4,
    weight_decay: float = 0.0,
    beta1: float = 0.9,
    beta2: float = 0.999,
    momentum: float = 0.9,
    grad_clip: float = 0.0,
) -> optax.GradientTransformation:
    """adam / sgd, matching reference defaults (utils_train.py:20-30).

    ``grad_clip`` > 0 prepends global-norm clipping. The reference never
    clips, so the default is off — but the soft-pool normalization
    (ops/superpixel.py::poolfeat: feat_sum / (mass + 1e-8)) has a
    1/mass**2 backward that explodes when a superpixel's soft mass
    collapses toward zero (observed: healthy 17-epoch descent, then NaN,
    small-batch overfit run 2026-08-19). Clipping bounds that spike
    without changing forward semantics.
    """
    if name == "adam":
        tx = optax.adam(schedule, b1=beta1, b2=beta2)
    elif name == "sgd":
        tx = optax.sgd(schedule, momentum=momentum)
    else:
        raise ValueError(f"unknown optimizer {name!r}")
    if weight_decay:
        tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    if grad_clip and grad_clip > 0:
        # clip alone is not enough: an Inf gradient (f32 overflow in the
        # backward) times a zero clip factor is NaN — so also skip whole
        # updates that contain non-finite values (finite-but-huge ones are
        # clipped; Inf/NaN ones are dropped, and training continues)
        tx = optax.apply_if_finite(
            optax.chain(optax.clip_by_global_norm(grad_clip), tx),
            max_consecutive_errors=100,
        )
    return tx


@dataclass
class PlateauState:
    """Host-side reduce-on-plateau (torch ReduceLROnPlateau semantics).

    Multiply the schedule's output via ``scale``; call ``update`` with each
    validation loss.
    """

    factor: float = 0.5
    patience: int = 3
    best: float = float("inf")
    bad_epochs: int = 0
    scale: float = 1.0

    def update(self, val_loss: float) -> float:
        if val_loss < self.best - 1e-8:
            self.best = val_loss
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.scale *= self.factor
                self.bad_epochs = 0
        return self.scale


def adapt_opt_state(new_state, old_state):
    """Graft a restored optimizer state into a fresh one whose wrapper
    structure differs only by the ``grad_clip`` wrapper.

    A checkpoint saved without ``--grad_clip`` stores the bare optimizer
    state; resuming WITH clipping wraps it in
    ``ApplyIfFiniteState(..., inner_state=(clip EmptyState, <bare state>))``
    (and vice versa). Orbax restores strictly by structure, so the trainer's
    own NaN-abort advice — "resume with --grad_clip > 0" — would otherwise
    be impossible to follow. This walks the two states in lockstep
    (multi_transform partitions and masked wrappers descend together),
    inserts or strips exactly the apply_if_finite/clip layer, and keeps the
    restored Adam moments/counts bit-intact. Raises on any other mismatch.

    The reference's torch checkpoints have no analogous problem only because
    torch restores optimizer state by parameter-id, silently dropping
    mismatches (utils_train.py:140-168); this is the explicit equivalent.
    """
    import jax

    ts = jax.tree_util.tree_structure
    if ts(new_state) == ts(old_state):
        return old_state
    new_aif = hasattr(new_state, "notfinite_count")
    old_aif = hasattr(old_state, "notfinite_count")
    # multi_transform partitions: descend per label
    if hasattr(new_state, "inner_states") and hasattr(old_state, "inner_states"):
        inner = {
            k: adapt_opt_state(new_state.inner_states[k], old_state.inner_states[k])
            for k in new_state.inner_states
        }
        return new_state._replace(inner_states=type(new_state.inner_states)(inner))
    # masked wrappers on both sides: descend
    if (
        hasattr(new_state, "inner_state")
        and hasattr(old_state, "inner_state")
        and not new_aif
        and not old_aif
    ):
        return new_state._replace(
            inner_state=adapt_opt_state(new_state.inner_state, old_state.inner_state)
        )
    if new_aif and not old_aif:
        clip_empty, inner = new_state.inner_state
        return new_state._replace(inner_state=(clip_empty, adapt_opt_state(inner, old_state)))
    if old_aif and not new_aif:
        return adapt_opt_state(new_state, old_state.inner_state[1])
    raise ValueError(
        "optimizer states differ by more than the grad_clip wrapper: "
        f"{type(new_state).__name__} vs {type(old_state).__name__}"
    )
