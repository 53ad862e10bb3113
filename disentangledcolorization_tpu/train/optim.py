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
