"""Jitted train/eval steps for both training stages, data-parallel via sharding.

Replaces the reference's per-GPU DDP step (train_colorizer.py:135-163,
train_spixel.py:116-170): one jit-compiled function over a batch-sharded global
array; XLA inserts the gradient all-reduce over the mesh. BatchNorm batch
statistics are global-batch statistics under pjit (SyncBN semantics).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import colorlabel as cl
from . import losses as losses_lib
from .state import TrainState


def make_spixel_train_step(model, kernel_size: int = 16):
    """SpixelNet pretraining step. Batch: {'gray': (N,H,W,1), 'feat': (N,H,W,F),
    'coord': (N,H,W,2)} where feat is the reconstruction feature (ab or BGR,
    --feat flag) and coord the static (x, y) grid / pack_meta_data equivalent
    (train_spixel.py:237-248)."""

    def step(state: TrainState, batch: dict, dropout_key):
        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            prob, mutated = model.apply(
                variables, batch["gray"], mutable=["batch_stats"]
            )
            labxy = jnp.concatenate([batch["feat"], batch["coord"]], axis=-1)
            metrics = losses_lib.spixel_loss(prob, labxy, kernel_size)
            return metrics["totalLoss"], (metrics, mutated)

        (loss, (metrics, mutated)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        new_state = state.apply_gradients(grads, new_batch_stats=mutated.get("batch_stats"))
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,))


def make_micro_grads(
    model,
    loss_bundle: losses_lib.AnchorColorProbLoss,
    remat: bool = False,
    class_lambda: float = 0.5,
):
    """Gradient/metrics/mutated-collections function for one (micro)batch of
    the colorizer objective — the shared core of the plain and
    gradient-accumulating train steps."""

    def micro_grads(params, batch_stats, spectral, gray, color, anchor_key, dropout_key):
        def forward(params, gray, color):
            variables = {
                "params": params,
                "batch_stats": batch_stats,
                "spectral": spectral,
            }
            return model.apply(
                variables,
                gray,
                color,
                False,  # test_mode
                0,
                True,  # train
                rngs={"anchor": anchor_key, "dropout": dropout_key},
                mutable=["batch_stats", "spectral"],
            )

        fwd = jax.checkpoint(forward) if remat else forward

        def loss_fn(params):
            out, mutated = fwd(params, gray, color)
            gt_labels = out["token_labels"]
            class_w = cl.get_classweights(gt_labels, class_lambda)
            data = {
                "pal_logit": out["pal_logit"],
                "ref_logit": out["ref_logit"],
                "target_label": gt_labels,
                "class_weight": class_w,
                "spix_color": out["spix_colors"],
                "input_gray": gray,
                "input_color": color,
                "pred_color": out["pred_colors"],
            }
            metrics = loss_bundle(data)
            return metrics["totalLoss"], (metrics, mutated)

        (_, (metrics, mutated)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        return grads, metrics, mutated

    return micro_grads


def make_colorizer_train_step(
    model,
    loss_bundle: losses_lib.AnchorColorProbLoss,
    remat: bool = False,
    class_lambda: float = 0.5,
    grad_accum: int = 1,
):
    """Colorizer training step (stage 2). Batch: {'gray': (N,H,W,1),
    'color': (N,H,W,2)}. The anchor k-means key and dropout key are split from
    a per-step base key for reproducibility. ``remat=True`` rematerializes the
    forward in the backward pass (jax.checkpoint) — trades FLOPs for HBM to fit
    larger per-device batches. ``class_lambda`` is the class-rebalance mix
    (reference ``ColorLabel(lambda_=1 - args.colorfulness)``,
    train_colorizer.py:270-271 — the DISCO-c0.2 checkpoint is
    ``--colorfulness 0.2``).

    ``grad_accum=A`` splits the batch into A equal microbatches inside a
    ``lax.scan``, averages the gradients, and applies ONE optimizer update —
    so the reference's 4-GPU global-batch-96 recipe
    (scripts/train_imagenet_ddp.sh: batch 24 x 4) runs on fewer chips with
    the same effective batch. Each microbatch draws its own anchor/dropout
    keys (fold_in by microbatch index) and updates BatchNorm running stats
    sequentially, matching what A sequential torch forwards would do; loss
    metrics are microbatch means, i.e. the full-batch mean for equal splits.
    """

    micro_grads = make_micro_grads(model, loss_bundle, remat, class_lambda)

    def step(state: TrainState, batch: dict, base_key):
        anchor_key, dropout_key = jax.random.split(jax.random.fold_in(base_key, state.step))

        if grad_accum == 1:
            grads, metrics, mutated = micro_grads(
                state.params,
                state.batch_stats,
                state.spectral,
                batch["gray"],
                batch["color"],
                anchor_key,
                dropout_key,
            )
        else:
            n = batch["gray"].shape[0]
            if n % grad_accum:
                raise ValueError(f"batch size {n} not divisible by grad_accum={grad_accum}")
            micro = jax.tree.map(
                lambda x: x.reshape(grad_accum, n // grad_accum, *x.shape[1:]), batch
            )

            def body(carry, xs):
                grads_acc, batch_stats, spectral = carry
                gray, color, idx = xs
                g, m, mut = micro_grads(
                    state.params,
                    batch_stats,
                    spectral,
                    gray,
                    color,
                    jax.random.fold_in(anchor_key, idx),
                    jax.random.fold_in(dropout_key, idx),
                )
                grads_acc = jax.tree.map(jnp.add, grads_acc, g)
                return (
                    grads_acc,
                    mut.get("batch_stats", batch_stats),
                    mut.get("spectral", spectral),
                ), m

            zeros = jax.tree.map(jnp.zeros_like, state.params)
            (grads, new_bs, new_sp), metrics_seq = jax.lax.scan(
                body,
                (zeros, state.batch_stats, state.spectral),
                (micro["gray"], micro["color"], jnp.arange(grad_accum)),
            )
            grads = jax.tree.map(lambda g: g / grad_accum, grads)
            metrics = jax.tree.map(lambda m: jnp.mean(m, axis=0), metrics_seq)
            mutated = {"batch_stats": new_bs, "spectral": new_sp}

        new_state = state.apply_gradients(
            grads,
            new_batch_stats=mutated.get("batch_stats"),
            new_spectral=mutated.get("spectral"),
        )
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,))


def make_colorizer_eval_step(
    model, loss_bundle: losses_lib.AnchorColorProbLoss, class_lambda: float = 0.5
):
    """Validation step: eval-mode forward (training anchor semantics, no
    dropout/BN update), returns loss metrics (train_colorizer.py:179-213)."""

    def step(state: TrainState, batch: dict, base_key):
        out = model.apply(
            state.variables(),
            batch["gray"],
            batch["color"],
            False,
            0,
            False,
            rngs={"anchor": base_key},
        )
        gt_labels = out["token_labels"]
        class_w = cl.get_classweights(gt_labels, class_lambda)
        data = {
            "pal_logit": out["pal_logit"],
            "ref_logit": out["ref_logit"],
            "target_label": gt_labels,
            "class_weight": class_w,
            "spix_color": out["spix_colors"],
            "input_gray": batch["gray"],
            "input_color": batch["color"],
            "pred_color": out["pred_colors"],
        }
        return loss_bundle(data)

    return jax.jit(step)
