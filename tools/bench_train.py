"""Colorizer train-step throughput on the attached chip (honest methodology).

Times the full jitted stage-2 train step (forward + backward + adam update +
BN/spectral mutation) with the same chained-scan methodology as bench.py:
iteration-dependent inputs, completion forced by a scalar fetch, 1-iteration
overhead subtracted. Reports achieved TFLOP/s and MFU from XLA cost analysis.
Optionally captures a profiler trace.

The loss bundle is built with enhanced=True to match the model: with the
default (enhanced=False) bundle the hourglass decoder gets no gradient and XLA
dead-codes its entire backward — an earlier version of this tool measured that
truncated step (198 img/s at batch 32) and overstated training throughput.
Pass --vgg_npz to time the true VGG19 perceptual objective instead of the
L1 fallback.

``--stage spixel`` times the stage-1 SpixelNet pretraining step instead
(reference recipe: batch 128/GPU, scripts/spixelseg_ab16-imagenet.sh).

Run: python tools/bench_train.py [--stage colorizer|spixel] [--batch 32]
                                 [--dtype bfloat16] [--remat]
                                 [--vgg_npz w.npz] [--trace /tmp/train_trace]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

H = W = 256


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="colorizer", choices=["colorizer", "spixel"])
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--vgg_npz", type=str, default="")
    ap.add_argument("--trace", type=str, default="")
    args = ap.parse_args()

    from disentangledcolorization_tpu.models import AnchorColorProb, SpixelSeg
    from disentangledcolorization_tpu.ops import superpixel as sp
    from disentangledcolorization_tpu.train import losses as L
    from disentangledcolorization_tpu.train import optim, steps
    from disentangledcolorization_tpu.train.state import TrainState

    cdt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    rng = np.random.default_rng(0)
    gray = jnp.asarray(rng.uniform(-1, 1, (args.batch, H, W, 1)).astype(np.float32))
    color = jnp.asarray(rng.uniform(-1, 1, (args.batch, H, W, 2)).astype(np.float32))
    vgg_vars = None

    if args.stage == "colorizer":
        model = AnchorColorProb(
            sp_size=16, n_clusters=8, enhanced=True, compute_dtype=cdt
        )
        variables = jax.jit(model.init, static_argnums=(3, 4, 5))(
            {"params": jax.random.key(0), "anchor": jax.random.key(1), "dropout": jax.random.key(2)},
            gray[:1],
            color[:1],
            False,
            0,
            True,
        )
        jax.block_until_ready(variables)
        tx = optim.build_optimizer("adam", 2e-4)
        state = TrainState.create(variables, tx)
        from disentangledcolorization_tpu.models.vgg import load_vgg19_params

        vgg_vars = load_vgg19_params(args.vgg_npz or None)
        loss_bundle = L.AnchorColorProbLoss(enhanced=True, vgg_variables=vgg_vars)
        step = steps.make_colorizer_train_step(model, loss_bundle, remat=args.remat)

        def make_batch(i):
            return {"gray": gray + 0.001 * i, "color": color}

    else:  # stage-1 SpixelNet pretraining (train_spixel.py recipe, --feat ab)
        args.dtype = "float32"  # SpixelSeg trains f32 like the reference; no bf16 knob
        model = SpixelSeg(train=True)
        variables = jax.jit(model.init)(jax.random.key(0), gray[:1])
        jax.block_until_ready(variables)
        tx = optim.build_optimizer("adam", 5e-5)
        state = TrainState.create(variables, tx)
        _, coord = sp.init_spixel_grid(H, W, 16)
        coord_b = jnp.broadcast_to(jnp.asarray(coord)[None], (args.batch,) + coord.shape)
        step = steps.make_spixel_train_step(model, kernel_size=16)

        def make_batch(i):
            return {"gray": gray + 0.001 * i, "feat": color, "coord": coord_b}

    step_fn = step.__wrapped__  # un-jitted body for in-graph chaining

    # chain k steps inside one jitted scan (bench.py methodology): the state
    # is the carry, each iteration's batch depends on the index, completion
    # is forced by one scalar fetch, and the 1-step chain's round-trip
    # overhead is subtracted.
    def chained(k):
        @jax.jit
        def f(state0):
            def body(st, i):
                batch = make_batch(i.astype(jnp.float32))
                st, metrics = step_fn(st, batch, jax.random.key(3))
                return st, metrics["totalLoss"]

            stN, losses = jax.lax.scan(body, state0, jnp.arange(k))
            return losses[-1]

        return f

    f1, fN = chained(1), chained(args.iters + 1)

    def timed(fn, repeat=3):
        best = float("inf")
        for _ in range(repeat):
            t0 = time.perf_counter()
            float(fn(state))
            best = min(best, time.perf_counter() - t0)
        return best

    float(f1(state))
    float(fN(state))  # compile both
    per_step = (timed(fN) - timed(f1)) / args.iters
    line = (
        f"{args.stage} train step batch {args.batch} {args.dtype} remat={args.remat} "
        f"vgg={bool(vgg_vars)}: "
        f"{per_step*1e3:.1f} ms/step = {args.batch/per_step:.1f} img/s"
    )
    try:
        # cost-analyze a standalone step with the FULL new state as a live
        # output: in the chained(1) graph the final state is unused, so XLA
        # dead-codes the whole backward and the count would be forward-only
        # (verified: scan bodies are also counted once regardless of trip
        # count, so the chain is unusable for FLOPs either way)
        cost = (
            jax.jit(step_fn)
            .lower(state, make_batch(0.0), jax.random.key(3))
            .compile()
            .cost_analysis()
        )
        flops_per_step = float(cost.get("flops", 0.0))
    except Exception as e:  # noqa: BLE001
        print(f"# cost analysis unavailable ({type(e).__name__})", file=sys.stderr)
        flops_per_step = 0.0
    if flops_per_step > 0:
        achieved = flops_per_step / per_step / 1e12
        line += (
            f" | {flops_per_step/args.batch/1e9:.0f} GFLOPs/img, "
            f"{achieved:.1f} TFLOP/s = {achieved/197.0:.1%} MFU (v5e bf16 peak)"
        )
    print(line, flush=True)
    if args.trace:
        # compile the standalone step OUTSIDE the trace (a compile inside the
        # session floods the event buffer and drops the device op events)
        state, metrics = step(state, make_batch(0.0), jax.random.key(4))
        float(metrics["totalLoss"])
        with jax.profiler.trace(args.trace):
            for i in range(3):
                state, metrics = step(state, make_batch(float(i)), jax.random.key(4))
                float(metrics["totalLoss"])
        print(f"trace written to {args.trace} (parse with tools/trace_forward.py --summarize_only)")


if __name__ == "__main__":
    main()
