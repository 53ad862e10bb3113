"""Benchmark: 256x256 batch colorization inference throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Timing methodology: under the axon TPU tunnel, ``block_until_ready`` returns
before remote execution finishes, so a naive timer measures dispatch, not
compute. The benchmark therefore (a) chains ITERS forwards inside one jitted
``lax.scan`` (fresh anchor key per iteration, output folded into the carry so
nothing is dead-code-eliminated), (b) forces completion with a scalar
device-to-host transfer, and (c) subtracts the measured single-call round-trip
overhead to isolate device throughput.

Baseline (vs_baseline denominator): the PyTorch reference running the same
workload on CPU (tools/bench_torch_ref.py, this host: 0.32 images/sec).
The reference repo publishes no throughput numbers (SURVEY.md section 6).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

TORCH_CPU_BASELINE_IMG_PER_S = 0.32

BATCH = 16  # sweet spot on v5e: 2x the batch-8 throughput at equal latency
H = W = 256
ITERS = 12


def _timed(fn, *args, repeat=3):
    best = float("inf")
    for _ in range(repeat):
        t0 = time.perf_counter()
        float(fn(*args))  # scalar host transfer = true sync
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from disentangledcolorization_tpu.models import AnchorColorProb

    # production inference config: folded spectral norm (converted weights) +
    # bf16 conv activations (f32 params/stats/token-path)
    model = AnchorColorProb(
        sp_size=16, n_clusters=8, enhanced=True, sn_folded=True, compute_dtype=jnp.bfloat16
    )
    rng = np.random.default_rng(0)
    grays = jnp.asarray(rng.uniform(-1, 1, (BATCH, H, W, 1)).astype(np.float32))
    colors = jnp.zeros((BATCH, H, W, 2), jnp.float32)
    variables = model.init(
        {"params": jax.random.key(0), "anchor": jax.random.key(1)}, grays, colors, True, 0, False
    )

    def one_forward(key):
        out = model.apply(variables, grays, colors, True, 0, False, rngs={"anchor": key})
        return out["pred_colors"]

    def chained(k):
        @jax.jit
        def f(key0):
            def body(carry, i):
                key = jax.random.fold_in(key0, i)
                pred = one_forward(key)
                # fold result into carry so every iteration is live
                return carry + pred.mean(), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(k))
            return acc
        return f

    f1 = chained(1)
    fN = chained(ITERS + 1)

    def _compile_with_retry(fn, *args, attempts=3):
        # the axon remote-compile tunnel occasionally drops a response body;
        # a retry recompiles cleanly
        for i in range(attempts):
            try:
                return fn(*args)
            except Exception as e:  # noqa: BLE001
                if i == attempts - 1:
                    raise
                import sys

                print(
                    f"# compile attempt {i + 1} failed ({type(e).__name__}); retrying",
                    file=sys.stderr,
                    flush=True,
                )
                time.sleep(10)

    _compile_with_retry(f1, jax.random.key(2))
    _compile_with_retry(fN, jax.random.key(2))
    d1 = _timed(f1, jax.random.key(3))
    dN = _timed(fN, jax.random.key(3))
    per_forward = max((dN - d1) / ITERS, 1e-9)
    img_per_s = BATCH / per_forward
    print(
        json.dumps(
            {
                "metric": "disco_256x256_batch_inference_throughput",
                "value": round(img_per_s, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(img_per_s / TORCH_CPU_BASELINE_IMG_PER_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
