"""Benchmark: 256x256 batch colorization inference throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (vs_baseline denominator): the PyTorch reference running the same
AnchorColorProb forward (enhanced, 8 anchors, 256x256) on CPU. The reference
publishes no throughput numbers (SURVEY.md section 6), so the baseline was
measured once in this container with torch 2.x CPU via tools/bench_torch_ref.py
and is pinned below. BASELINE.json's north star is >=10x that number.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# PyTorch-CPU reference throughput measured with tools/bench_torch_ref.py
# (batch=4, 256x256, AnchorColorProb enhanced + kmeans anchors, this 1-core host:
# 0.32 images/sec).
TORCH_CPU_BASELINE_IMG_PER_S = 0.32

BATCH = 8
H = W = 256
WARMUP = 2
ITERS = 10


def main():
    from disentangledcolorization_tpu.models import AnchorColorProb

    model = AnchorColorProb(sp_size=16, n_clusters=8, enhanced=True)
    rng = np.random.default_rng(0)
    grays = jnp.asarray(rng.uniform(-1, 1, (BATCH, H, W, 1)).astype(np.float32))
    colors = jnp.zeros((BATCH, H, W, 2), jnp.float32)
    variables = model.init(
        {"params": jax.random.key(0), "anchor": jax.random.key(1)}, grays, colors, True, 0, False
    )

    @jax.jit
    def forward(variables, grays, colors, key):
        out = model.apply(variables, grays, colors, True, 0, False, rngs={"anchor": key})
        return out["pred_colors"]

    key = jax.random.key(2)
    for _ in range(WARMUP):
        forward(variables, grays, colors, key).block_until_ready()
    t0 = time.perf_counter()
    for i in range(ITERS):
        out = forward(variables, grays, colors, jax.random.fold_in(key, i))
    out.block_until_ready()
    dt = time.perf_counter() - t0
    img_per_s = BATCH * ITERS / dt
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
