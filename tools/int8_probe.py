"""Probe: can int8 convolution beat bf16 on this TPU at DISCO's hot shapes?

v5e's MXU has an int8 mode at ~2x the bf16 FLOP rate (394 vs 197 TOPS), and
DISCO inference is conv-bound at 48.6% bf16 MFU (docs/STATUS.md), so a
quantized conv path is the one lever that could break the measured ceiling.
This microbench times `lax.conv_general_dilated` at the two dominant shapes
(repnet mid-stage, hourglass full-res) in bf16 vs int8xint8->int32, using the
same scan-chain + d2h-sync methodology as bench.py (the axon tunnel returns
from block_until_ready before remote execution finishes).

Prove-or-retire protocol: run this before building any quantized inference
mode; record the measured numbers here and in docs/STATUS.md either way.

MEASURED (v5e, 2026-08-17, batch 32):
  repnet-mid 64x64x512      bf16 3.202 ms (98.1% of 197 TFLOP/s peak)
                            int8 1.637 ms (95.9% of 394 TOPS peak)  -> 1.96x
  hourglass-full 256x256x64 bf16 2.286 ms (34.3% of peak)
                            int8 1.135 ms (34.6% of peak)           -> 2.01x
Verdict: PROVEN — both hot shapes double (the bandwidth-bound full-res shape
too, since int8 halves HBM bytes). End-to-end outcome in docs/STATUS.md:
dynamic activation scales lose (370 img/s vs 381.8 baseline), static
calibrated scales win (499.2, +31%). See ops/quant.py.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 24


def _timed(fn, *args, repeat=3):
    best = float("inf")
    for _ in range(repeat):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def _conv(x, w, dtype, acc):
    return jax.lax.conv_general_dilated(
        x.astype(dtype),
        w.astype(dtype),
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=acc,
    )


def bench_shape(n, h, w_, cin, cout, label):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (n, h, w_, cin)).astype(np.float32))
    k = jnp.asarray(rng.uniform(-1, 1, (3, 3, cin, cout)).astype(np.float32))
    xq = jnp.asarray(rng.integers(-127, 127, (n, h, w_, cin)).astype(np.int8))
    kq = jnp.asarray(rng.integers(-127, 127, (3, 3, cin, cout)).astype(np.int8))
    flops = 2 * n * h * w_ * cin * cout * 9

    def chain(variant, iters):
        # inputs are jit ARGUMENTS (closing over the ~100 MB activation would
        # embed it as a constant and blow the remote-compile request limit)
        @jax.jit
        def f(x0, xa, ka):
            def body(carry, i):
                if variant == "bf16":
                    y = _conv(xa + carry * 1e-12, ka, jnp.bfloat16, jnp.float32)
                    return carry + y.mean(dtype=jnp.float32), None
                # int8 path: iteration-dependent input via xor to stay int8
                xi = xa ^ (i % 2).astype(jnp.int8)
                y = _conv(xi, ka, jnp.int8, jnp.int32)
                return carry + y.sum(dtype=jnp.float32) * 1e-12, None

            acc, _ = jax.lax.scan(body, x0, jnp.arange(iters))
            return acc

        return f

    for variant in ("bf16", "int8"):
        xa, ka = (x, k) if variant == "bf16" else (xq, kq)
        try:
            f1 = chain(variant, 1)
            fN = chain(variant, ITERS + 1)
            f1(jnp.float32(0), xa, ka)
            fN(jnp.float32(0), xa, ka)
            d = max(
                (_timed(fN, jnp.float32(0), xa, ka) - _timed(f1, jnp.float32(0), xa, ka))
                / ITERS,
                1e-9,
            )
            rate = flops / d / 1e12
            print(
                f"{label:28s} {variant}: {d * 1e3:8.3f} ms  {rate:7.1f} T(FL)OP/s"
                f"  ({rate / (394.0 if variant == 'int8' else 197.0):.1%} of peak)",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(f"{label:28s} {variant}: FAILED {type(e).__name__}: {e}", flush=True)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    bench_shape(32, 64, 64, 512, 512, "repnet-mid 64x64x512")
    bench_shape(32, 256, 256, 64, 64, "hourglass-full 256x256x64")


if __name__ == "__main__":
    main()
