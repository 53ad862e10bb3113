"""TPU self-check: kernel exactness + amortized timing on the attached chip.

Run with the real TPU attached (no env overrides):

    python -m disentangledcolorization_tpu.tools.tpu_check

Validates on-device numerics of the label-critical ops against float64 host
ground truth, runs the Pallas kernels compiled (not interpreted), and reports
amortized per-op timings using the only methodology that is honest through the
axon tunnel (see docs/STATUS.md): chained lax.scan with a carry dependency
(loop-invariant bodies get hoisted!) plus a device-to-host scalar sync, minus
the measured single-call round trip.
"""

from __future__ import annotations

import math
import time
import timeit

import jax
import jax.numpy as jnp
import numpy as np


def timed_amortized(fn, *args, iters: int = 16):
    """Per-call seconds for fn(*args) -> array, amortized over a carry-chained scan."""

    def chained(k):
        @jax.jit
        def f(x0):
            def body(c, i):
                y = fn(args[0] + (c * 1e-12).astype(args[0].dtype), *args[1:])
                return jnp.asarray(y, jnp.float32).mean(), None

            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(k))
            return acc

        return f

    f1, fn_ = chained(1), chained(iters + 1)
    float(f1(0)), float(fn_(0))  # compile
    d1 = min(timeit.repeat(lambda: float(f1(0)), number=1, repeat=3))
    dn = min(timeit.repeat(lambda: float(fn_(0)), number=1, repeat=3))
    return max((dn - d1) / iters, 0.0)


def main():
    from ..ops import colorlabel as cl
    from ..ops import kmeans as km
    from ..ops import pallas_attention as pattn
    from ..ops import pallas_colorlabel as pcl
    from ..ops import pallas_superpixel as psp
    from ..ops import superpixel as sp

    print("backend:", jax.default_backend(), jax.devices())
    rng = np.random.default_rng(0)

    # 1. gamut encoding vs float64 host truth
    ab = jnp.asarray(rng.uniform(-0.5, 0.5, (2, 16, 16, 2)).astype(np.float32))
    bins = np.asarray(cl.q_to_ab(), np.float64)
    flat = np.asarray(ab, np.float64).reshape(-1, 2) * 110
    d2 = ((flat[:, None, :] - bins[None]) ** 2).sum(-1)
    idx = np.argsort(d2, 1)[:, :5]
    g = (1 / (2 * math.pi * 5)) * np.exp(-np.take_along_axis(d2, idx, 1) / 50)
    g = g / g.sum(1, keepdims=True)
    truth = np.zeros((flat.shape[0], 313))
    np.put_along_axis(truth, idx, g, 1)
    truth = truth.reshape(np.asarray(ab).shape[:3] + (313,))
    for name, fn in (("jnp", cl.encode_ab2ind), ("pallas", pcl.encode_ab2ind)):
        diff = float(np.abs(np.asarray(fn(ab)) - truth).max())
        status = "OK" if diff < 1e-5 else "FAIL"
        print(f"encode[{name}] vs f64 truth: {diff:.2e} {status}")

    # 2. pool/unpool pallas vs jnp on-device
    feat = jnp.asarray(rng.normal(size=(4, 256, 256, 66)).astype(np.float32))
    prob = jax.nn.softmax(jnp.asarray(rng.normal(size=(4, 256, 256, 9)).astype(np.float32)), -1)
    tok = jnp.asarray(rng.normal(size=(4, 16, 16, 64)).astype(np.float32))
    d_pool = float(jnp.abs(sp.poolfeat(feat, prob) - psp.poolfeat(feat, prob)).max())
    d_up = float(jnp.abs(sp.upfeat(tok, prob) - psp.upfeat(tok, prob)).max())
    print(f"pool pallas vs jnp: {d_pool:.2e}; up: {d_up:.2e}")

    # 3. fused attention vs einsum reference
    q = jnp.asarray(rng.normal(size=(2, 256, 64)).astype(np.float32))
    qh = q.reshape(2, 256, 8, 8)
    logits = jnp.einsum("nqhd,nkhd->nhqk", qh / np.sqrt(8), qh, precision="highest")
    ref = jnp.einsum("nhqk,nkhd->nqhd", jax.nn.softmax(logits, -1), qh, precision="highest")
    d_attn = float(jnp.abs(pattn.fused_attention(q, q, q, 8) - ref.reshape(2, 256, 64)).max())
    # the kernel's MXU dots take bf16 inputs (standard TPU attention); the
    # reference here is precision="highest", so ~1e-2 is the expected gap
    print(f"attention pallas vs f32 einsum: {d_attn:.2e} (bf16-input MXU, expected ~1e-2)")

    # 4. amortized timings
    print(f"poolfeat: {timed_amortized(lambda f: sp.poolfeat(f, prob), feat) * 1e6:.0f} us")
    print(f"upfeat:   {timed_amortized(lambda t: sp.upfeat(t, prob), tok) * 1e6:.0f} us")
    print(
        "kmeans:   "
        f"{timed_amortized(lambda d: km.batch_kmeans_masks(jax.random.key(0), d, 8), tok) * 1e6:.0f} us"
    )


if __name__ == "__main__":
    main()
