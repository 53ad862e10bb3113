"""On-chip Pallas-vs-XLA timing at production shapes (prove-or-retire).

Times the two remaining Pallas kernels against their XLA counterparts at the
shapes the flagship path actually runs (batch-16 256x256 inference /
training):

  * attention core (post-qkv-projection): ops/pallas_attention.fused_attention
    vs the einsum+softmax+einsum core of models/transformer.MultiheadAttention
    at (16, 256, 64), 8 heads;
  * gamut soft-encoding: ops/pallas_colorlabel.encode_ab2ind vs
    ops/colorlabel.encode_ab2ind at the token-label shape (16,16,16,2) and a
    full-resolution batch (4,256,256,2).

Methodology matches bench.py: each candidate is chained inside one jitted
lax.scan whose per-iteration INPUT depends on the index (nothing hoistable),
completion is forced by a scalar device-to-host fetch, and the 1-iteration
round-trip is subtracted. Run on the real chip:

    python -m disentangledcolorization_tpu.tools.pallas_bench

Results are recorded in the kernel module docstrings; this script is the
reproduction recipe.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 64


def _per_call_us(make_fn, example, iters=ITERS, repeat=5) -> float:
    """Median-of-best per-call latency via scan-chain amortization."""

    def chained(k):
        @jax.jit
        def f(x0):
            def body(carry, i):
                x = x0 + (1e-6 * i.astype(jnp.float32) + carry * 1e-12)
                out = make_fn(x)
                return carry + out.mean(dtype=jnp.float32).astype(jnp.float32), None

            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(k))
            return acc

        return f

    f1, fN = chained(1), chained(iters + 1)
    float(f1(example))
    float(fN(example))  # compile both

    def timed(fn):
        best = float("inf")
        for _ in range(repeat):
            t0 = time.perf_counter()
            float(fn(example))
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(fN) - timed(f1)) / iters * 1e6


def bench_attention():
    from ..ops.pallas_attention import fused_attention

    n, t, d, h = 16, 256, 64, 8
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.normal(size=(n, t, 3 * d)).astype(np.float32))

    def xla_core(x):
        q, k, v = jnp.split(x, 3, axis=-1)
        hd = d // h
        qh = q.reshape(n, t, h, hd)
        kh = k.reshape(n, t, h, hd)
        vh = v.reshape(n, t, h, hd)
        logits = jnp.einsum("nqhd,nkhd->nhqk", qh / np.sqrt(hd), kh)
        attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return jnp.einsum("nhqk,nkhd->nqhd", attn, vh).reshape(n, t, d)

    def pallas_core(x):
        q, k, v = jnp.split(x, 3, axis=-1)
        return fused_attention(q, k, v, nhead=h)

    us_xla = _per_call_us(xla_core, qkv)
    us_pal = _per_call_us(pallas_core, qkv)
    print(f"attention core (16,256,64)x8h:  XLA {us_xla:8.1f} us   Pallas {us_pal:8.1f} us   "
          f"winner: {'Pallas' if us_pal < us_xla else 'XLA'} ({max(us_xla, us_pal) / min(us_xla, us_pal):.2f}x)")
    return us_xla, us_pal


def bench_encode(shape):
    from ..ops import colorlabel as cl
    from ..ops import pallas_colorlabel as pcl

    rng = np.random.default_rng(1)
    ab = jnp.asarray(rng.uniform(-1, 1, shape).astype(np.float32))
    us_xla = _per_call_us(lambda x: cl.encode_ab2ind(x, backend="xla"), ab)
    us_pal = _per_call_us(lambda x: pcl.encode_ab2ind(x), ab)
    print(f"gamut encode {str(shape):>16}:  XLA {us_xla:8.1f} us   Pallas {us_pal:8.1f} us   "
          f"winner: {'Pallas' if us_pal < us_xla else 'XLA'} ({max(us_xla, us_pal) / min(us_xla, us_pal):.2f}x)")
    return us_xla, us_pal


def bench_affinity_head(n=32, h=256, w=256, c=16):
    from ..ops import pallas_affinity as pa

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(n, h, w, c))).astype(jnp.bfloat16)
    kernel = jnp.asarray(rng.normal(size=(3, 3, c, 9)).astype(np.float32) * 0.2)
    bias = jnp.asarray(rng.normal(size=(9,)).astype(np.float32) * 0.1)
    # the scan harness promotes its perturbed input to f32; cast back so both
    # legs see the production dtype (bf16 c0 activations)
    us_xla = _per_call_us(lambda v: pa._xla_affinity_head(v.astype(jnp.bfloat16), kernel, bias), x)
    us_pal = _per_call_us(lambda v: pa.fused_affinity_head(v.astype(jnp.bfloat16), kernel, bias), x)
    print(f"affinity head ({n},{h},{w},{c}) bf16:  XLA {us_xla:8.1f} us   Pallas {us_pal:8.1f} us   "
          f"winner: {'Pallas' if us_pal < us_xla else 'XLA'} ({max(us_xla, us_pal) / min(us_xla, us_pal):.2f}x)")
    return us_xla, us_pal


def main():
    print(f"backend: {jax.default_backend()}, device: {jax.devices()[0]}")
    bench_attention()
    bench_encode((16, 16, 16, 2))
    bench_encode((4, 256, 256, 2))
    bench_affinity_head()


if __name__ == "__main__":
    main()
