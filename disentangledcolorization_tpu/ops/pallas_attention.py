"""Pallas TPU kernel: fused multi-head attention core over superpixel tokens.

The DISCO token sequence is tiny (256 tokens x 64 dims x 8 heads), so the whole
attention — per-head logits, numerically-stable softmax, value mix — fits in
VMEM and fuses into one pass per batch element. Matches torch
nn.MultiheadAttention math (models/transformer.py::MultiheadAttention applies
the same core after the packed qkv projection).

Used via ``fused_attention(q, k, v, nhead)`` on already-projected per-head
inputs; the surrounding projections stay in XLA (dense matmuls it handles
optimally). Runs in interpret mode off-TPU.

RETIRED from the production path — measured on v5e (tools/pallas_bench.py,
scan-chain amortized, batch 16 x 256 tokens x 64 dims x 8 heads):
XLA core < ~5 us/call (below subtraction noise), this kernel 136.6 us/call.
At 256x64 the whole attention fits one MXU pass and XLA's fusion is already
optimal; the per-head Python loop here serializes 8 tiny matmuls. Kept as a
correctness-tested reference implementation only (test_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, nhead: int):
    t, d = q_ref.shape[1], q_ref.shape[2]
    hd = d // nhead
    scale = 1.0 / (hd**0.5)
    outs = []
    for h in range(nhead):
        sl = slice(h * hd, (h + 1) * hd)
        qh = q_ref[0, :, sl] * scale  # (T, hd)
        kh = k_ref[0, :, sl]
        vh = v_ref[0, :, sl]
        logits = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (T, T)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        s = jnp.sum(p, axis=-1, keepdims=True)
        outs.append(
            jax.lax.dot_general(
                p / s, vh, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
        )
    o_ref[0] = jnp.concatenate(outs, axis=-1)


@functools.partial(jax.jit, static_argnames=("nhead",))
def fused_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, nhead: int = 8) -> jnp.ndarray:
    """(N, T, D) projected q/k/v -> (N, T, D) attention output (no dropout)."""
    n, t, d = q.shape
    kernel = functools.partial(_attn_kernel, nhead=nhead)
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
            for _ in range(3)
        ],
        out_specs=pl.BlockSpec((1, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, t, d), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32))
