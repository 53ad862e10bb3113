"""Pallas TPU kernels for the superpixel hot fusions (pool / unpool).

The jnp formulation in ops/superpixel.py materializes a [feat|ones] concat, a
6-D block reshape, and a 9-way neighbor stack. These kernels fuse each op into
a single VMEM-resident pass per superpixel-row:

  pool:  per cell, T = P^T F  (P: (sp*sp, 9) affinity, F: (sp*sp, C) features)
         and mass = column-sums of P — one batched MXU contraction per row,
         no ones-channel materialization. The tiny 9-direction shift-add on
         the (Hc, Wc) token grid stays in XLA (it fuses trivially).
  up:    per cell, out = P S  (S: (9, C) the cell's 9 neighbor tokens) — reads
         each token once from a VMEM-resident padded token grid instead of
         materializing a 9x stacked tensor in HBM.

Numerics match ops/superpixel.py (and therefore the reference fusions,
basic.py:274-376) to float32 round-off; tests/test_pallas.py asserts it.
Kernels run in interpret mode off-TPU so the suite exercises them on CPU.

Measured on TPU v5e (batch 8, 256x256, C=66): XLA's fusion of the einsum
formulation in ops/superpixel.py runs at ~50us (pool) / ~11us (up) per batch,
while these hand-written kernels measure ~760us / ~1130us — the tiny
(256x9)@(256xC) per-cell contractions map poorly onto Mosaic's MXU tiling,
and XLA's elementwise-multiply+block-reduce strategy wins. The jnp ops are
therefore the default hot path (<3% of total forward time); these kernels are
kept as a correct alternative backend and a base for future fusion work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# row-major (dy, dx) neighbor offsets, matching ops/superpixel._OFFSETS
_OFFSETS = tuple((dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1))


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pool_kernel(feat_ref, prob_ref, t_ref, mass_ref, *, sp_h: int, sp_w: int, wc: int):
    """One superpixel row: feat (1, sp_h, W, C), prob (1, sp_h, W, 9) ->
    t (1, 1, Wc, 9, C) per-direction sums, mass (1, 1, Wc, 9)."""
    c = feat_ref.shape[-1]
    # (sp_h, Wc, sp_w, C) -> (Wc, sp_h * sp_w, C)
    f = feat_ref[0].reshape(sp_h, wc, sp_w, c).transpose(1, 0, 2, 3).reshape(wc, sp_h * sp_w, c)
    p = prob_ref[0].reshape(sp_h, wc, sp_w, 9).transpose(1, 0, 2, 3).reshape(wc, sp_h * sp_w, 9)
    # batched over cells: (Wc, 9, C) = P^T @ F
    t = jax.lax.dot_general(
        p, f, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    t_ref[0, 0] = t / (sp_h * sp_w)
    mass_ref[0, 0] = jnp.sum(p, axis=1) / (sp_h * sp_w)


def _pool_sums(feat: jnp.ndarray, prob: jnp.ndarray, sp_h: int, sp_w: int):
    """(N,H,W,C),(N,H,W,9) -> per-cell direction sums (N,Hc,Wc,9,C) + mass (N,Hc,Wc,9)."""
    n, h, w, c = feat.shape
    hc, wc = h // sp_h, w // sp_w
    kernel = functools.partial(_pool_kernel, sp_h=sp_h, sp_w=sp_w, wc=wc)
    t, mass = pl.pallas_call(
        kernel,
        grid=(n, hc),
        in_specs=[
            pl.BlockSpec((1, sp_h, w, c), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp_h, w, 9), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, wc, 9, c), lambda i, j: (i, j, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, wc, 9), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, hc, wc, 9, c), jnp.float32),
            jax.ShapeDtypeStruct((n, hc, wc, 9), jnp.float32),
        ],
        interpret=_interpret(),
    )(feat.astype(jnp.float32), prob.astype(jnp.float32))
    return t, mass


@functools.partial(jax.jit, static_argnames=("sp_h", "sp_w", "need_entry_prob"))
def poolfeat(feat, prob, sp_h: int = 16, sp_w: int = 16, need_entry_prob: bool = False):
    """Drop-in Pallas-backed replacement for ops.superpixel.poolfeat."""
    n, h, w, c = feat.shape
    hc, wc = h // sp_h, w // sp_w
    t, mass = _pool_sums(feat, prob, sp_h, sp_w)
    # 9-direction shift-add on the token grid (tiny, XLA-fused)
    tp = jnp.pad(t, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
    mp = jnp.pad(mass, ((0, 0), (1, 1), (1, 1), (0, 0)))
    feat_sum = jnp.zeros((n, hc, wc, c), jnp.float32)
    mass_sum = jnp.zeros((n, hc, wc, 1), jnp.float32)
    for d, (dy, dx) in enumerate(_OFFSETS):
        feat_sum = feat_sum + tp[:, 1 - dy : 1 - dy + hc, 1 - dx : 1 - dx + wc, d, :]
        mass_sum = mass_sum + mp[:, 1 - dy : 1 - dy + hc, 1 - dx : 1 - dx + wc, d, None]
    pooled = (feat_sum / (mass_sum + 1e-8)).astype(feat.dtype)
    if need_entry_prob:
        return pooled, mass_sum.astype(feat.dtype)
    return pooled


def _up_kernel(tok_ref, prob_ref, out_ref, *, up_h: int, up_w: int, wc: int):
    """One superpixel row: padded tokens (1, Hc+2, Wc+2, C) resident, prob
    (1, up_h, W, 9) -> out (1, up_h, W, C)."""
    c = tok_ref.shape[-1]
    i = pl.program_id(1)
    # neighbor stack for every cell in this row: (Wc, 9, C)
    rows = []
    for dy, dx in _OFFSETS:
        rows.append(tok_ref[0, pl.ds(i + 1 + dy, 1), pl.ds(1 + dx, wc), :])  # (1, Wc, C)
    s = jnp.concatenate(rows, axis=0).transpose(1, 0, 2)  # (Wc, 9, C)
    p = prob_ref[0].reshape(up_h, wc, up_w, 9).transpose(1, 0, 2, 3).reshape(wc, up_h * up_w, 9)
    # batched over cells: (Wc, sp*sp, C) = P @ S
    o = jax.lax.dot_general(
        p, s, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    out_ref[0] = (
        o.reshape(wc, up_h, up_w, c).transpose(1, 0, 2, 3).reshape(up_h, wc * up_w, c)
    )


@functools.partial(jax.jit, static_argnames=("up_h", "up_w"))
def upfeat(tokens, prob, up_h: int = 16, up_w: int = 16):
    """Drop-in Pallas-backed replacement for ops.superpixel.upfeat."""
    n, hc, wc, c = tokens.shape
    h, w = hc * up_h, wc * up_w
    tok_p = jnp.pad(tokens.astype(jnp.float32), ((0, 0), (1, 1), (1, 1), (0, 0)))
    kernel = functools.partial(_up_kernel, up_h=up_h, up_w=up_w, wc=wc)
    out = pl.pallas_call(
        kernel,
        grid=(n, hc),
        in_specs=[
            pl.BlockSpec(
                (1, hc + 2, wc + 2, c), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, up_h, w, 9), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, up_h, w, c), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), jnp.float32),
        interpret=_interpret(),
    )(tok_p, prob.astype(jnp.float32))
    return out.astype(tokens.dtype)
