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
and XLA's elementwise-multiply+block-reduce strategy wins.

Round-2 follow-up (2026-08-17): the 50us/11us isolated numbers flatter XLA —
as an isolated jit it picks free *parameter* layouts, while in the full
forward graph the blocked einsum costs ~4 ms of 6-D relayout copies
(trace-measured, batch 16). Three copy-avoiding replacements were therefore
built and A/B'd END-TO-END in the flagship forward (chained-scan, batch 16,
bf16):

    einsum (ops/superpixel.py)                 56.6 ms/fwd  <- still the winner
    per-direction multiply-reduce ('v2')       72.6 ms/fwd
    these dot-per-cell kernels ('pallas')      76.3 ms/fwd
    per-direction VPU kernels (pool_stats/
    upfeat_fused below)                        ~2 s/fwd (Mosaic emits huge
                                               spilled intermediates; upfeat
                                               variant also VMEM-OOMs at C=64)

Lesson recorded: the relayout copies are cheaper than any alternative tried —
Mosaic's DMA serialization and reduce trees cost more than XLA's copies. The
jnp einsum ops stay the production path on every backend; everything here is
a correctness-tested experimental backend (ops.superpixel backend='pallas').
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


def _pool_stats_kernel(
    feat_ref, prob_ref, t_ref, mass_ref, hard_ref, *, sp_h: int, sp_w: int, wc: int
):
    """One superpixel row, per-direction VPU formulation (no transposes, no
    tiny batched MXU dots — the round-1 kernel's failure mode).

    feat (1, sp_h, W, C), prob (1, sp_h, W, 9) ->
      t    (1, 1, wc, 9, C) per-direction soft feature sums / (sp_h*sp_w)
      mass (1, 1, wc, 9)    per-direction soft mass        / (sp_h*sp_w)
      hard (1, 1, wc, 9)    per-direction winner-take-all counts / (sp_h*sp_w)
    """
    c = feat_ref.shape[-1]
    f = feat_ref[0].astype(jnp.float32)  # (sp_h, W, C)
    p = prob_ref[0].astype(jnp.float32)  # (sp_h, W, 9)
    norm = 1.0 / (sp_h * sp_w)

    pb = p.reshape(sp_h, wc, sp_w, 9)
    mass_ref[0, 0] = jnp.sum(pb, axis=(0, 2)) * norm
    # reference hard assignment: prob == rowmax, ties keep every winner
    pm = jnp.max(p, axis=-1, keepdims=True)
    hard = (p == pm).astype(jnp.float32).reshape(sp_h, wc, sp_w, 9)
    hard_ref[0, 0] = jnp.sum(hard, axis=(0, 2)) * norm

    for d in range(9):
        contrib = p[:, :, d][:, :, None] * f  # (sp_h, W, C)
        t_ref[0, 0, :, d, :] = (
            jnp.sum(contrib.reshape(sp_h, wc, sp_w, c), axis=(0, 2)) * norm
        )


def pool_stats(feat: jnp.ndarray, prob: jnp.ndarray, sp_h: int = 16, sp_w: int = 16):
    """Fused single-pass pool statistics: (t, mass, hard) per cell/direction.

    One HBM read of feat+prob serves poolfeat AND get_spixel_size — in the
    full forward graph the XLA einsum formulation forces multi-millisecond
    layout copies of the 6-D blocked tensors (trace: copy.1466/1532,
    pad_maximum_fusion, broadcast_compare fusions); this kernel reads the
    natural NHWC layout directly.
    """
    n, h, w, c = feat.shape
    hc, wc = h // sp_h, w // sp_w
    kernel = functools.partial(_pool_stats_kernel, sp_h=sp_h, sp_w=sp_w, wc=wc)
    t, mass, hard = pl.pallas_call(
        kernel,
        grid=(n, hc),
        in_specs=[
            pl.BlockSpec((1, sp_h, w, c), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp_h, w, 9), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, wc, 9, c), lambda i, j: (i, j, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, wc, 9), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, wc, 9), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, hc, wc, 9, c), jnp.float32),
            jax.ShapeDtypeStruct((n, hc, wc, 9), jnp.float32),
            jax.ShapeDtypeStruct((n, hc, wc, 9), jnp.float32),
        ],
        interpret=_interpret(),
    )(feat, prob)
    return t, mass, hard


def _shift_add(x: jnp.ndarray, hc: int, wc: int):
    """Accumulate direction d of cell (i,j)-off_d into superpixel (i,j)."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1)) + ((0, 0),) * (x.ndim - 3))
    acc = None
    for d, (dy, dx) in enumerate(_OFFSETS):
        sl = xp[:, 1 - dy : 1 - dy + hc, 1 - dx : 1 - dx + wc, d]
        acc = sl if acc is None else acc + sl
    return acc


def pool_and_sizes(feat: jnp.ndarray, prob: jnp.ndarray, sp_h: int = 16, sp_w: int = 16):
    """Fused poolfeat(need_entry_prob=True) + get_spixel_size in one pass.

    Returns (pooled (N,hc,wc,C), mass (N,hc,wc,1), sizes (N,hc,wc,1)) matching
    ops.superpixel.poolfeat / get_spixel_size numerics to f32 round-off.
    """
    n, h, w, c = feat.shape
    hc, wc = h // sp_h, w // sp_w
    t, mass, hard = pool_stats(feat, prob, sp_h, sp_w)
    feat_sum = _shift_add(t, hc, wc)  # (N, hc, wc, C)
    mass_sum = _shift_add(mass, hc, wc)[..., None]  # (N, hc, wc, 1)
    hard_sum = _shift_add(hard, hc, wc)[..., None]
    pooled = (feat_sum / (mass_sum + 1e-8)).astype(feat.dtype)
    return pooled, mass_sum.astype(feat.dtype), hard_sum.astype(feat.dtype)


def _up_dir_kernel(tok_ref, prob_ref, out_ref, *, up_h: int, up_w: int, wc: int):
    """One superpixel row, per-direction VPU formulation.

    padded tokens (1, Hc+2, Wc+2, C) resident, prob (1, up_h, W, 9) ->
    out (1, up_h, W, C): out[p] = sum_d prob_d[p] * tokens[cell(p)+off_d].
    """
    c = tok_ref.shape[-1]
    i = pl.program_id(1)
    p = prob_ref[0].astype(jnp.float32)  # (up_h, W, 9)
    acc = jnp.zeros((up_h, wc, up_w, c), jnp.float32)
    for d, (dy, dx) in enumerate(_OFFSETS):
        row = tok_ref[0, i + 1 + dy, pl.ds(1 + dx, wc), :].astype(jnp.float32)  # (wc, C)
        pd = p[:, :, d].reshape(up_h, wc, up_w)
        acc = acc + pd[:, :, :, None] * row[None, :, None, :]
    out_ref[0] = acc.reshape(up_h, wc * up_w, c)


def upfeat_fused(tokens: jnp.ndarray, prob: jnp.ndarray, up_h: int = 16, up_w: int = 16):
    """Single-pass Pallas upfeat reading the natural NHWC layout."""
    n, hc, wc, c = tokens.shape
    h, w = hc * up_h, wc * up_w
    tok_p = jnp.pad(tokens.astype(jnp.float32), ((0, 0), (1, 1), (1, 1), (0, 0)))
    kernel = functools.partial(_up_dir_kernel, up_h=up_h, up_w=up_w, wc=wc)
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
    )(tok_p, prob)
    return out.astype(tokens.dtype)


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
