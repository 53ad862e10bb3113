"""Pallas kernel: fused SpixelNet affinity head (3x3 conv + bias + softmax-9).

RETIRED from the production path — measured on v5e at the production shape
(tools/pallas_bench.py, scan-chain amortized, batch 32 256x256 bf16):

    XLA conv+softmax head:    961 us
    this fused Pallas kernel: 12,346 us   (XLA wins 12.8x)

Post-mortem (the third refuted attack on the 9-lane head, after the
transposed-layout softmax and space-to-depth segnet — see
models/spixelnet.py): TPU VMEM tiles the last two dims (8, 128), so with
channels last both the C=16 input strips and the 9-channel output pad their
lane dim to 128 — a whole-image BlockSpec allocated 97 MB of scoped VMEM
against the 16 MB limit, and the strip-streamed version that fits spends its
time on 8-14x padded VPU work and tiny-N (9) MXU dots. The isolated XLA head
is also ~6x cheaper than the ~6 ms the round-2 trace attributed to it (the
trace bucket included fused producers), so the theoretical win was smaller
than believed. Conclusion: XLA's layout choices for low-channel convs beat
any channels-last Pallas formulation here; a channels-in-sublanes kernel
would need relayouts that cost more than the head itself.

Kernel design (kept as a worked example + tests): 3x3 halo via three
H-shifted copies of the padded input (BlockSpec offsets are block-quantized,
overlapping windows are inexpressible), (batch, H/th) grid, per-strip
im2col dots (TH*W, C) @ (C, 9) accumulated over the 9 taps, stable softmax,
one VMEM pass. Runs in interpret mode off-TPU; exactness + gradient parity
asserted in tests/test_pallas.py. ``DISCO_SEG_HEAD=pallas`` force-enables.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Per-grid-step VMEM budget for the strip BlockSpecs below (3 shifted input
# strips + output strip, double-buffered, lane dims padded to 128). Oversized
# --no_resize widths fall back to the XLA head.
_VMEM_BUDGET_BYTES = 12 * 2**20


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _strip_vmem_bytes(w: int, c: int, itemsize: int, th: int) -> int:
    # VMEM stores blocks tiled (8, 128) over the last two dims, so the lane
    # dim (C on input, 9 on output) pads to 128 — this padding, not the
    # nominal bytes, is what blows the scoped-vmem limit. (A whole-image
    # BlockSpec at batch 32 allocated 97 MB against the 16 MB limit.)
    lanes = ((max(c, 9) + 127) // 128) * 128
    inp = 3 * 2 * th * (w + 2) * lanes * itemsize  # 3 shifted copies, 2x buffered
    out = 2 * th * w * 128 * 4
    return inp + out


def _pick_th(h: int, w: int, c: int, itemsize: int) -> int | None:
    """Largest strip height dividing H whose staged blocks fit scoped VMEM."""
    for th in (32, 16, 8):
        if h % th == 0 and _strip_vmem_bytes(w, c, itemsize, th) <= _VMEM_BUDGET_BYTES:
            return th
    return None


def _fused_ok(x: jnp.ndarray) -> bool:
    """Trace-time dispatch: shape/VMEM eligibility + DISCO_SEG_HEAD override."""
    if os.environ.get("DISCO_SEG_HEAD", "xla") != "pallas":
        return False  # retired: XLA wins 12.8x at production shape (module docstring)
    n, h, w, c = x.shape
    return c <= 128 and _pick_th(h, w, c, jnp.dtype(x.dtype).itemsize) is not None


def _head_kernel(x0_ref, x1_ref, x2_ref, w_ref, b_ref, out_ref, *, th: int, w: int, c: int):
    """x{dy} (1, TH, W+2, C) shifted strips; w (3*3*C, 9); b (1, 9) -> out (1, TH, W, 9)."""
    wm = w_ref[:].astype(jnp.float32)
    # sum of 9 per-tap dots (Mosaic cannot concatenate lane-offset slices
    # into one (TH*W, 9C) im2col operand — "offset mismatch on non-concat
    # dimension")
    y = b_ref[:].astype(jnp.float32)
    for dy, x_ref in enumerate((x0_ref, x1_ref, x2_ref)):
        for dx in range(3):
            tap = x_ref[0, :, pl.ds(dx, w), :]
            y = y + jnp.dot(
                tap.reshape(th * w, c).astype(jnp.float32),
                wm[(dy * 3 + dx) * c : (dy * 3 + dx + 1) * c, :],
                preferred_element_type=jnp.float32,
            )
    m = jnp.max(y, axis=-1, keepdims=True)
    e = jnp.exp(y - m)
    sm = e / jnp.sum(e, axis=-1, keepdims=True)
    out_ref[0, :, :, :] = sm.reshape(th, w, 9).astype(out_ref.dtype)


def _xla_affinity_head(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray) -> jnp.ndarray:
    # Same promotion semantics as the flax nn.Conv head (dtype=None): bf16
    # activations with f32 params run the conv in f32 and return f32.
    dt = jnp.promote_types(x.dtype, kernel.dtype)
    y = jax.lax.conv_general_dilated(
        x.astype(dt),
        kernel.astype(dt),
        (1, 1),
        ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return jax.nn.softmax((y + bias.astype(dt)).astype(jnp.float32), axis=-1).astype(dt)


@jax.custom_vjp
def affinity_head(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray) -> jnp.ndarray:
    """Backend-dispatched affinity head; gradients via the XLA formulation.

    The kernel is forward-only; the frozen-segnet flagship path never needs
    the backward, but standalone SpixelNet training does — custom_vjp routes
    it through the XLA conv+softmax (recomputed forward, same math).
    """
    if _fused_ok(x):
        return fused_affinity_head(x, kernel, bias)
    return _xla_affinity_head(x, kernel, bias)


def _affinity_head_fwd(x, kernel, bias):
    return affinity_head(x, kernel, bias), (x, kernel, bias)


def _affinity_head_bwd(res, g):
    x, kernel, bias = res
    _, vjp = jax.vjp(_xla_affinity_head, x, kernel, bias)
    return vjp(g)


affinity_head.defvjp(_affinity_head_fwd, _affinity_head_bwd)


@functools.partial(jax.jit, static_argnames=("th",))
def fused_affinity_head(
    x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray, th: int | None = None
) -> jnp.ndarray:
    """3x3 SAME conv (kernel (3,3,C,9), bias (9,)) + softmax over the 9 outputs.

    x: (N, H, W, C) pre-head activations (H % th == 0). Returns (N, H, W, 9)
    in promote_types(x.dtype, kernel.dtype) — matching the flax head's
    promotion — with the conv accumulation and softmax computed in f32.

    Streams (1, th, W+2, C) row strips over a (batch, H/th) grid; the 3x3
    halo comes from three H-shifted copies of the padded input instead of
    overlapping blocks (BlockSpec offsets are block-quantized, so overlapping
    windows are inexpressible — and a whole-image block OOMs scoped VMEM at
    production batch, see _strip_vmem_bytes).
    """
    n, h, w, c = x.shape
    if th is None:
        th = _pick_th(h, w, c, jnp.dtype(x.dtype).itemsize) or 8
    th = min(th, h)
    dt = jnp.promote_types(x.dtype, kernel.dtype)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    shifted = [jax.lax.slice_in_dim(xp, dy, dy + h, axis=1) for dy in range(3)]
    wm = kernel.reshape(9 * c, 9)  # (dy, dx, ci) row order == im2col concat order
    kern = functools.partial(_head_kernel, th=th, w=w, c=c)
    strip_spec = pl.BlockSpec((1, th, w + 2, c), lambda i, r: (i, r, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(n, h // th),
        in_specs=[
            strip_spec,
            strip_spec,
            strip_spec,
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, w, 9), lambda i, r: (i, r, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, 9), dt),
        interpret=_interpret(),
    )(*shifted, wm, bias.reshape(1, 9))
