"""Post-training int8 quantization primitives for DISCO inference convs.

Motivation: v5e's MXU runs int8 x int8 -> int32 at ~2x the bf16 FLOP rate
(394 vs 197 TOPS) and int8 activations halve HBM traffic, while DISCO
inference is conv-bound at ~49% bf16 MFU (docs/STATUS.md). The reference has
no quantized path (pure fp32 torch, SURVEY.md section 2.7); this is a
TPU-native addition, opt-in and off by default.

Scheme (standard PTQ):
  * Weights: symmetric per-output-channel int8; scale = max|W[..., o]| / 127,
    computed at trace time from the f32 params (cheap relative to the conv —
    weight tensors are ~1e6 elements vs ~1e9 conv FLOPs; XLA fuses the
    round/clip into the param read).
  * Activations: symmetric per-tensor int8, dynamic — scale = max|x| / 127
    computed on the live tensor. One extra VPU pass over the activation;
    the requantize itself fuses into the producing op's epilogue.
  * Accumulation in int32 (`preferred_element_type`), dequantized with
    s_x * s_w[o] in f32, bias added in f32.

Activation-scale modes (the decisive perf choice, both measured on v5e):
  * dynamic (DISCO_INT8=1|dynamic): scale = max|x|/127 computed per call.
    REFUTED end-to-end: 370.0 vs 381.8 img/s baseline (bench.py, batch 56) —
    the max-reduce + requantize cost ~2.5 ms per full-res conv (two extra
    f32 passes over a ~1 GB activation), eating the 2x MXU win even though
    the isolated convs hit 95.9% of int8 peak (tools/int8_probe.py).
  * static (DISCO_INT8=static): scale from a calibration pass
    (DISCO_INT8=calib) stored in a ``quant`` variable collection. No reduce
    on the hot path; the requantize is a pure elementwise epilogue XLA fuses
    into the producing op, so inter-conv HBM traffic drops to int8.

Gating: `quant_mode()` reads DISCO_INT8 at trace time. Only convs with >=
`MIN_CH` input channels quantize; low-channel convs such as segnet's early
stages stay in the compute dtype — they are layout-bound, not MXU-bound.
Wired into models/layers.py::{Conv, SNConv} behind this flag.

Prove-or-retire status: see tools/int8_probe.py and docs/STATUS.md for the
measured on-chip numbers that decide whether this path ships enabled.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# Convs narrower than this on the input side stay un-quantized: their cost is
# relayout/VPU-bound (docs/STATUS.md: segnet runs at ~0.93x of its XLA-cost
# ideal already), and int8 would only add requantize passes.
MIN_CH = 32

#: calibration headroom: stored amax is multiplied by this at use time so
#: activations slightly above the calibration batch's range still clip rarely
CALIB_MARGIN = 1.1


def quant_mode() -> str:
    """Trace-time int8 mode: 'off' | 'dynamic' | 'calib' | 'static'."""
    v = os.environ.get("DISCO_INT8", "0")
    if v in ("0", ""):
        return "off"
    if v in ("1", "dynamic"):
        return "dynamic"
    if v in ("calib", "static"):
        return v
    raise ValueError(f"DISCO_INT8={v!r}: expected 0|1|dynamic|calib|static")


def quant_enabled() -> bool:
    """True when any int8 conv mode is active (see quant_mode)."""
    return quant_mode() != "off"


def excluded(path) -> bool:
    """True when a flax module path has a component named in DISCO_INT8_EXCLUDE.

    DISCO_INT8_EXCLUDE is a comma-separated list of module names (e.g.
    ``repnet``). Convs under an excluded module stay in the compute dtype even
    when int8 PTQ is active — the *palette-stable* int8 mode
    (``--quantize int8_safe``): DISCO's anchor colors are selected by k-means
    over repnet features, and on anchor-ambiguous checkpoints (chroma-jitter
    training teaches several equally-likely palettes) int8 noise in those
    features flips the discrete palette choice — measured int8-vs-f32 output
    drift 20.2-21.0 dB PSNR on the round-4/5 jitter checkpoints vs 39.5 dB on
    the round-3 unambiguous checkpoint (EVAL_r05.json, docs/STATUS.md).
    Keeping repnet in bf16 removes the noise at the decision point while the
    post-decision convs (hourglass enhancer, wide segnet stages) keep the MXU
    int8 win.
    """
    excl = os.environ.get("DISCO_INT8_EXCLUDE", "")
    if not excl:
        return False
    names = {s.strip() for s in excl.split(",") if s.strip()}
    return any(p in names for p in (path or ()))


def quantize_weight(kernel: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(H, W, I, O) f32 kernel -> (int8 kernel, (O,) f32 scales), symmetric."""
    amax = jnp.max(jnp.abs(kernel), axis=(0, 1, 2))
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(kernel / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_activation(
    x: jnp.ndarray, amax: jnp.ndarray | None = None
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-tensor symmetric int8 quantization.

    ``amax=None`` -> dynamic scale from max|x| (one extra reduction pass);
    otherwise the given calibrated amax is used (pure elementwise — fuses
    into the producing op's epilogue).
    """
    if amax is None:
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return q, scale


def int8_conv(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    stride: int | tuple[int, int] = 1,
    padding: int = 1,
    lhs_dilation: tuple[int, int] | None = None,
    out_dtype=None,
    act_amax: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Quantized drop-in for the f32/bf16 convs in models/layers.py.

    Quantizes ``x`` per-tensor (dynamic max|x| scale, or the calibrated
    ``act_amax`` when given), ``kernel`` per-output-channel, runs the conv in
    int8 with int32 accumulation on the MXU, and dequantizes to ``out_dtype``
    (default: x.dtype).
    """
    st = (stride, stride) if isinstance(stride, int) else tuple(stride)
    xq, sx = quantize_activation(x, act_amax)
    wq, sw = quantize_weight(kernel.astype(jnp.float32))
    y = jax.lax.conv_general_dilated(
        xq,
        wq,
        window_strides=st,
        padding=((padding, padding), (padding, padding)),
        lhs_dilation=lhs_dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    out = y.astype(jnp.float32) * (sx * sw)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype or x.dtype)
