"""Building-block layers: explicit-padding convs, spectral norm, res/up/down blocks.

Capability parity with /root/reference/models/network.py:10-122 (ConvBlock,
ResidualBlock, ResidualBlockSN, DownsampleBlock, UpsampleBlock, UpsampleBlockSN)
plus the conv/deconv helpers at network.py:240-258. NHWC, flax.linen.

Design notes (TPU-first):
  * All convs use explicit ((p, p), (p, p)) padding. PyTorch's ``padding=1`` with
    stride 2 pads symmetrically and samples even positions; XLA's ``SAME`` pads
    asymmetrically (lo=0, hi=1) — explicit padding keeps stride-2 convs
    numerically identical to the reference so converted weights reproduce it.
  * Transposed conv (k=4, s=2, p=1) is expressed directly as an lhs-dilated
    conv_general_dilated; the kernel is stored pre-flipped in HWIO so the hot
    path has no flips (the torch->jax converter performs the one-time flip).
  * Spectral norm stores the power-iteration vector ``u`` in a ``spectral``
    variable collection; one iteration per training step (torch semantics,
    network.py's spectral_norm wrappers). A ``folded`` flag skips normalization
    for inference-only weights where sigma was folded in by the converter.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import quant

Dtype = Any


def conv_rewrites_enabled(which: str = "") -> bool:
    """Trace-time gate for the weight-exact conv rewrites.

    DISCO_CONV_REWRITES: "1" = all, "0"/unset = none, or a comma list of
    rewrite names ("up" = fused_upsample_conv, "out" = padded_out_conv) to
    enable selectively (per-rewrite A/B).

    Default OFF — both rewrites were refuted by end-to-end A/B on v5e
    (bench.py, batch 32): baseline 361.8 img/s, "up" alone 356.1 (the phase
    interleave relayout costs more than the materialized broadcast XLA
    already all but fuses away), "out" alone 362.8 (noise), both 356.7.
    """
    v = os.environ.get("DISCO_CONV_REWRITES", "0")
    if v == "0":
        return False
    if v == "1":
        return True
    return which in {t.strip() for t in v.split(",")}


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


class Conv(nn.Module):
    """2D conv, NHWC, explicit symmetric padding (torch Conv2d semantics)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int | None = None  # default (k-1)//2
    use_bias: bool = True
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x):
        k = _pair(self.kernel_size)
        p = self.padding if self.padding is not None else (k[0] - 1) // 2
        mod = nn.Conv(
            features=self.features,
            kernel_size=k,
            strides=_pair(self.stride),
            padding=((p, p), (p, p)),
            use_bias=self.use_bias,
            # follow the activation dtype (bf16 activations w/ f32 params)
            dtype=self.dtype or x.dtype,
            name="conv",
        )
        if (
            quant.quant_enabled()
            and x.shape[-1] >= quant.MIN_CH
            and not quant.excluded(self.scope.path if self.scope else ())
        ):
            # int8 PTQ inference path (DISCO_INT8, see ops/quant.py).
            mode = quant.quant_mode()
            amax = None
            if mode in ("calib", "static"):
                amax_var = self.variable(
                    "quant", "act_amax", lambda: jnp.zeros((), jnp.float32)
                )
                if mode == "calib":
                    # record the activation range, run the exact f32 conv
                    if not self.is_initializing():
                        amax_var.value = jnp.maximum(
                            amax_var.value, jnp.max(jnp.abs(x.astype(jnp.float32)))
                        )
                    return mod(x)
                amax = amax_var.value * quant.CALIB_MARGIN
            # register params via a dummy call (same tree paths as the plain
            # path; XLA dead-codes the tiny dummy conv), then run quantized
            _ = mod(jnp.zeros((1, 4, 4, x.shape[-1]), x.dtype))
            pr = mod.variables["params"]
            return quant.int8_conv(
                x, pr["kernel"], pr.get("bias"), stride=self.stride, padding=p, act_amax=amax
            )
        return mod(x)


class SNConv(nn.Module):
    """Spectrally-normalized conv (one power iteration per training step).

    Weight W is reshaped to (O, H*W*I); sigma ~= u^T W v with u persisted in the
    ``spectral`` collection. When ``folded`` (converted inference weights with
    sigma pre-divided), normalization is skipped entirely.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int | None = None
    use_bias: bool = True
    folded: bool = False
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x, update_stats: bool = False):
        k = _pair(self.kernel_size)
        p = self.padding if self.padding is not None else (k[0] - 1) // 2
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k[0], k[1], in_ch, self.features),
            jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        if self.folded:
            w = kernel
        else:
            w_mat = kernel.reshape(-1, self.features).T  # (O, HWI)
            u_var = self.variable(
                "spectral",
                "u",
                lambda: jax.random.normal(
                    self.make_rng("params") if self.has_rng("params") else jax.random.key(0),
                    (self.features,),
                )
                / jnp.sqrt(self.features),
            )
            u = u_var.value
            v = w_mat.T @ u
            v = v / (jnp.linalg.norm(v) + 1e-12)
            u_new = w_mat @ v
            u_new = u_new / (jnp.linalg.norm(u_new) + 1e-12)
            sigma = u_new @ (w_mat @ v)
            if update_stats and not self.is_initializing():
                u_var.value = jax.lax.stop_gradient(u_new)
            w = kernel / jax.lax.stop_gradient(sigma)

        dtype = self.dtype or x.dtype
        if (
            quant.quant_enabled()
            and self.folded
            and in_ch >= quant.MIN_CH
            and not quant.excluded(self.scope.path if self.scope else ())
        ):
            # int8 PTQ inference path (DISCO_INT8; folded weights only —
            # the un-folded training path keeps the spectral-norm dynamics)
            mode = quant.quant_mode()
            amax = None
            if mode in ("calib", "static"):
                amax_var = self.variable(
                    "quant", "act_amax", lambda: jnp.zeros((), jnp.float32)
                )
                if mode == "static":
                    amax = amax_var.value * quant.CALIB_MARGIN
                elif not self.is_initializing():
                    amax_var.value = jnp.maximum(
                        amax_var.value, jnp.max(jnp.abs(x.astype(jnp.float32)))
                    )
            if mode != "calib":
                return quant.int8_conv(
                    x, w, bias, stride=self.stride, padding=p, out_dtype=dtype, act_amax=amax
                )
        y = jax.lax.conv_general_dilated(
            x.astype(dtype),
            w.astype(dtype),
            window_strides=_pair(self.stride),
            padding=((p, p), (p, p)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if bias is not None:
            y = y + bias.astype(dtype)
        return y


class Deconv(nn.Module):
    """Transposed conv (torch ConvTranspose2d k=4, s=2, p=1 -> exact 2x upsample).

    Implemented as an lhs-dilated conv: dilate input by the stride, pad by
    (k - 1 - p), regular conv with the (pre-flipped) HWIO kernel.
    """

    features: int
    kernel_size: int = 4
    stride: int = 2
    padding: int = 1
    use_bias: bool = True
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x):
        k = _pair(self.kernel_size)
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k[0], k[1], in_ch, self.features),
            jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        dtype = self.dtype or x.dtype
        eff_pad = k[0] - 1 - self.padding
        y = jax.lax.conv_general_dilated(
            x.astype(dtype),
            kernel.astype(dtype),
            window_strides=(1, 1),
            padding=((eff_pad, eff_pad), (eff_pad, eff_pad)),
            lhs_dilation=_pair(self.stride),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if bias is not None:
            y = y + bias.astype(dtype)
        return y


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest 2x upsample (out[i] = in[i // 2]), identical to torch F.interpolate."""
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def _phase_embedded_kernel(kernel: jnp.ndarray) -> jnp.ndarray:
    """(3,3,I,O) kernel -> (3,3,I,4O) whose 2p+q output block computes the
    (p, q) output phase of (nearest-2x upsample -> 3x3 pad-1 conv).

    Derivation: output row 2i+p of the upsampled conv taps upsampled rows
    2i+p-1..2i+p+1, i.e. source rows (i-1, i, i) for p=0 and (i, i, i+1) for
    p=1 — so at source resolution phase p=0 sees (W0, W1+W2, 0) on kernel
    rows (i-1, i, i+1) and p=1 sees (0, W0+W1, W2); columns analogously.
    """
    k, z = kernel, jnp.zeros_like(kernel[0])
    rows = (
        jnp.stack([k[0], k[1] + k[2], z]),  # p = 0
        jnp.stack([z, k[0] + k[1], k[2]]),  # p = 1
    )
    blocks = []
    for p in (0, 1):
        r, zc = rows[p], jnp.zeros_like(rows[p][:, 0])
        blocks.append(jnp.stack([r[:, 0], r[:, 1] + r[:, 2], zc], axis=1))  # q = 0
        blocks.append(jnp.stack([zc, r[:, 0] + r[:, 1], r[:, 2]], axis=1))  # q = 1
    return jnp.concatenate(blocks, axis=-1)


def fused_upsample_conv(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    dtype: Dtype | None = None,
) -> jnp.ndarray:
    """``Conv3x3(upsample_nearest_2x(x))`` in one half-resolution conv.

    Weight-exact rewrite, REFUTED end-to-end on v5e (see
    conv_rewrites_enabled): 356.1 vs 361.8 img/s at batch 32. The trace had
    attributed 4.5 ms to conv10up (2.6 ms broadcast_in_dim), but those
    self-times included neighbor work XLA fuses with the conv — the phase
    interleave relayout here costs more than it saves. Kept as a documented,
    tested alternative (DISCO_CONV_REWRITES=up).

    Design: the four 2x2 phase kernels are embedded in a single (3,3,I,4O)
    conv evaluated at source resolution (reads x once, MXU-friendly 4O
    output lanes), then the phases are interleaved with a reshape/transpose.
    f32-exact vs the reference formulation up to FMA reassociation (W taps
    on duplicated rows are pre-summed); asserted in tests/test_models.py.
    """
    n, h, w, _ = x.shape
    o = kernel.shape[3]
    dt = dtype or x.dtype
    zk = _phase_embedded_kernel(kernel)
    y = jax.lax.conv_general_dilated(
        x.astype(dt),
        zk.astype(dt),
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        y = y + jnp.tile(bias, 4).astype(dt)
    y = y.reshape(n, h, w, 2, 2, o).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(n, 2 * h, 2 * w, o)


def padded_out_conv(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    dtype: Dtype | None = None,
    pad_to: int = 64,
) -> jnp.ndarray:
    """3x3 pad-1 conv with the output channels zero-padded to ``pad_to`` lanes.

    Weight-exact rewrite for tiny-Cout heads; end-to-end NEUTRAL on v5e
    (362.8 vs 361.8 img/s at batch 32 — within noise; see
    conv_rewrites_enabled). The trace's 4.79 ms for the 64->2 out_conv was
    misattributed fused-neighbor time. Exact: the extra filters are zero.
    Kept as a tested alternative (DISCO_CONV_REWRITES=out).
    """
    o = kernel.shape[3]
    dt = dtype or x.dtype
    if o < pad_to:
        kernel = jnp.pad(kernel, ((0, 0), (0, 0), (0, 0), (0, pad_to - o)))
    y = jax.lax.conv_general_dilated(
        x.astype(dt),
        kernel.astype(dt),
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = y[..., :o]
    if bias is not None:
        y = y + bias.astype(dt)
    return y


def conv_module_params(conv: Conv, in_ch: int, dtype) -> tuple[jnp.ndarray, jnp.ndarray | None]:
    """Materialize a ``Conv`` wrapper's params without running it at full size.

    Calls the module on a tiny dummy (param shapes depend only on channel
    count) so flax registers ``conv/kernel`` and ``conv/bias`` under the
    wrapper's name, keeping the param tree — and therefore the torch-weight
    converter mapping — identical to the plain-call formulation.
    """
    _ = conv(jnp.zeros((1, 4, 4, in_ch), dtype))
    p = conv.variables["params"]["conv"]
    return p["kernel"], p.get("bias")


def upsample_conv(conv: Conv, x: jnp.ndarray) -> jnp.ndarray:
    """``conv(upsample_nearest_2x(x))`` through the measured fused rewrite.

    Falls back to the naive formulation when DISCO_CONV_REWRITES=0.
    """
    if not conv_rewrites_enabled("up"):
        return conv(upsample_nearest_2x(x))
    kernel, bias = conv_module_params(conv, x.shape[-1], x.dtype)
    return fused_upsample_conv(x, kernel, bias)


class BatchNorm(nn.Module):
    """BatchNorm2d with torch defaults (eps=1e-5, momentum 0.1 -> flax 0.9).

    Under pjit data parallelism the batch axis is global, so stats are computed
    over all devices automatically — the SyncBatchNorm semantics of the
    reference's DDP path (train_colorizer.py:66) with zero extra collectives.
    """

    use_running_average: bool = True

    @nn.compact
    def __call__(self, x):
        if self.use_running_average:
            # inference fast path: fold running stats + affine into one
            # per-channel scale/shift computed in f32 (tiny), applied in the
            # activation dtype — no full-tensor f32 cast round-trip.
            c = x.shape[-1]
            bn = self.scope.push("bn")  # same param/stat paths as nn.BatchNorm
            scale = bn.param("scale", nn.initializers.ones, (c,), jnp.float32)
            bias = bn.param("bias", nn.initializers.zeros, (c,), jnp.float32)
            mean = bn.variable("batch_stats", "mean", lambda s: jnp.zeros(s, jnp.float32), (c,)).value
            var = bn.variable("batch_stats", "var", lambda s: jnp.ones(s, jnp.float32), (c,)).value
            a = (scale * jax.lax.rsqrt(var + 1e-5)).astype(x.dtype)
            b = (bias - mean * scale * jax.lax.rsqrt(var + 1e-5)).astype(x.dtype)
            return x * a + b
        # training: statistics in float32 (bf16 accumulation over N*H*W drifts)
        y = nn.BatchNorm(
            use_running_average=False,
            momentum=0.9,
            epsilon=1e-5,
            dtype=jnp.float32,
            name="bn",
        )(x.astype(jnp.float32))
        return y.astype(x.dtype)


class ConvBlock(nn.Module):
    """convNum 3x3 convs with ReLU, optional trailing BN (network.py:10-28)."""

    features: int
    conv_num: int = 2
    use_norm: bool = False
    train: bool = False

    @nn.compact
    def __call__(self, x):
        x = nn.relu(Conv(self.features, name="in_conv")(x))
        for i in range(self.conv_num - 1):
            x = nn.relu(Conv(self.features, name=f"conv{i}")(x))
        if self.use_norm:
            x = BatchNorm(use_running_average=not self.train, name="norm")(x)
        return x


class ResidualBlock(nn.Module):
    """conv -> SNconv -> [BN] -> relu -> conv -> [BN]; relu(x + res) (network.py:31-47)."""

    features: int
    use_norm: bool = False
    train: bool = False
    sn_folded: bool = False

    @nn.compact
    def __call__(self, x):
        r = Conv(self.features, name="conv_a")(x)
        r = SNConv(self.features, folded=self.sn_folded, name="conv_sn")(r, update_stats=self.train)
        if self.use_norm:
            r = BatchNorm(use_running_average=not self.train, name="norm1")(r)
        r = nn.relu(r)
        r = Conv(self.features, name="conv_b")(r)
        if self.use_norm:
            r = BatchNorm(use_running_average=not self.train, name="norm2")(r)
        return nn.relu(x + r)


class ResidualBlockSN(nn.Module):
    """SNconv -> lrelu -> SNconv -> [BN]; lrelu(x + res) (network.py:50-63)."""

    features: int
    use_norm: bool = False
    train: bool = False
    sn_folded: bool = False

    @nn.compact
    def __call__(self, x):
        r = SNConv(self.features, folded=self.sn_folded, name="conv_a")(x, update_stats=self.train)
        r = nn.leaky_relu(r, 0.2)
        r = SNConv(self.features, folded=self.sn_folded, name="conv_b")(r, update_stats=self.train)
        if self.use_norm:
            r = BatchNorm(use_running_average=not self.train, name="norm")(r)
        return nn.leaky_relu(x + r, 0.2)


class DownsampleBlock(nn.Module):
    """stride-2 conv + (convNum-1) convs, ReLU, optional BN (network.py:66-80)."""

    features: int
    conv_num: int = 2
    use_norm: bool = False
    train: bool = False

    @nn.compact
    def __call__(self, x):
        x = nn.relu(Conv(self.features, stride=2, name="down_conv")(x))
        for i in range(self.conv_num - 1):
            x = nn.relu(Conv(self.features, name=f"conv{i}")(x))
        if self.use_norm:
            x = BatchNorm(use_running_average=not self.train, name="norm")(x)
        return x


class UpsampleBlock(nn.Module):
    """conv -> nearest-2x -> concat skip -> combine conv -> convs (network.py:83-101)."""

    features: int
    conv_num: int = 2
    use_norm: bool = False
    train: bool = False

    @nn.compact
    def __call__(self, x, skip):
        x = Conv(self.features, name="conv1")(x)
        combine = Conv(self.features, name="combine")
        if conv_rewrites_enabled("up"):
            # combine(concat(up(x), skip)) == fused_upsample_conv(x, W_up)
            #                                 + conv(skip, W_skip): split the
            # kernel's input channels instead of materializing the 2x
            # broadcast + concat (trace-measured rewrite, see
            # fused_upsample_conv)
            kernel, bias = conv_module_params(combine, x.shape[-1] + skip.shape[-1], x.dtype)
            cu = x.shape[-1]
            dt = x.dtype
            yu = fused_upsample_conv(x, kernel[:, :, :cu], bias)
            ys = jax.lax.conv_general_dilated(
                skip.astype(dt),
                kernel[:, :, cu:].astype(dt),
                window_strides=(1, 1),
                padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            x = nn.relu(yu + ys)
        else:
            x = upsample_nearest_2x(x)
            x = nn.relu(combine(jnp.concatenate([x, skip], axis=-1)))
        for i in range(self.conv_num - 1):
            x = nn.relu(Conv(self.features, name=f"post_conv{i}")(x))
        if self.use_norm:
            x = BatchNorm(use_running_average=not self.train, name="norm")(x)
        return x


class UpsampleBlockSN(nn.Module):
    """SNconv -> nearest-2x -> + SN shortcut(skip) -> lrelu -> SN convs (network.py:104-122)."""

    features: int
    conv_num: int = 2
    use_norm: bool = False
    train: bool = False
    sn_folded: bool = False

    @nn.compact
    def __call__(self, x, skip):
        x = SNConv(self.features, folded=self.sn_folded, name="conv1")(x, update_stats=self.train)
        x = upsample_nearest_2x(x)
        x = x + SNConv(self.features, folded=self.sn_folded, name="shortcut")(
            skip, update_stats=self.train
        )
        x = nn.leaky_relu(x, 0.2)
        for i in range(self.conv_num - 1):
            x = nn.leaky_relu(
                SNConv(self.features, folded=self.sn_folded, name=f"post_conv{i}")(
                    x, update_stats=self.train
                ),
                0.2,
            )
        if self.use_norm:
            x = BatchNorm(use_running_average=not self.train, name="norm")(x)
        return x
