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

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


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
        return nn.Conv(
            features=self.features,
            kernel_size=k,
            strides=_pair(self.stride),
            padding=((p, p), (p, p)),
            use_bias=self.use_bias,
            # follow the activation dtype (bf16 activations w/ f32 params)
            dtype=self.dtype or x.dtype,
            name="conv",
        )(x)


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
        x = upsample_nearest_2x(x)
        x = nn.relu(Conv(self.features, name="combine")(jnp.concatenate([x, skip], axis=-1)))
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
