"""SpixelNet: U-Net predicting 9-way pixel->superpixel soft affinity. NHWC flax.

Capability parity with /root/reference/models/network.py:260-313 (SpixelNet,
from SpixelFCN) and the SpixelSeg wrapper (model.py:12-29). Five conv stages
(16..256 ch, four stride-2 downsamples), four deconv ups with skip concats,
a 9-channel head and a softmax over the 9 neighbor assignments.

Convs are (conv + BN + leaky 0.1) when batch_norm else (conv+bias + leaky 0.1)
(network.py:240-251); deconvs are k=4 s=2 p=1 transposed convs + leaky 0.1
(network.py:254-258). Kaiming-normal init mirrors network.py:284-291.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
from flax import linen as nn

from .layers import BatchNorm, Deconv

_kaiming = nn.initializers.variance_scaling(2.0 / (1 + 0.1**2), "fan_in", "normal")


class _ConvUnit(nn.Module):
    features: int
    stride: int = 1
    batch_norm: bool = True
    train: bool = False

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(
            self.features,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=((1, 1), (1, 1)),
            use_bias=not self.batch_norm,
            kernel_init=_kaiming,
            dtype=x.dtype,
            name="conv",
        )(x)
        if self.batch_norm:
            y = BatchNorm(use_running_average=not self.train, name="norm")(y)
        return nn.leaky_relu(y, 0.1)


class _DeconvUnit(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        return nn.leaky_relu(Deconv(self.features, name="deconv")(x), 0.1)


class SpixelNet(nn.Module):
    """Grayscale (N, H, W, 1) -> soft affinity (N, H, W, 9), softmax-normalized."""

    out_channels: int = 9
    batch_norm: bool = True
    train: bool = False

    @nn.compact
    def __call__(self, x):
        bn, tr = self.batch_norm, self.train
        out1 = _ConvUnit(16, 1, bn, tr, name="conv0b")(_ConvUnit(16, 1, bn, tr, name="conv0a")(x))
        out2 = _ConvUnit(32, 1, bn, tr, name="conv1b")(_ConvUnit(32, 2, bn, tr, name="conv1a")(out1))
        out3 = _ConvUnit(64, 1, bn, tr, name="conv2b")(_ConvUnit(64, 2, bn, tr, name="conv2a")(out2))
        out4 = _ConvUnit(128, 1, bn, tr, name="conv3b")(_ConvUnit(128, 2, bn, tr, name="conv3a")(out3))
        out5 = _ConvUnit(256, 1, bn, tr, name="conv4b")(_ConvUnit(256, 2, bn, tr, name="conv4a")(out4))

        up3 = _DeconvUnit(128, name="deconv3")(out5)
        c3 = _ConvUnit(128, 1, bn, tr, name="conv3_1")(jnp.concatenate([out4, up3], -1))
        up2 = _DeconvUnit(64, name="deconv2")(c3)
        c2 = _ConvUnit(64, 1, bn, tr, name="conv2_1")(jnp.concatenate([out3, up2], -1))
        up1 = _DeconvUnit(32, name="deconv1")(c2)
        c1 = _ConvUnit(32, 1, bn, tr, name="conv1_1")(jnp.concatenate([out2, up1], -1))
        up0 = _DeconvUnit(16, name="deconv0")(c1)
        c0 = _ConvUnit(16, 1, bn, tr, name="conv0_1")(jnp.concatenate([out1, up0], -1))

        head = nn.Conv(
            self.out_channels,
            (3, 3),
            padding=((1, 1), (1, 1)),
            kernel_init=_kaiming,
            name="pred_mask0",
        )
        # The 9-lane head resists every alternative tried (all A/B- or
        # microbench-measured on v5e): transposed-layout softmax 329.2 vs
        # 331.2 img/s; space-to-depth segnet 302 vs 362 (spixelnet_s2d.py);
        # fused Pallas conv+softmax 12,346 vs 961 us at batch 32
        # (ops/pallas_affinity.py post-mortem). XLA's head is the measured
        # winner and the default; DISCO_SEG_HEAD=pallas force-enables the
        # retired kernel (interpret mode off-TPU, for tests).
        if self.out_channels == 9 and os.environ.get("DISCO_SEG_HEAD") == "pallas":
            _ = head(jnp.zeros((1, 4, 4, c0.shape[-1]), c0.dtype))  # params only
            from ..ops import pallas_affinity

            return pallas_affinity.affinity_head(
                c0, head.variables["params"]["kernel"], head.variables["params"]["bias"]
            )
        return nn.softmax(head(c0), axis=-1)


class SpixelSeg(nn.Module):
    """Thin wrapper mirroring the reference SpixelSeg module (model.py:12-29)."""

    batch_norm: bool = True
    train: bool = False

    @nn.compact
    def __call__(self, input_grays):
        return SpixelNet(batch_norm=self.batch_norm, train=self.train, name="net")(input_grays)
