"""ColorProbNet: VGG-style grayscale encoder-decoder -> 64-ch full-res features.

Capability parity with /root/reference/models/network.py:147-236. The encoder is
spectral-norm convs + LeakyReLU(0.2) with a BatchNorm after each stage; the
decoder is three nearest-2x upsample stages with one skip (conv3short8).
NHWC flax; spectral norm carries its power-iteration state in the ``spectral``
collection (see layers.SNConv).
"""

from __future__ import annotations

from flax import linen as nn

from .layers import BatchNorm, Conv, SNConv, upsample_conv


class _SNStage(nn.Module):
    """n spectral-norm convs (first may stride) + lrelu each, then BN."""

    features: int
    n_convs: int
    first_stride: int = 1
    train: bool = False
    sn_folded: bool = False

    @nn.compact
    def __call__(self, x):
        for i in range(self.n_convs):
            x = SNConv(
                self.features,
                stride=self.first_stride if i == 0 else 1,
                folded=self.sn_folded,
                name=f"conv{i}",
            )(x, update_stats=self.train)
            x = nn.leaky_relu(x, 0.2)
        return BatchNorm(use_running_average=not self.train, name="norm")(x)


class ColorProbNet(nn.Module):
    """Grayscale (N, H, W, 1) -> features (N, H, W, out_channels=64)."""

    out_channels: int = 64
    train: bool = False
    sn_folded: bool = False

    @nn.compact
    def __call__(self, x):
        tr, fold = self.train, self.sn_folded
        f1 = _SNStage(64, 2, 1, tr, fold, name="conv1_2")(x)  # H
        f2 = _SNStage(128, 3, 2, tr, fold, name="conv2_3")(f1)  # H/2
        f3 = _SNStage(256, 3, 2, tr, fold, name="conv3_3")(f2)  # H/4
        f4 = _SNStage(512, 3, 2, tr, fold, name="conv4_3")(f3)  # H/8
        f5 = _SNStage(512, 3, 1, tr, fold, name="conv5_3")(f4)
        f6 = _SNStage(512, 3, 1, tr, fold, name="conv6_3")(f5)
        f7 = _SNStage(512, 3, 1, tr, fold, name="conv7_3")(f6)

        # conv8: upsample + conv, plus the conv3 shortcut (network.py:188-193,228).
        # upsample_conv dispatches the naive broadcast+conv by default; the
        # fused phase-conv alternative measured slower (layers.upsample_conv)
        u8 = upsample_conv(Conv(256, name="conv8up"), f7)
        s8 = Conv(256, name="conv3short8")(f3)
        x8 = nn.relu(u8 + s8)
        x8 = nn.relu(Conv(256, name="conv8_1")(x8))
        x8 = nn.relu(Conv(256, name="conv8_2")(x8))
        x8 = BatchNorm(use_running_average=not tr, name="norm8")(x8)

        u9 = upsample_conv(Conv(128, name="conv9up"), x8)
        x9 = nn.relu(Conv(128, name="conv9_1")(u9))
        x9 = BatchNorm(use_running_average=not tr, name="norm9")(x9)

        u10 = upsample_conv(Conv(64, name="conv10up"), x9)
        x10 = nn.relu(u10)
        x10 = nn.relu(Conv(self.out_channels, name="conv10_1")(x10))
        return x10
