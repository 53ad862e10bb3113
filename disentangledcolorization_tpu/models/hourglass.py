"""HourGlass2: full-resolution enhancement decoder (gray + unpooled feats -> ab).

Capability parity with /root/reference/models/network.py:125-144: ConvBlock(65->64),
two downsamples (128, 256), resNum ResidualBlocks(256), two upsamples with skips,
3x3 output conv. NHWC flax. The reference instantiates it with
normLayer=BatchNorm2d (model.py:44); the residual blocks are built *without*
norm (network.py:131), which we mirror.
"""

from __future__ import annotations

from flax import linen as nn

from .layers import (
    Conv,
    ConvBlock,
    DownsampleBlock,
    ResidualBlock,
    UpsampleBlock,
    conv_module_params,
    conv_rewrites_enabled,
    padded_out_conv,
)


class HourGlass2(nn.Module):
    out_channels: int = 2
    res_num: int = 3
    use_norm: bool = True
    train: bool = False
    sn_folded: bool = False

    @nn.compact
    def __call__(self, x):
        tr = self.train
        f1 = ConvBlock(64, conv_num=2, use_norm=self.use_norm, train=tr, name="in_conv")(x)
        f2 = DownsampleBlock(128, conv_num=2, use_norm=self.use_norm, train=tr, name="down1")(f1)
        f3 = DownsampleBlock(256, conv_num=2, use_norm=self.use_norm, train=tr, name="down2")(f2)
        r = f3
        for i in range(self.res_num):
            # reference builds ResidualBlock(256) with default normLayer=None
            r = ResidualBlock(256, use_norm=False, train=tr, sn_folded=self.sn_folded, name=f"residual{i}")(r)
        u2 = UpsampleBlock(128, conv_num=3, use_norm=self.use_norm, train=tr, name="up2")(r, f2)
        u1 = UpsampleBlock(64, conv_num=3, use_norm=self.use_norm, train=tr, name="up1")(u2, f1)
        out = Conv(self.out_channels, name="out_conv")
        if conv_rewrites_enabled("out") and self.out_channels < 16:
            # zero-pad the 2-lane-output conv to 64 MXU filters — measured
            # neutral end-to-end, off by default (see layers.padded_out_conv)
            kernel, bias = conv_module_params(out, u1.shape[-1], u1.dtype)
            return padded_out_conv(u1, kernel, bias)
        return out(u1)
