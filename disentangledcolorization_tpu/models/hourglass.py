"""HourGlass2: full-resolution enhancement decoder (gray + unpooled feats -> ab).

Capability parity with /root/reference/models/network.py:125-144: ConvBlock(65->64),
two downsamples (128, 256), resNum ResidualBlocks(256), two upsamples with skips,
3x3 output conv. NHWC flax. The reference instantiates it with
normLayer=BatchNorm2d (model.py:44); the residual blocks are built *without*
norm (network.py:131), which we mirror.
"""

from __future__ import annotations

from flax import linen as nn

from .layers import Conv, ConvBlock, DownsampleBlock, ResidualBlock, UpsampleBlock


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
        return Conv(self.out_channels, name="out_conv")(u1)
