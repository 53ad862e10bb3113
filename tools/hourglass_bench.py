"""On-chip decomposition of the enhancement stage (upfeat + HourGlass2).

The enhance stage is the largest remaining headroom item (25-49% MFU per the
round-2 trace). This times the stage and its internal pieces at the production
shape (batch 32, 256x256, bf16) to locate where the milliseconds go:
full-res in_conv (65ch input), down path, residual stack, up path, upfeat.

Run on the real chip:  python tools/hourglass_bench.py [--batch 32]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from disentangledcolorization_tpu.models.hourglass import HourGlass2
from disentangledcolorization_tpu.models.layers import (
    Conv,
    ConvBlock,
    DownsampleBlock,
    ResidualBlock,
    UpsampleBlock,
)
from disentangledcolorization_tpu.ops import superpixel as sp
from disentangledcolorization_tpu.tools.pallas_bench import _per_call_us

H = W = 256
D = 64


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=16)
    args = ap.parse_args()
    n, iters = args.batch, args.iters
    cdt = jnp.bfloat16
    rng = np.random.default_rng(0)
    print(f"backend: {jax.default_backend()}, batch {n}", flush=True)

    def row(name, make_fn, example):
        us = _per_call_us(make_fn, example, iters)
        print(f"{name:38s} {us:9.1f} us   ({us / n:7.1f} us/img)", flush=True)
        return us

    dec_grid = jnp.asarray(rng.normal(size=(n, H // 16, W // 16, D)).astype(np.float32))
    affinity = jnp.asarray(rng.dirichlet(np.ones(9), (n, H, W)).astype(np.float32))
    grays = jnp.asarray(rng.uniform(-1, 1, (n, H, W, 1)).astype(np.float32))

    row("upfeat (token->pixel unpool)", lambda x: sp.upfeat(
        x.astype(cdt), affinity.astype(cdt), 16, 16).astype(jnp.float32).mean(), dec_grid)

    enh_in = jnp.asarray(rng.normal(size=(n, H, W, D + 1)).astype(np.float32))

    hg = HourGlass2(out_channels=2, res_num=3, use_norm=True, train=False, sn_folded=True)
    hg_v = hg.init(jax.random.key(0), jnp.zeros((1, H, W, D + 1), cdt))
    row("HourGlass2 full", lambda x: hg.apply(hg_v, x.astype(cdt)).astype(jnp.float32).mean(), enh_in)

    # pieces
    inb = ConvBlock(64, conv_num=2, use_norm=True, train=False)
    inb_v = inb.init(jax.random.key(1), jnp.zeros((1, H, W, D + 1), cdt))
    row("  in_conv (2x conv@256^2, 65->64)", lambda x: inb.apply(
        inb_v, x.astype(cdt)).astype(jnp.float32).mean(), enh_in)

    f1 = jnp.asarray(rng.normal(size=(n, H, W, 64)).astype(np.float32))
    d1 = DownsampleBlock(128, conv_num=2, use_norm=True, train=False)
    d1_v = d1.init(jax.random.key(2), jnp.zeros((1, H, W, 64), cdt))
    row("  down1 (128^2, 128ch)", lambda x: d1.apply(
        d1_v, x.astype(cdt)).astype(jnp.float32).mean(), f1)

    f2 = jnp.asarray(rng.normal(size=(n, H // 2, W // 2, 128)).astype(np.float32))
    d2 = DownsampleBlock(256, conv_num=2, use_norm=True, train=False)
    d2_v = d2.init(jax.random.key(3), jnp.zeros((1, H // 2, W // 2, 128), cdt))
    row("  down2 (64^2, 256ch)", lambda x: d2.apply(
        d2_v, x.astype(cdt)).astype(jnp.float32).mean(), f2)

    f3 = jnp.asarray(rng.normal(size=(n, H // 4, W // 4, 256)).astype(np.float32))

    class Res3(nn.Module):
        @nn.compact
        def __call__(self, x):
            for i in range(3):
                x = ResidualBlock(256, use_norm=False, train=False, sn_folded=True,
                                  name=f"residual{i}")(x)
            return x

    r3 = Res3()
    r3_v = r3.init(jax.random.key(4), jnp.zeros((1, H // 4, W // 4, 256), cdt))
    row("  residuals x3 (64^2, 256ch)", lambda x: r3.apply(
        r3_v, x.astype(cdt)).astype(jnp.float32).mean(), f3)

    u2 = UpsampleBlock(128, conv_num=3, use_norm=True, train=False)
    u2_v = u2.init(jax.random.key(5), jnp.zeros((1, H // 4, W // 4, 256), cdt),
                   jnp.zeros((1, H // 2, W // 2, 128), cdt))
    row("  up2 (->128^2, 128ch, 3 convs)", lambda x: u2.apply(
        u2_v, x.astype(cdt), f2.astype(cdt)).astype(jnp.float32).mean(), f3)

    u1 = UpsampleBlock(64, conv_num=3, use_norm=True, train=False)
    u1_v = u1.init(jax.random.key(6), jnp.zeros((1, H // 2, W // 2, 128), cdt),
                   jnp.zeros((1, H, W, 64), cdt))
    row("  up1 (->256^2, 64ch, 3 convs)", lambda x: u1.apply(
        u1_v, x.astype(cdt), f1.astype(cdt)).astype(jnp.float32).mean(), f2)

    out = Conv(2)
    out_v = out.init(jax.random.key(7), jnp.zeros((1, H, W, 64), cdt))
    row("  out_conv (256^2, 64->2)", lambda x: out.apply(
        out_v, x.astype(cdt)).astype(jnp.float32).mean(), f1)


if __name__ == "__main__":
    main()
