"""Per-stage wall-time decomposition of the flagship inference forward, on-chip.

Times each pipeline stage in isolation (same scan-chain methodology as
bench.py: iteration-dependent inputs, scalar-fetch sync, 1-iter overhead
subtracted) and sweeps the full forward over batch sizes — the measured answer
to round-1's open questions "where do the non-MXU milliseconds go" and "why is
there a batch-24/32 cliff".

Run: python tools/decompose_bench.py [--batches 8,16,24,32] [--iters 24]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from disentangledcolorization_tpu.models import AnchorColorProb
from disentangledcolorization_tpu.models.colorprobnet import ColorProbNet
from disentangledcolorization_tpu.models.hourglass import HourGlass2
from disentangledcolorization_tpu.models.spixelnet import SpixelSeg
from disentangledcolorization_tpu.models.transformer import TransformerEncoder
from disentangledcolorization_tpu.models import anchor
from disentangledcolorization_tpu.ops import colorlabel as cl
from disentangledcolorization_tpu.ops import superpixel as sp
from disentangledcolorization_tpu.tools.pallas_bench import _per_call_us

H = W = 256
D = 64


def stage_table(n: int, iters: int):
    cdt = jnp.bfloat16
    rng = np.random.default_rng(0)
    grays = jnp.asarray(rng.uniform(-1, 1, (n, H, W, 1)).astype(np.float32))
    hc, wc, t = H // 16, W // 16, (H // 16) * (W // 16)

    rows = []

    segnet = SpixelSeg(batch_norm=True, train=False)
    seg_v = segnet.init(jax.random.key(0), grays.astype(cdt))
    rows.append(("segnet (SpixelNet U-Net)", _per_call_us(
        lambda g: segnet.apply(seg_v, g.astype(cdt)).astype(jnp.float32), grays, iters)))

    repnet = ColorProbNet(out_channels=D, train=False, sn_folded=True)
    rep_v = repnet.init(jax.random.key(1), grays.astype(cdt))
    rows.append(("repnet (ColorProbNet)", _per_call_us(
        lambda g: repnet.apply(rep_v, g.astype(cdt)).astype(jnp.float32), grays, iters)))

    affinity = jnp.asarray(rng.dirichlet(np.ones(9), (n, H, W)).astype(np.float32))
    feats66 = jnp.asarray(rng.normal(size=(n, H, W, D + 2)).astype(np.float32))

    def pool_stage(x):
        pooled, _ = sp.poolfeat(x, affinity, 16, 16, True)
        labels = cl.nearest_bin_index(pooled[..., D:])
        sizes = sp.get_spixel_size(affinity, 16, 16)
        return pooled.sum() + labels.sum() + sizes.sum()

    rows.append(("poolfeat + bin-index + sizes", _per_call_us(pool_stage, feats66, iters)))

    tokens = jnp.asarray(rng.normal(size=(n, t, D)).astype(np.float32))
    pos = jnp.asarray(rng.normal(size=(1, t, D)).astype(np.float32))
    pos = jnp.broadcast_to(pos, (n, t, D))
    enc = TransformerEncoder(6, D, 8, 256, 0.1, True)
    enc_v = enc.init(jax.random.key(2), tokens, pos, None, deterministic=True)
    rows.append(("wildpath (6-layer encoder)", _per_call_us(
        lambda x: enc.apply(enc_v, x, pos, None, deterministic=True)[0], tokens, iters)))

    tok_grid = jnp.asarray(rng.normal(size=(n, hc, wc, D)).astype(np.float32))
    sizes = jnp.asarray(rng.uniform(0.5, 1.5, (n, hc, wc, 1)).astype(np.float32))

    def kmeans_stage(x):
        mask, _ = anchor.clustering_hint_mask(jax.random.key(3), x, 8, sizes)
        return mask.sum()

    rows.append(("k-means anchors (8 clusters)", _per_call_us(kmeans_stage, tok_grid, iters)))

    probs = jax.nn.softmax(jnp.asarray(rng.normal(size=(n, hc, wc, 313)).astype(np.float32)))

    def sample_stage(p):
        cols = anchor.sample_anchor_colors(p, T=0)
        return cl.nearest_bin_index(cols).sum().astype(jnp.float32)

    rows.append(("anchor color sample + encode", _per_call_us(sample_stage, probs, iters)))

    hint_in = jnp.asarray(rng.normal(size=(n, t, D + 313 + 1)).astype(np.float32))
    # hintpath = same encoder + the 378->64 embedding
    import flax.linen as nn

    class HintPath(nn.Module):
        @nn.compact
        def __call__(self, x):
            s = nn.Dense(D, use_bias=False)(x)
            out, _ = TransformerEncoder(6, D, 8, 256, 0.1, True)(s, pos[:1].repeat(x.shape[0], 0), None, deterministic=True)
            return nn.Dense(313, use_bias=False)(out)

    hp = HintPath()
    hp_v = hp.init(jax.random.key(4), hint_in)
    rows.append(("hintpath (emb + 6-layer + prj)", _per_call_us(
        lambda x: hp.apply(hp_v, x), hint_in, iters)))

    dec_grid = jnp.asarray(rng.normal(size=(n, hc, wc, D)).astype(np.float32))
    hg = HourGlass2(out_channels=2, res_num=3, use_norm=True, train=False, sn_folded=True)
    hg_v = hg.init(jax.random.key(5), jnp.zeros((1, H, W, D + 1), cdt))

    def enh_stage(x):
        full = sp.upfeat(x.astype(cdt), affinity.astype(cdt), 16, 16)
        enh_in = jnp.concatenate([grays.astype(cdt), full], axis=-1)
        return jnp.tanh(hg.apply(hg_v, enh_in).astype(jnp.float32))

    rows.append(("upfeat + HourGlass2 (enhance)", _per_call_us(enh_stage, dec_grid, iters)))

    # full model for cross-check
    model = AnchorColorProb(sp_size=16, n_clusters=8, enhanced=True, sn_folded=True,
                            compute_dtype=cdt)
    colors = jnp.zeros((n, H, W, 2), jnp.float32)
    mv = model.init({"params": jax.random.key(6), "anchor": jax.random.key(7)},
                    grays, colors, True, 0, False)

    def full(g):
        out = model.apply(mv, g, colors, True, 0, False, rngs={"anchor": jax.random.key(8)})
        return out["pred_colors"]

    rows.append(("FULL forward", _per_call_us(full, grays, iters)))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=24)
    ap.add_argument("--sweep", type=str, default="",
                    help="comma list of batch sizes: full-forward throughput sweep only")
    args = ap.parse_args()
    print(f"backend: {jax.default_backend()}")

    if args.sweep:
        rng = np.random.default_rng(0)
        for n in [int(x) for x in args.sweep.split(",")]:
            grays = jnp.asarray(rng.uniform(-1, 1, (n, H, W, 1)).astype(np.float32))
            colors = jnp.zeros((n, H, W, 2), jnp.float32)
            model = AnchorColorProb(sp_size=16, n_clusters=8, enhanced=True,
                                    sn_folded=True, compute_dtype=jnp.bfloat16)
            mv = model.init({"params": jax.random.key(0), "anchor": jax.random.key(1)},
                            grays, colors, True, 0, False)

            def full(g):
                out = model.apply(mv, g, colors, True, 0, False,
                                  rngs={"anchor": jax.random.key(2)})
                return out["pred_colors"]

            us = _per_call_us(full, grays, args.iters)
            print(f"batch {n:3d}: {us:9.1f} us/fwd = {n / (us * 1e-6):7.1f} img/s")
        return

    total = 0.0
    rows = stage_table(args.batch, args.iters)
    for name, us in rows:
        if not name.startswith("FULL"):
            total += us
        print(f"{name:34s} {us:9.1f} us   ({us / args.batch:7.1f} us/img)")
    print(f"{'sum of stages':34s} {total:9.1f} us")


if __name__ == "__main__":
    main()
