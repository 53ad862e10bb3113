"""SpixelNet standalone inference: superpixel maps + pool/unpool reconstruction.

Capability parity with /root/reference/main/spixelseg/inference.py:38-118
(BASELINE config #2): affinity -> winner-take-all spixel id map, boundary-marked
PNG, and the pool->unpool ab reconstruction demo.

Usage: python -m disentangledcolorization_tpu.cli.infer_spixel --data ./imgs --checkpt spixel.pkl
"""

from __future__ import annotations

import argparse
import os
import pickle
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..models import SpixelSeg
from ..ops import superpixel as sp
from ..utils import io as io_lib


def main(argv=None):
    p = argparse.ArgumentParser("disco-tpu spixel inference")
    p.add_argument("--name", type=str, default="spixel")
    p.add_argument("--seed", default=130, type=int)
    p.add_argument("--psize", default=16, type=int)
    p.add_argument("--data", type=str, default="./data")
    p.add_argument("--checkpt", type=str, default="")
    p.add_argument("--input_size", default=256, type=int)
    args = p.parse_args(argv)

    save_dir = f"./{args.name}-s{args.psize}"
    os.makedirs(save_dir, exist_ok=True)
    img_list = io_lib.get_filelist(args.data)
    print(f"@SpixelSeg inference: {len(img_list)} images (psize={args.psize}) -> {save_dir}")

    model = SpixelSeg()
    example = jnp.zeros((1, args.input_size, args.input_size, 1), jnp.float32)
    if args.checkpt and os.path.exists(args.checkpt):
        if args.checkpt.endswith((".pkl", ".pickle")):
            with open(args.checkpt, "rb") as f:
                variables = pickle.load(f)
        else:
            from ..tools import convert_torch as cvt

            variables = cvt.convert_spixelseg_state_dict(cvt.load_torch_checkpoint(args.checkpt))
        print("-weight loaded successfully.")
    else:
        print("@Warning: no checkpoint loaded — random weights (smoke-test mode)")
        variables = model.init(jax.random.key(args.seed), example)

    ids, _ = sp.init_spixel_grid(args.input_size, args.input_size, args.psize)

    @jax.jit
    def forward(variables, grays, colors):
        prob = model.apply(variables, grays)
        spix_map = sp.split_spixels(prob, ids)
        pooled = sp.poolfeat(colors, prob, args.psize, args.psize)
        recon = sp.upfeat(pooled, prob, args.psize, args.psize)
        return prob, spix_map, recon

    t0 = time.time()
    for pth in img_list:
        name = os.path.splitext(os.path.basename(pth))[0] + ".png"
        item = io_lib.load_image_lab_resized(pth, resize=args.input_size)
        grays = jnp.asarray(item["gray"][None])
        colors = jnp.asarray(item["color"][None])
        _, spix_map, recon = forward(variables, grays, colors)
        io_lib.save_markedSP_from_batch(
            item["BGR"][None][..., ::-1], np.asarray(spix_map), save_dir, [name], -1, suffix="spix"
        )
        lab = np.concatenate([item["gray"][None], np.asarray(recon)], axis=-1)
        io_lib.save_normLabs_from_batch(lab, save_dir, [name], -1, suffix="recon")
    print(f"-processed {len(img_list)} imgs. consumed {time.time() - t0:.3f} sec")


if __name__ == "__main__":
    main()
