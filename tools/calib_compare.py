"""Measure how int8 activation-calibration scales move between uniform-noise
inputs and real images (VERDICT r02 item 3b).

bench.py historically calibrated the static int8 scales on its own uniform
inputs; cli/infer.py calibrates on the first real batch. This tool runs the
DISCO_INT8=calib forward twice — once on uniform noise, once on the bundled
reference images — and reports the per-conv amax ratios, in particular which
convs' real-image ranges exceed noise-calibrated amax * CALIB_MARGIN (those
would clip in production if calibrated on noise).

Run: python tools/calib_compare.py [--checkpt trained.pkl|orbax_dir] [--batch 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

REF_DATA = os.environ.get("DISCO_REF_DATA", "/root/reference/data")
H = W = 256


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpt", default="", help="trained weights (pkl / Orbax dir); default random")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--data", default=REF_DATA)
    args = ap.parse_args()

    from disentangledcolorization_tpu.models import AnchorColorProb
    from disentangledcolorization_tpu.ops.quant import CALIB_MARGIN
    from disentangledcolorization_tpu.utils import io as io_lib

    model = AnchorColorProb(
        sp_size=16, n_clusters=8, enhanced=True, sn_folded=True, compute_dtype=jnp.bfloat16
    )
    rng = np.random.default_rng(0)
    noise_g = jnp.asarray(rng.uniform(-1, 1, (args.batch, H, W, 1)).astype(np.float32))
    zeros_c = jnp.zeros((args.batch, H, W, 1 + 1), jnp.float32)

    files = sorted(
        os.path.join(args.data, f) for f in os.listdir(args.data)
        if f.lower().endswith((".jpg", ".png"))
    )
    items = [io_lib.load_image_lab_resized(f, H) for f in files]
    real_g = np.stack([it["gray"] for it in items])
    reps = -(-args.batch // len(files))
    real_g = jnp.asarray(np.tile(real_g, (reps, 1, 1, 1))[: args.batch])

    variables = jax.jit(model.init, static_argnums=(3, 4, 5))(
        {"params": jax.random.key(0), "anchor": jax.random.key(1)},
        noise_g[:1], zeros_c[:1], True, 0, False,
    )
    if args.checkpt:
        if os.path.isdir(args.checkpt):
            from disentangledcolorization_tpu.train.checkpoint import load_train_variables

            loaded = load_train_variables(args.checkpt)
        else:
            import pickle

            with open(args.checkpt, "rb") as f:
                loaded = pickle.load(f)
        variables = {**variables, **loaded}

    os.environ["DISCO_INT8"] = "calib"
    calib = jax.jit(
        lambda v, g, c, k: model.apply(
            v, g, c, True, 0, False, rngs={"anchor": k}, mutable=["quant"]
        )[1]
    )
    quant_noise = jax.block_until_ready(calib(variables, noise_g, zeros_c, jax.random.key(9)))
    quant_real = jax.block_until_ready(calib(variables, real_g, zeros_c, jax.random.key(9)))
    os.environ["DISCO_INT8"] = "0"

    flat_n = {"/".join(str(k.key) for k in p): float(v) for p, v in
              jax.tree_util.tree_leaves_with_path(quant_noise["quant"])}
    flat_r = {"/".join(str(k.key) for k in p): float(v) for p, v in
              jax.tree_util.tree_leaves_with_path(quant_real["quant"])}

    rows, n_clip = [], 0
    for k in sorted(flat_n):
        a, b = flat_n[k], flat_r[k]
        ratio = b / max(a, 1e-12)
        clips = b > a * CALIB_MARGIN
        n_clip += clips
        rows.append({"conv": k, "amax_noise": round(a, 4), "amax_real": round(b, 4),
                     "real_over_noise": round(ratio, 3), "clips_at_margin": bool(clips)})
    ratios = np.array([r["real_over_noise"] for r in rows])
    summary = {
        "n_convs": len(rows),
        "ratio_mean": round(float(ratios.mean()), 3),
        "ratio_max": round(float(ratios.max()), 3),
        "ratio_min": round(float(ratios.min()), 3),
        "n_real_exceeds_noise_margin": int(n_clip),
        "calib_margin": CALIB_MARGIN,
        "weights": args.checkpt or "random-init",
    }
    for r in rows:
        print(json.dumps(r))
    print(json.dumps({"summary": summary}))


if __name__ == "__main__":
    main()
