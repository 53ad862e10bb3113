"""Quality delta of the int8 PTQ inference path (DISCO_INT8=1, ops/quant.py).

Runs the full AnchorColorProb forward twice on the 4 bundled reference images
(/root/reference/data/*.jpg, 256x256 resize mode) — once in the shipping f32
path, once with the wide convs int8-quantized — and reports the difference in
the predicted normalized ab (the model output consumed by the Lab->RGB save
path). Same methodology as the bf16-vs-f32 check in docs/STATUS.md.

Caveat: weights here are random-init (no pretrained drop in this env), so the
absolute delta is indicative, not a trained-model guarantee; re-run with a
converted checkpoint (--checkpt) when a drop arrives.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpt", type=str, default="", help="optional converted weights pickle")
    p.add_argument("--batch", type=int, default=4)
    args = p.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp

    from disentangledcolorization_tpu.models import AnchorColorProb

    files = sorted(glob.glob("/root/reference/data/*.jpg"))[: args.batch]
    grays, colors = [], []
    for f in files:
        bgr = cv2.resize(cv2.imread(f), (256, 256), interpolation=cv2.INTER_CUBIC)
        lab = cv2.cvtColor((bgr / 255.0).astype(np.float32), cv2.COLOR_BGR2LAB)
        grays.append((lab[..., :1] - 50.0) / 50.0)
        colors.append(lab[..., 1:] / 110.0)
    grays = jnp.asarray(np.stack(grays))
    colors = jnp.asarray(np.stack(colors).astype(np.float32))

    model = AnchorColorProb(sp_size=16, n_clusters=8, enhanced=True, sn_folded=True)
    if args.checkpt:
        import pickle

        with open(args.checkpt, "rb") as fh:
            variables = pickle.load(fh)
    else:
        variables = jax.jit(model.init, static_argnums=(3, 4, 5))(
            {"params": jax.random.key(0), "anchor": jax.random.key(1)},
            grays[:1],
            colors[:1],
            True,
            0,
            False,
        )
    jax.block_until_ready(variables)

    def run(mode):
        # variables are jit ARGUMENTS (closing over ~100 MB of weights embeds
        # them as constants and trips the axon remote-compile size limit)
        os.environ["DISCO_INT8"] = mode
        v = variables
        if mode == "static":
            os.environ["DISCO_INT8"] = "calib"
            _, mut = jax.jit(
                lambda vv, g, c, k: model.apply(
                    vv, g, c, True, 0, False, rngs={"anchor": k}, mutable=["quant"]
                )
            )(variables, grays, colors, jax.random.key(2))
            v = {**variables, **jax.block_until_ready(mut)}
            os.environ["DISCO_INT8"] = "static"
        f = jax.jit(
            lambda vv, g, c, k: model.apply(vv, g, c, True, 0, False, rngs={"anchor": k})[
                "pred_colors"
            ]
        )
        return np.asarray(f(v, grays, colors, jax.random.key(2)))

    ref = run("0")
    print(f"pred ab range f32: [{ref.min():.4f}, {ref.max():.4f}]")
    for mode in ("dynamic", "static"):
        d = np.abs(run(mode) - ref)
        print(f"{mode:7s} int8-vs-f32 normalized-ab diff: max {d.max():.4f}  mean {d.mean():.5f}")
        print(f"        (x110 -> ab units: worst pixel {d.max() * 110:.2f}, mean {d.mean() * 110:.3f})")


if __name__ == "__main__":
    main()
