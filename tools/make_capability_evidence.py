"""Exercise the user-facing capability surfaces with a trained checkpoint and
save the outputs as committed evidence (docs/evidence_r03/):

  * diverse mode   — 3 colorizations per image (reference --diverse,
                     inference.py:148-161: T=0,1,2 tiled into the batch)
  * no_resize      — original-resolution inference (edge-pad to %16,
                     inference.py:27-31)
  * interactive hints — user-supplied anchor locations + ab colors override
                     the predicted palette (reference io_user_control
                     affordance, basic.py:50-74 / model.py:163-164)

Run: python tools/make_capability_evidence.py --checkpt runs/colorizer_overfit \
         [--out docs/evidence_r03/capabilities]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import cv2
import numpy as np

REF_DATA = "/root/reference/data"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpt", default="runs/colorizer_overfit")
    ap.add_argument("--out", default="docs/evidence_r03/capabilities")
    ap.add_argument("--data", default=REF_DATA)
    args = ap.parse_args()

    import jax

    from disentangledcolorization_tpu.api import Colorizer

    os.makedirs(args.out, exist_ok=True)
    files = sorted(
        os.path.join(args.data, f)
        for f in os.listdir(args.data)
        if f.lower().endswith((".jpg", ".png"))
    )

    def save(name, rgb):
        cv2.imwrite(os.path.join(args.out, name), cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR))
        print("wrote", name, rgb.shape)

    c = Colorizer(checkpoint=args.checkpt, n_clusters=8)

    # 1. diverse: three distinct colorizations of the first image (256x256)
    img = cv2.cvtColor(cv2.imread(files[0]), cv2.COLOR_BGR2RGB)
    img256 = cv2.resize(img, (256, 256), interpolation=cv2.INTER_CUBIC)
    for i, var in enumerate(c.colorize(img256, diverse=True, key=jax.random.key(1))):
        save(f"diverse_T{i}.png", var)

    # 2. no_resize: original resolution (api pads to the 16-bucket internally)
    img2 = cv2.cvtColor(cv2.imread(files[1]), cv2.COLOR_BGR2RGB)
    save("no_resize_full.png", c.colorize(img2, key=jax.random.key(2)))

    # 3. interactive hints: anchor grid positions + user ab colors (normalized
    # ab in [-1, 1]). Two contrasting palettes of the same image demonstrate
    # the hints actually steer the output.
    hc = wc = 256 // 16
    mask = np.zeros((hc, wc), np.float32)
    ab_a = np.zeros((hc, wc, 2), np.float32)
    ab_b = np.zeros((hc, wc, 2), np.float32)
    pins = [(3, 3), (3, 12), (8, 8), (12, 4), (12, 12)]
    for y, x in pins:
        mask[y, x] = 1.0
        ab_a[y, x] = (0.25, -0.55)   # blue-ish
        ab_b[y, x] = (0.50, 0.35)    # warm red/orange
    save("hints_palette_blue.png", c.colorize(img256, hints=(mask, ab_a), key=jax.random.key(3)))
    save("hints_palette_warm.png", c.colorize(img256, hints=(mask, ab_b), key=jax.random.key(3)))
    save("hints_none_baseline.png", c.colorize(img256, key=jax.random.key(3)))


if __name__ == "__main__":
    main()
