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

REF_DATA = os.environ.get("DISCO_REF_DATA", "/root/reference/data")


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
    metrics = {}

    # 1. diverse: three distinct colorizations of the first image (256x256)
    img = cv2.cvtColor(cv2.imread(files[0]), cv2.COLOR_BGR2RGB)
    img256 = cv2.resize(img, (256, 256), interpolation=cv2.INTER_CUBIC)
    variants = c.colorize(img256, diverse=True, key=jax.random.key(1))
    for i, var in enumerate(variants):
        save(f"diverse_T{i}.png", var)
    # quantify distinctness: pairwise mean |RGB| delta (8-bit levels) between
    # the three temperature samplings — the reference's --diverse promise is
    # three VISIBLY different results (inference.py:148-161)
    metrics["diverse_pairwise_mean_rgb_delta"] = {
        f"T{i}_vs_T{j}": float(
            np.abs(variants[i].astype(np.int16) - variants[j].astype(np.int16)).mean()
        )
        for i, j in ((0, 1), (0, 2), (1, 2))
    }

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
    ab_c = np.zeros((hc, wc, 2), np.float32)
    pins = [(3, 3), (3, 12), (8, 8), (12, 4), (12, 12)]
    for y, x in pins:
        mask[y, x] = 1.0
        ab_a[y, x] = (0.25, -0.55)   # blue-ish
        ab_b[y, x] = (0.50, 0.35)    # warm red/orange
        ab_c[y, x] = (-0.50, 0.40)   # green
    hinted_a = c.colorize(img256, hints=(mask, ab_a), key=jax.random.key(3))
    hinted_b = c.colorize(img256, hints=(mask, ab_b), key=jax.random.key(3))
    hinted_c = c.colorize(img256, hints=(mask, ab_c), key=jax.random.key(3))
    baseline = c.colorize(img256, key=jax.random.key(3))
    save("hints_palette_blue.png", hinted_a)
    save("hints_palette_warm.png", hinted_b)
    save("hints_palette_green.png", hinted_c)
    save("hints_none_baseline.png", baseline)

    # Quantify SEMANTIC steering (VERDICT r3 Next #7): inside the hinted
    # 16x16 anchor blocks, the output's mean ab must move TOWARD the hint
    # color relative to the unhinted baseline — not merely differ anywhere.
    def region_mean_ab(rgb):
        lab = cv2.cvtColor(rgb.astype(np.float32) / 255.0, cv2.COLOR_RGB2LAB)
        ab = lab[..., 1:] / 110.0  # normalized like the hint ab
        return np.stack([
            ab[y * 16 : (y + 1) * 16, x * 16 : (x + 1) * 16].reshape(-1, 2).mean(0)
            for (y, x) in pins
        ])

    base_ab = region_mean_ab(baseline)
    for name, hinted, hint_ab in (
        ("blue", hinted_a, ab_a),
        ("warm", hinted_b, ab_b),
        ("green", hinted_c, ab_c),
    ):
        got_ab = region_mean_ab(hinted)
        target = np.stack([hint_ab[y, x] for (y, x) in pins])
        d_base = np.linalg.norm(base_ab - target, axis=1)
        d_hint = np.linalg.norm(got_ab - target, axis=1)
        metrics[f"hint_steering_{name}"] = {
            "mean_dist_to_hint_baseline": float(d_base.mean()),
            "mean_dist_to_hint_hinted": float(d_hint.mean()),
            "moved_toward_hint": bool(d_hint.mean() < d_base.mean()),
            "mean_rgb_delta_vs_baseline": float(
                np.abs(hinted.astype(np.int16) - baseline.astype(np.int16)).mean()
            ),
        }
    metrics["hints_blue_vs_warm_mean_rgb_delta"] = float(
        np.abs(hinted_a.astype(np.int16) - hinted_b.astype(np.int16)).mean()
    )

    # 4. hints at the MODEL'S OWN anchor positions: the k-means anchors land
    # on content-representative tokens — the positions where training ever
    # placed anchors — so steering there isolates color-following from the
    # position-generalization question raised by the fixed grid pins above.
    own = c.anchor_mask(img256, key=jax.random.key(3))
    own_pins = [tuple(p) for p in np.argwhere(own > 0.5)]
    for name, hint in (("blue", (0.25, -0.55)), ("green", (-0.50, 0.40))):
        ab_o = np.zeros((hc, wc, 2), np.float32)
        for y, x in own_pins:
            ab_o[y, x] = hint
        hinted_o = c.colorize(img256, hints=(own, ab_o), key=jax.random.key(3))
        save(f"hints_own_anchors_{name}.png", hinted_o)

        def pin_mean_ab(rgb, pins):
            lab = cv2.cvtColor(rgb.astype(np.float32) / 255.0, cv2.COLOR_RGB2LAB)
            ab = lab[..., 1:] / 110.0
            return np.stack([
                ab[y * 16 : (y + 1) * 16, x * 16 : (x + 1) * 16].reshape(-1, 2).mean(0)
                for (y, x) in pins
            ])

        target = np.stack([ab_o[y, x] for (y, x) in own_pins])
        d_base = np.linalg.norm(pin_mean_ab(baseline, own_pins) - target, axis=1)
        d_hint = np.linalg.norm(pin_mean_ab(hinted_o, own_pins) - target, axis=1)
        metrics[f"hint_steering_own_anchors_{name}"] = {
            "n_anchor_positions": len(own_pins),
            "mean_dist_to_hint_baseline": float(d_base.mean()),
            "mean_dist_to_hint_hinted": float(d_hint.mean()),
            "moved_toward_hint": bool(d_hint.mean() < d_base.mean()),
            "mean_rgb_delta_vs_baseline": float(
                np.abs(hinted_o.astype(np.int16) - baseline.astype(np.int16)).mean()
            ),
        }

    import json

    with open(os.path.join(args.out, "steering_metrics.json"), "w") as f:
        json.dump(metrics, f, indent=2)
    print(json.dumps(metrics, indent=2))


if __name__ == "__main__":
    main()
