"""Build a tiny overfit dataset from the 4 COCO images bundled with the
reference (/root/reference/data/*.jpg) for the trained-weight quality proof.

No pretrained weights exist in this environment (zero egress), so the
strongest available end-to-end evidence that the training objective optimizes
real colorization is to overfit the native two-stage chain (stage-1 SpixelNet,
then stage-2 AnchorColorProb) on these 4 images until inference visibly
colorizes them. This mirrors the reference recipe semantics at small scale
(/root/reference/main/colorizer/train_colorizer.py:25-121, scripts/train_yours.sh).

Layout produced (``disco`` dataset convention, train/data.py::build_dataset):
  <out>/train/  N_COPIES exact copies + N_CROPS random square crops (+ hflip)
                per source image
  <out>/val/    VAL_COPIES exact copies per source image (so one full
                validation batch exists at the training batch size)

Usage: python tools/make_overfit_data.py [--out runs/overfit_data]
"""

from __future__ import annotations

import argparse
import glob
import os
import shutil

import cv2
import numpy as np

SRC = "/root/reference/data"


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="runs/overfit_data")
    ap.add_argument("--src", default=SRC)
    ap.add_argument("--copies", type=int, default=8, help="exact copies per image (train)")
    ap.add_argument("--crops", type=int, default=24, help="random crops per image (train)")
    ap.add_argument("--val_copies", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    files = sorted(glob.glob(os.path.join(args.src, "*.jpg")))
    assert files, f"no source images under {args.src}"
    rng = np.random.default_rng(args.seed)

    train_dir = os.path.join(args.out, "train")
    val_dir = os.path.join(args.out, "val")
    for d in (train_dir, val_dir):
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d)

    for f in files:
        stem = os.path.splitext(os.path.basename(f))[0]
        img = cv2.imread(f, cv2.IMREAD_COLOR)
        h, w = img.shape[:2]
        for i in range(args.copies):
            shutil.copy(f, os.path.join(train_dir, f"{stem}_orig{i}.jpg"))
        for i in range(args.val_copies):
            shutil.copy(f, os.path.join(val_dir, f"{stem}_val{i}.jpg"))
        for i in range(args.crops):
            # square crop, 60-100% of the short side, random position + hflip;
            # the loader resizes everything to input_size anyway
            side = int(min(h, w) * rng.uniform(0.6, 1.0))
            y = rng.integers(0, h - side + 1)
            x = rng.integers(0, w - side + 1)
            crop = img[y : y + side, x : x + side]
            if rng.random() < 0.5:
                crop = crop[:, ::-1]
            cv2.imwrite(
                os.path.join(train_dir, f"{stem}_crop{i}.png"), np.ascontiguousarray(crop)
            )

    n_train = len(os.listdir(train_dir))
    n_val = len(os.listdir(val_dir))
    print(f"overfit data: {n_train} train / {n_val} val files under {args.out}")


if __name__ == "__main__":
    main()
