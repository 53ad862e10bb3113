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

``--jitter N`` additionally writes N chroma-jittered variants of every train
image (hue rotation + chroma scaling applied in the Lab ab-plane, so the L
channel — the model INPUT — is bit-unchanged while the GT colors differ).
With jitter, gray->color is no longer a function: the same grayscale content
appears with several different ground-truth colorizations, so minimizing the
hint-path losses REQUIRES conditioning on the anchor colors. This is the
anchor-conditioning-preserving recipe for the trained-weight evidence of
``--diverse`` / interactive hints (reference capabilities:
/root/reference/main/colorizer/inference.py:148-161, models/model.py:163-189),
which a plain 4-image overfit collapses (round-3 finding).

Usage: python tools/make_overfit_data.py [--out runs/overfit_data] [--jitter N]
"""

from __future__ import annotations

import argparse
import glob
import os
import shutil

import cv2
import numpy as np

SRC = os.environ.get("DISCO_REF_DATA", "/root/reference/data")


def chroma_jitter(img_bgr: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Rotate + scale the ab chroma plane of a BGR uint8 image, keeping L.

    cv2's uint8 Lab stores a,b offset by 128; rotating (a-128, b-128) by a
    random angle and scaling its radius changes the colors without touching
    the L channel, i.e. the grayscale input the model sees is identical while
    the ground-truth colorization differs. Out-of-sRGB-gamut results are
    clipped by the LAB2BGR conversion (slightly desaturated, never invalid).
    """
    lab = cv2.cvtColor(img_bgr, cv2.COLOR_BGR2LAB).astype(np.float32)
    theta = rng.uniform(0.35, 2 * np.pi - 0.35)  # never a near-identity rotation
    scale = rng.uniform(0.8, 1.25)
    c, s = np.cos(theta), np.sin(theta)
    a = lab[..., 1] - 128.0
    b = lab[..., 2] - 128.0
    lab[..., 1] = np.clip(scale * (c * a - s * b) + 128.0, 0, 255)
    lab[..., 2] = np.clip(scale * (s * a + c * b) + 128.0, 0, 255)
    return cv2.cvtColor(lab.astype(np.uint8), cv2.COLOR_LAB2BGR)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="runs/overfit_data")
    ap.add_argument("--src", default=SRC)
    ap.add_argument("--copies", type=int, default=8, help="exact copies per image (train)")
    ap.add_argument("--crops", type=int, default=24, help="random crops per image (train)")
    ap.add_argument("--val_copies", type=int, default=4)
    ap.add_argument(
        "--jitter",
        type=int,
        default=0,
        help="chroma-jittered variants per train image (0 = natural colors only)",
    )
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
            for j in range(args.jitter):
                cv2.imwrite(
                    os.path.join(train_dir, f"{stem}_orig{i}_jit{j}.png"),
                    chroma_jitter(img, rng),
                )
        for i in range(args.val_copies):
            shutil.copy(f, os.path.join(val_dir, f"{stem}_val{i}.jpg"))
        for i in range(args.crops):
            # square crop, 60-100% of the short side, random position + hflip;
            # the loader resizes everything to input_size anyway
            side = int(min(h, w) * rng.uniform(0.6, 1.0))
            y = rng.integers(0, h - side + 1)
            x = rng.integers(0, w - side + 1)
            crop = np.ascontiguousarray(img[y : y + side, x : x + side])
            if rng.random() < 0.5:
                crop = np.ascontiguousarray(crop[:, ::-1])
            cv2.imwrite(os.path.join(train_dir, f"{stem}_crop{i}.png"), crop)
            for j in range(args.jitter):
                cv2.imwrite(
                    os.path.join(train_dir, f"{stem}_crop{i}_jit{j}.png"),
                    chroma_jitter(crop, rng),
                )

    n_train = len(os.listdir(train_dir))
    n_val = len(os.listdir(val_dir))
    print(f"overfit data: {n_train} train / {n_val} val files under {args.out}")


if __name__ == "__main__":
    main()
