"""Eval harness CLI: PSNR / SSIM / colorfulness / FID over result folders.

The reference ships these as an external download (README.md:109-118); here
they are first-class (BASELINE config #5). Compares a prediction folder
against a ground-truth folder:

  python -m disentangledcolorization_tpu.cli.evaluate --pred ./out --gt ./coco_val
"""

from __future__ import annotations

import argparse
import json
import os

import cv2
import numpy as np

from ..train import metrics as M
from ..utils import io as io_lib


def main(argv=None):
    p = argparse.ArgumentParser("disco-tpu evaluate")
    p.add_argument("--pred", type=str, required=True, help="predicted image dir")
    p.add_argument("--gt", type=str, required=True, help="ground-truth image dir")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--fid", action="store_true", default=False)
    p.add_argument("--lpips", action="store_true", default=False)
    p.add_argument("--is_score", action="store_true", default=False,
                   help="Inception Score of the prediction folder")
    p.add_argument("--vgg_npz", type=str, default=None,
                   help="converted torchvision VGG19 weights (FID fallback + LPIPS backbone)")
    p.add_argument("--lpips_lin", type=str, default=None,
                   help="npz of learned LPIPS per-channel weights lin0..lin4")
    p.add_argument("--inception_pkl", type=str, default=None,
                   help="pickled flax InceptionV3 variables (FID extractor / IS head)")
    args = p.parse_args(argv)

    pred_files = io_lib.get_filelist(args.pred)
    gt_by_stem = {
        os.path.splitext(os.path.basename(f))[0]: f for f in io_lib.get_filelist(args.gt)
    }
    pairs = []
    for f in pred_files:
        stem = os.path.splitext(os.path.basename(f))[0]
        # diverse outputs have -cN suffixes; match on the base stem
        base = stem.rsplit("-c", 1)[0] if stem.rsplit("-c", 1)[-1].isdigit() else stem
        if base in gt_by_stem:
            pairs.append((f, gt_by_stem[base]))
    print(f"evaluating {len(pairs)} pairs")

    def load(f):
        bgr = cv2.imread(f, cv2.IMREAD_COLOR)
        bgr = cv2.resize(bgr, (256, 256), interpolation=cv2.INTER_AREA)
        return cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0

    lpips_fn, lpips_name = (
        M.make_lpips(args.vgg_npz, args.lpips_lin) if args.lpips else (None, None)
    )
    psnrs, ssims, colorf, lpipss = [], [], [], []
    for s in range(0, len(pairs), args.batch):
        chunk = pairs[s : s + args.batch]
        pred = np.stack([load(a) for a, _ in chunk])
        gt = np.stack([load(b) for _, b in chunk])
        psnrs.extend(np.asarray(M.psnr(pred, gt)).tolist())
        ssims.extend(np.asarray(M.ssim(pred, gt)).tolist())
        colorf.extend(np.asarray(M.colorfulness(pred)).tolist())
        if lpips_fn is not None:
            lpipss.extend(np.asarray(lpips_fn(pred, gt)).tolist())

    result = {
        "psnr": float(np.mean(psnrs)) if psnrs else None,
        "ssim": float(np.mean(ssims)) if ssims else None,
        "colorfulness": float(np.mean(colorf)) if colorf else None,
        "n": len(pairs),
    }
    if lpips_fn is not None:
        result["lpips"] = float(np.mean(lpipss)) if lpipss else None
        result["lpips_extractor"] = lpips_name
    if args.fid:
        result.update(
            M.fid_from_dirs(args.pred, args.gt, args.batch, args.inception_pkl or args.vgg_npz)
        )
    if args.is_score:
        result.update(M.inception_score_from_dir(args.pred, args.batch, args.inception_pkl))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
