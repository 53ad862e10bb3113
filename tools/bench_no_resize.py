"""Benchmark the arbitrary-resolution (--no_resize) inference path on TPU.

VERDICT r3 Next #6b: the no_resize/bucketed path has trained-weight
*correctness* evidence (docs/evidence_r03/capabilities/no_resize_full.png) but
no throughput number. This measures it end-to-end through the real CLI
(`cli/infer.py --no_resize`): per-image execution, one jitted graph per padded
shape bucket, background decode prefetch, async PNG writer — the same code a
user runs. Reference capability: arbitrary-resolution inference,
/root/reference/main/colorizer/inference.py:27-31 (non-multiple-of-8 guard +
resize-or-keep semantics).

Method: N images across the 3 native resolutions of the bundled COCO images
(612x612, 480x640, 640x480 -> 3 shape buckets at --bucket 16). A warmup pass
over the unique shapes pays the per-bucket jit compiles; the timed pass then
measures steady-state wall time including decode and PNG writes (honest for
this path — it is per-image and host-I/O heavy by construction). A resize-mode
(256x256, batched) leg over the same files gives the comparator.

Prints ONE JSON line:
  {"no_resize_img_s": ..., "resize_img_s": ..., "n": ..., "buckets": 3,
   "bucket": 16, "mode": "end-to-end CLI wall (decode+device+PNG)"}

Usage: python tools/bench_no_resize.py [--repeats 8] [--bucket 16] [--int8]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_DATA = os.environ.get("DISCO_REF_DATA", "/root/reference/data")
# the 3 distinct native resolutions of the bundled reference images
FALLBACK_SHAPES = [(612, 612), (480, 640), (640, 480), (612, 612)]


def build_corpus(out_dir: str, repeats: int) -> int:
    """Copy the bundled images (or synthesize same-shape noise) x repeats."""
    import cv2

    srcs = sorted(glob.glob(os.path.join(REF_DATA, "*.jpg")))
    if srcs:
        imgs = [cv2.imread(p) for p in srcs]
    else:
        print(
            f"# WARNING: {REF_DATA!r} absent — benchmarking on synthetic noise "
            "images at the same resolutions (shapes/buckets identical, decode "
            "cost slightly different). Set DISCO_REF_DATA to override.",
            file=sys.stderr,
        )
        rng = np.random.default_rng(0)
        imgs = [rng.integers(0, 256, (h, w, 3), np.uint8) for h, w in FALLBACK_SHAPES]
    n = 0
    for r in range(repeats):
        for i, im in enumerate(imgs):
            cv2.imwrite(os.path.join(out_dir, f"img{i}_{r}.jpg"), im)
            n += 1
    return n


def run_cli(data_dir: str, save_root: str, name: str, extra: list[str]) -> float:
    from disentangledcolorization_tpu.cli import infer

    t0 = time.time()
    infer.main(
        ["--data", data_dir, "--save_dir", save_root, "--name", name, *extra]
    )
    return time.time() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=8, help="corpus = 4 images x repeats")
    ap.add_argument("--bucket", type=int, default=16)
    ap.add_argument("--checkpt", default="", help="optional trained checkpoint")
    ap.add_argument("--int8", action="store_true", help="bench the int8 PTQ config")
    ap.add_argument("--n_clusters", type=int, default=8)
    ap.add_argument(
        "--skip_resize_leg", action="store_true",
        help="only measure the no_resize path (the 256x256 comparator leg "
        "compiles a 256x256 batch graph — skip on CPU smoke drives)",
    )
    args = ap.parse_args()

    if not args.int8:
        os.environ.setdefault("DISCO_INT8", "0")

    tmp = tempfile.mkdtemp(prefix="bench_noresize_")
    try:
        data_dir = os.path.join(tmp, "data")
        warm_dir = os.path.join(tmp, "warm")
        os.makedirs(data_dir)
        os.makedirs(warm_dir)
        n = build_corpus(data_dir, args.repeats)
        build_corpus(warm_dir, 1)  # one of each shape: pays every bucket compile

        ck = ["--checkpt", args.checkpt] if args.checkpt else []
        ck += ["--n_clusters", str(args.n_clusters)]
        nr = ["--no_resize", "--bucket", str(args.bucket), *ck]
        # warmup: compile one graph per shape bucket (and the resize batch graph)
        run_cli(warm_dir, tmp, "w_nr", nr)
        t_rs = None
        if not args.skip_resize_leg:
            run_cli(warm_dir, tmp, "w_rs", ["--batch_size", "4", *ck])

        t_nr = run_cli(data_dir, tmp, "t_nr", nr)
        if not args.skip_resize_leg:
            t_rs = run_cli(data_dir, tmp, "t_rs", ["--batch_size", "16", *ck])

        out_nr = glob.glob(os.path.join(tmp, "t_nr-anchor*", "*.png"))
        assert len(out_nr) == n, f"no_resize wrote {len(out_nr)}/{n} images"
        print(
            json.dumps(
                {
                    "no_resize_img_s": round(n / t_nr, 2),
                    "resize_img_s": round(n / t_rs, 2) if t_rs else None,
                    "n": n,
                    "buckets": 3,
                    "bucket": args.bucket,
                    "int8": bool(args.int8),
                    "mode": "end-to-end CLI wall (decode+device+PNG)",
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
