"""Host input-pipeline throughput: can the loader feed the chip?

The v5e chip sustains ~380 img/s on batch inference (bench.py) and ~112 img/s
on the train step (tools/bench_train.py). This tool measures what the host-side
`train.data.DataLoader` (threaded cv2 decode -> Lab convert -> batch stack,
reference pipeline: /root/reference/utils/dataset_lab.py:24-37) actually
delivers, as a function of worker count, so the input pipeline is a measured
quantity rather than an assumed-free one.

Synthesizes a folder of random JPEGs (decode cost is content-independent at
fixed resolution), then times full epochs through the production DataLoader.

Run: python tools/bench_data.py [--n 512] [--src_size 500] [--batch 32]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import cv2
import numpy as np


def make_corpus(root: str, n: int, size: int) -> None:
    rng = np.random.default_rng(0)
    for i in range(n):
        # low-frequency noise compresses like a natural image (few-KB JPEGs
        # would overstate decode throughput)
        small = rng.integers(0, 256, (size // 8, size // 8, 3), np.uint8)
        img = cv2.resize(small, (size, size), interpolation=cv2.INTER_CUBIC)
        cv2.imwrite(os.path.join(root, f"{i:05d}.jpg"), img, [cv2.IMWRITE_JPEG_QUALITY, 92])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--src_size", type=int, default=500, help="source JPEG side (decode cost driver)")
    ap.add_argument("--resize", type=int, default=256)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--workers", type=int, nargs="*", default=[1, 4, 8, 16, 32])
    args = ap.parse_args()

    from disentangledcolorization_tpu.train.data import DataLoader, LabDataset

    with tempfile.TemporaryDirectory() as root:
        make_corpus(root, args.n, args.src_size)
        ds = LabDataset(rootdir=root, resize=args.resize)
        sizes = os.path.getsize(os.path.join(root, "00000.jpg")) / 1024
        print(f"corpus: {args.n} JPEGs {args.src_size}px (~{sizes:.0f} KB each) -> {args.resize}px Lab batches of {args.batch}")
        for w in args.workers:
            dl = DataLoader(ds, args.batch, shuffle=False, num_workers=w, prefetch=4)
            # warm epoch (page cache, thread pool spin-up)
            for _ in dl:
                pass
            t0 = time.perf_counter()
            nimg = 0
            for b in dl:
                nimg += b["gray"].shape[0]
            dt = time.perf_counter() - t0
            print(f"workers={w:>2}: {nimg/dt:7.1f} img/s  ({dt*1e3/max(nimg//args.batch,1):.1f} ms/batch)")


if __name__ == "__main__":
    main()
