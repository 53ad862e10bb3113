"""End-to-end serving benchmark: throughput + latency through the DynamicBatcher.

Unlike bench.py (pure device compute), this measures the full serving path a
production client sees: host Lab prep -> dynamic batching -> device dispatch
(through the axon tunnel, where attached) -> host RGB conversion. Concurrent
client threads submit back-to-back requests for a fixed duration; reports
sustained img/s, latency percentiles, and the achieved mean batch size.

Run: python tools/bench_serve.py [--clients 64] [--seconds 20] [--size 256]
                                 [--max_batch 128] [--checkpt w.pkl]
"""

from __future__ import annotations

import argparse
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=64)
    ap.add_argument("--seconds", type=float, default=20.0)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--max_batch", type=int, default=128)
    ap.add_argument("--max_wait_ms", type=float, default=2.0)
    ap.add_argument("--checkpt", default="")
    ap.add_argument("--n_clusters", type=int, default=8)
    ap.add_argument("--wire", default="uint8", choices=["uint8", "float32"],
                    help="device->host ab transfer format (serving default uint8)")
    args = ap.parse_args()

    from disentangledcolorization_tpu.api import Colorizer
    from disentangledcolorization_tpu.serve import DynamicBatcher

    col = Colorizer(checkpoint=args.checkpt, n_clusters=args.n_clusters, wire_dtype=args.wire)
    warm = sorted({b for b in Colorizer.BATCH_BUCKETS if b <= args.max_batch})
    print(f"warming buckets {warm} at {args.size}x{args.size} ...", flush=True)
    col.warmup(size=args.size, buckets=warm)
    batcher = DynamicBatcher(col, max_batch=args.max_batch, max_wait_ms=args.max_wait_ms)

    rng = np.random.default_rng(0)
    imgs = [
        rng.integers(0, 256, (args.size, args.size), np.uint8) for _ in range(8)
    ]
    latencies: list[float] = []
    lat_lock = threading.Lock()
    stop = threading.Event()

    def client(i: int):
        k = 0
        while not stop.is_set():
            t0 = time.perf_counter()
            batcher.colorize(imgs[(i + k) % len(imgs)], timeout=120)
            dt = time.perf_counter() - t0
            with lat_lock:
                latencies.append(dt)
            k += 1

    threads = [threading.Thread(target=client, args=(i,), daemon=True) for i in range(args.clients)]
    t_start = time.perf_counter()
    for t in threads:
        t.start()
    time.sleep(args.seconds)
    stop.set()
    for t in threads:
        t.join(timeout=30)
    elapsed = time.perf_counter() - t_start
    batcher.close()

    lat = np.sort(np.asarray(latencies))
    st = batcher.stats()
    mean_batch = st["requests"] / max(st["batches"], 1)
    print(
        f"serving: {len(lat)/elapsed:.1f} img/s sustained with {args.clients} clients | "
        f"latency p50 {np.percentile(lat, 50)*1e3:.0f} ms, "
        f"p95 {np.percentile(lat, 95)*1e3:.0f} ms, "
        f"p99 {np.percentile(lat, 99)*1e3:.0f} ms | "
        f"mean batch {mean_batch:.1f} (max seen {st['max_batch_seen']}, "
        f"{st['batches']} dispatches)"
    )


if __name__ == "__main__":
    main()
