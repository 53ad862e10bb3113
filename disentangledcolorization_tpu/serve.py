"""Production serving: dynamic request batching + a minimal HTTP front.

The reference ships no serving story (its inference entry is a one-shot CLI,
/root/reference/main/colorizer/inference.py); this module is the deployment
surface a TPU production user needs. Design:

* ``DynamicBatcher`` — the TPU-friendly serving core. Single dispatcher
  thread owns the device; requests enqueue from any thread and are grouped
  by bucket-padded shape into one ``Colorizer.colorize_batch`` dispatch of up
  to ``max_batch`` images (batch-128 is the measured v5e sweet spot under
  int8 PTQ, bench.py; bf16 knee is 56).
  Batching happens opportunistically: whatever is queued when the device
  frees up goes out together — no added latency when idle, near-peak
  throughput under load. Results return via per-request futures.

* ``ColorizeHTTPServer`` — stdlib ``ThreadingHTTPServer``:
    POST /colorize   image bytes (PNG/JPEG) -> colorized PNG
    GET  /healthz    liveness + device info + batcher stats (JSON)
  Run: ``python -m disentangledcolorization_tpu.serve --port 8712 --checkpt w.pkl``

No external web framework: zero new dependencies, and the handler work per
request (decode/encode PNG) runs in server threads while the dispatcher
thread keeps the chip busy.
"""

from __future__ import annotations

import argparse
import json
import queue
import threading
import time
from concurrent.futures import Future
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import cv2
import numpy as np

from .api import Colorizer


class QueueFullError(RuntimeError):
    """Backpressure signal: the batcher's bounded queue is at capacity."""


class DynamicBatcher:
    """Groups concurrent colorize requests into single device dispatches.

    The queue is BOUNDED (``max_queue``): when the device can't keep up,
    ``submit`` raises :class:`QueueFullError` immediately instead of letting
    latency (and host memory) grow without limit — the HTTP front maps that
    to 429 so load balancers can shed or retry elsewhere.
    """

    def __init__(
        self,
        colorizer: Colorizer,
        max_batch: int = 128,
        max_wait_ms: float = 2.0,
        max_queue: int = 512,
    ):
        self.colorizer = colorizer
        self.max_batch = max_batch
        self.max_wait_s = max_wait_ms / 1e3
        self._q: queue.Queue = queue.Queue(maxsize=max(max_queue, 1))
        self._stats = {"requests": 0, "batches": 0, "max_batch_seen": 0, "rejected": 0}
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def submit(self, image: np.ndarray) -> Future:
        """Enqueue one image; resolves to a (H, W, 3) uint8 RGB array.

        Raises :class:`QueueFullError` when the queue is at capacity.
        """
        fut: Future = Future()
        try:
            self._q.put_nowait((image, fut))
        except queue.Full:
            self._stats["rejected"] += 1
            raise QueueFullError(
                f"serving queue full ({self._q.maxsize} pending)"
            ) from None
        return fut

    def colorize(self, image: np.ndarray, timeout: float | None = None) -> np.ndarray:
        return self.submit(image).result(timeout)

    def stats(self) -> dict:
        return dict(self._stats)

    def close(self):
        self._stop.set()
        try:
            self._q.put_nowait(None)  # wake a blocked dispatcher; ok if full
        except queue.Full:
            pass
        self._thread.join(timeout=5)

    # -- dispatcher thread ----------------------------------------------------
    def _padded_shape(self, img: np.ndarray):
        b = self.colorizer.bucket
        h, w = img.shape[:2]
        return (h + (b - h % b) % b, w + (b - w % b) % b)

    def _run(self):
        pending: list = []  # carried-over items whose shape didn't match the last batch
        while not self._stop.is_set():
            items = pending
            pending = []
            if not items:
                try:
                    got = self._q.get(timeout=0.25)  # bounded wait: honor close()
                except queue.Empty:
                    continue
                if got is None:
                    break
                items = [got]
            # opportunistic drain: brief grace window lets concurrent callers
            # coalesce, then take everything already queued with the same shape
            deadline = time.monotonic() + self.max_wait_s
            while len(items) < self.max_batch:
                budget = deadline - time.monotonic()
                try:
                    got = self._q.get_nowait() if budget <= 0 else self._q.get(timeout=budget)
                except queue.Empty:
                    break
                if got is None:
                    self._stop.set()
                    break
                items.append(got)
            shape0 = self._padded_shape(items[0][0])
            batch, rest = [], []
            for it in items:
                (batch if self._padded_shape(it[0]) == shape0 else rest).append(it)
            pending = rest
            try:
                results = self.colorizer.colorize_batch([img for img, _ in batch])
                for (_, fut), rgb in zip(batch, results):
                    fut.set_result(rgb)
            except BaseException as e:  # noqa: BLE001 — deliver, don't kill the loop
                for _, fut in batch:
                    if not fut.done():
                        fut.set_exception(e)
            self._stats["requests"] += len(batch)
            self._stats["batches"] += 1
            self._stats["max_batch_seen"] = max(self._stats["max_batch_seen"], len(batch))
        for _, fut in pending:
            fut.cancel()


def make_handler(
    batcher: DynamicBatcher,
    max_body_bytes: int = 32 * 1024 * 1024,
    max_pixels: int = 4096 * 4096,
    request_timeout_s: float = 30.0,
):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet by default; stats via /healthz
            pass

        def _send(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                import jax

                info = {
                    "status": "ok",
                    "devices": [str(d) for d in jax.devices()],
                    **batcher.stats(),
                }
                self._send(200, json.dumps(info).encode(), "application/json")
            else:
                self._send(404, b"not found", "text/plain")

        def do_POST(self):
            if self.path != "/colorize":
                self._send(404, b"not found", "text/plain")
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
            except ValueError:
                self._send(400, b"bad Content-Length", "text/plain")
                return
            if n <= 0:
                self._send(400, b"empty body", "text/plain")
                return
            if n > max_body_bytes:
                self._send(413, f"payload too large (cap {max_body_bytes} bytes)".encode(), "text/plain")
                return
            raw = self.rfile.read(n)
            bgr = cv2.imdecode(np.frombuffer(raw, np.uint8), cv2.IMREAD_COLOR)
            if bgr is None:
                self._send(400, b"could not decode image", "text/plain")
                return
            if bgr.shape[0] * bgr.shape[1] > max_pixels:
                self._send(
                    413,
                    f"image too large ({bgr.shape[1]}x{bgr.shape[0]}; cap {max_pixels} px)".encode(),
                    "text/plain",
                )
                return
            try:
                rgb = batcher.colorize(
                    cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB), timeout=request_timeout_s
                )
            except QueueFullError:
                self.send_response(429)
                self.send_header("Retry-After", "1")
                body = b"server overloaded, retry later"
                self.send_header("Content-Type", "text/plain")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            except TimeoutError:
                self._send(504, f"request timed out after {request_timeout_s}s".encode(), "text/plain")
                return
            ok, png = cv2.imencode(".png", cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR))
            if not ok:
                self._send(500, b"encode failed", "text/plain")
                return
            self._send(200, png.tobytes(), "image/png")

    return Handler


def build_server(
    host: str,
    port: int,
    batcher: DynamicBatcher,
    max_body_bytes: int = 32 * 1024 * 1024,
    max_pixels: int = 4096 * 4096,
    request_timeout_s: float = 30.0,
) -> ThreadingHTTPServer:
    handler = make_handler(
        batcher,
        max_body_bytes=max_body_bytes,
        max_pixels=max_pixels,
        request_timeout_s=request_timeout_s,
    )
    return ThreadingHTTPServer((host, port), handler)


def main(argv=None):
    ap = argparse.ArgumentParser(description="DISCO-TPU colorization server")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8712)
    ap.add_argument("--checkpt", default="", help="checkpoint (.pkl or reference .pth.tar)")
    ap.add_argument("--n_clusters", type=int, default=8)
    ap.add_argument("--max_batch", type=int, default=128)
    ap.add_argument("--max_wait_ms", type=float, default=2.0)
    ap.add_argument("--max_queue", type=int, default=512,
                    help="pending-request cap; overflow -> 429")
    ap.add_argument("--max_body_bytes", type=int, default=32 * 1024 * 1024,
                    help="request payload cap; overflow -> 413")
    ap.add_argument("--max_pixels", type=int, default=4096 * 4096,
                    help="decoded image pixel cap; overflow -> 413")
    ap.add_argument("--request_timeout", type=float, default=30.0,
                    help="per-request wall budget in seconds; overrun -> 504")
    ap.add_argument(
        "--warmup", default="1,8,56,128",
        help="comma-separated 256x256 batch buckets to pre-compile ('' to skip)",
    )
    ap.add_argument(
        "--data_parallel", action="store_true",
        help="shard request batches over all local devices (v5e-8 serving)",
    )
    ap.add_argument(
        "--wire", default="uint8", choices=["uint8", "float32"],
        help="device->host transfer format for the predicted ab channels; "
        "uint8 (default) quarters the transfer at <=0.43 ab-unit cost — the "
        "same quantization cv2's 8-bit Lab I/O applies",
    )
    ap.add_argument(
        "--quantize", default="none", choices=["none", "int8", "int8_safe"],
        help="int8 PTQ on the wide convs (+84%% device throughput, v5e b128); "
        "int8_safe keeps the anchor trunk bf16 (+39%%) so the palette choice "
        "is stable across quantization — the right default for interactive "
        "hint serving on anchor-ambiguous checkpoints (docs/STATUS.md)",
    )
    args = ap.parse_args(argv)
    colorizer = Colorizer(
        checkpoint=args.checkpt,
        n_clusters=args.n_clusters,
        data_parallel=args.data_parallel,
        wire_dtype=args.wire,
        quantize=args.quantize,
    )
    if args.warmup:
        buckets = [int(b) for b in args.warmup.split(",")]
        print(f"warming up batch buckets {buckets} ...")
        colorizer.warmup(buckets=buckets)
    batcher = DynamicBatcher(
        colorizer, max_batch=args.max_batch, max_wait_ms=args.max_wait_ms
    )
    srv = build_server(args.host, args.port, batcher)
    print(f"serving on http://{args.host}:{args.port}  (POST /colorize, GET /healthz)")
    try:
        srv.serve_forever()
    finally:
        batcher.close()


if __name__ == "__main__":
    main()
