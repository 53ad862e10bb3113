"""Logging & observability: file+console logger, async TensorBoard, JSONL metrics.

Capability parity with the reference observability stack: python logging to
file+stdout (utils_train.py:187-198), dual train/val TensorboardX writers fed
by a background thread (util.py:29-53, train_colorizer.py:33-40), scalar names
('train/totalLoss', 'val/totalLoss', palLoss/refLoss/recLoss). Adds a JSONL
metrics stream (metrics.jsonl) and step-time / images-per-sec meters, plus
jax.profiler trace hooks (SURVEY.md section 5 tracing plan).
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time
from contextlib import contextmanager

from .io import AsyncWriter

try:
    from tensorboardX import SummaryWriter
except Exception:  # pragma: no cover
    SummaryWriter = None


def build_logger(log_dir: str, name: str = "disco") -> logging.Logger:
    os.makedirs(log_dir, exist_ok=True)
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    logger.propagate = False
    logger.handlers.clear()
    fmt = logging.Formatter("%(asctime)s %(levelname)s %(message)s")
    fh = logging.FileHandler(os.path.join(log_dir, "train.log"))
    fh.setFormatter(fmt)
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(fh)
    logger.addHandler(sh)
    return logger


class MetricsWriter:
    """Async scalar/image writer: TensorBoard (if available) + metrics.jsonl."""

    def __init__(self, log_dir: str, tag: str):
        os.makedirs(log_dir, exist_ok=True)
        self.tag = tag
        self.tb = SummaryWriter(os.path.join(log_dir, tag)) if SummaryWriter else None
        self.jsonl_path = os.path.join(log_dir, f"metrics_{tag}.jsonl")
        self.writer = AsyncWriter()

    def _write(self, name, value, step):
        if self.tb is not None:
            self.tb.add_scalar(name, value, step)
        with open(self.jsonl_path, "a") as f:
            f.write(json.dumps({"name": name, "value": float(value), "step": int(step)}) + "\n")

    def scalar(self, name: str, value, step: int):
        self.writer.submit(self._write, name, float(value), step)

    def image(self, name: str, img_hwc, step: int):
        if self.tb is not None:
            self.writer.submit(self.tb.add_image, name, img_hwc, step, dataformats="HWC")

    def flush(self):
        self.writer.flush()
        if self.tb is not None:
            self.tb.flush()


class StepTimer:
    """io/proc time-ratio meter (train_colorizer.py:134-162 equivalent)."""

    def __init__(self):
        self.data_time = 0.0
        self.step_time = 0.0
        self.images = 0
        self.durations: list[float] = []  # per-step device+dispatch seconds
        self._t = time.perf_counter()

    def mark_data(self):
        now = time.perf_counter()
        self.data_time += now - self._t
        self._t = now

    def mark_step(self, n_images: int):
        now = time.perf_counter()
        self.step_time += now - self._t
        self.durations.append(now - self._t)
        self._t = now
        self.images += n_images

    def summary(self) -> dict:
        total = self.data_time + self.step_time
        return {
            "io_proc_ratio": self.data_time / max(self.step_time, 1e-9),
            "images_per_sec": self.images / max(total, 1e-9),
        }

    def reset(self):
        self.__init__()


def steptime_stats(durations) -> dict:
    """Run-level step-time distribution (ms): p50/p99 and first-vs-last
    quartile drift, for long-run stability evidence (a soak must show the
    step time does not degrade over thousands of steps). The caller should
    exclude the compile step (the first duration of the run)."""
    import numpy as _np

    d = _np.asarray(durations, dtype=_np.float64) * 1e3
    if d.size == 0:
        return {}
    q = max(d.size // 4, 1)
    return {
        "n_steps": int(d.size),
        "p50_ms": float(_np.percentile(d, 50)),
        "p90_ms": float(_np.percentile(d, 90)),
        "p99_ms": float(_np.percentile(d, 99)),
        "first_quartile_mean_ms": float(d[:q].mean()),
        "last_quartile_mean_ms": float(d[-q:].mean()),
    }


@contextmanager
def profiler_trace(log_dir: str | None):
    """jax.profiler trace scope (enable with --trace_dir); view in TensorBoard."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
