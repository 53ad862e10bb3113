"""Unit tests for bench.py's round-5 budget discipline (BENCH_r04 rc=124 fix).

Covers the host-side logic only (deadline shedding, progress lines, batch
override) — the TPU measurement itself is driven by `python bench.py` on the
real chip (see .claude/skills/verify/SKILL.md).
"""

import importlib
import os
import sys
import time

import pytest

# Never let the test process write compile-cache entries into the committed
# .jax_cache (bench.py points jit there at import time unless this is set).
os.environ["DISCO_BENCH_NO_CACHE"] = "1"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402


def test_timed_returns_best_of_repeats(monkeypatch):
    monkeypatch.setattr(bench, "_T0", time.monotonic())  # fresh budget
    calls = []

    def fn():
        calls.append(1)
        return 0.0

    bench._timed(fn, repeat=3)
    assert len(calls) == 3


def test_timed_sheds_repeats_past_deadline(monkeypatch, capsys):
    # pretend the run started long ago: elapsed >> 0.85 * DEADLINE_S
    monkeypatch.setattr(bench, "_T0", time.monotonic() - bench.DEADLINE_S)
    calls = []

    def fn():
        calls.append(1)
        return 0.0

    bench._timed(fn, repeat=3)
    # first repeat always runs (a number must come out); the rest are shed
    assert len(calls) == 2  # i=0 unconditional, i=1 runs then triggers the check
    assert "deadline near" in capsys.readouterr().err


def test_progress_lines_carry_elapsed_prefix(capsys):
    bench._progress("unit-test phase")
    err = capsys.readouterr().err
    assert err.startswith("# [t+") and "unit-test phase" in err


def test_batch_env_override(monkeypatch):
    monkeypatch.setenv("DISCO_BENCH_BATCH", "32")
    mod = importlib.reload(bench)
    try:
        assert mod.BATCH == 32
    finally:
        monkeypatch.delenv("DISCO_BENCH_BATCH")
        assert importlib.reload(bench).BATCH == 128


def test_mfu_guard_still_present():
    # the honesty check must never be dropped in a refactor
    src = open(bench.__file__).read()
    assert "not physically credible" in src
