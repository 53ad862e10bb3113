"""Preemption-safe shutdown: SIGTERM mid-training -> final checkpoint + clean
exit + resumable run. The reference has no preemption handling (a killed run
loses everything since the last epoch save, utils_train.py:140-168); on TPU
pods preemption is routine, so the trainers drain gracefully.
"""

import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_graceful_shutdown_flag_and_escalation():
    from disentangledcolorization_tpu.utils.signals import GracefulShutdown

    prev = signal.getsignal(signal.SIGTERM)
    with GracefulShutdown() as sd:
        assert not sd.requested
        os.kill(os.getpid(), signal.SIGTERM)
        # delivery is synchronous for self-signal on the main thread
        assert sd.requested
        with pytest.raises(KeyboardInterrupt):
            os.kill(os.getpid(), signal.SIGTERM)
    # handlers restored on exit
    assert signal.getsignal(signal.SIGTERM) == prev


@pytest.mark.slow
def test_sigterm_checkpoints_and_exits_cleanly(tmp_path):
    """Drive the real stage-1 trainer CLI in a subprocess, SIGTERM it once the
    first epoch is underway, and require: rc==0, a model_last checkpoint, and
    a saved epoch < --epochs (so --resume redoes the interrupted epoch)."""
    import cv2

    sys.path.insert(0, REPO_ROOT)
    import __graft_entry__ as ge

    data = tmp_path / "imgs"
    rng = np.random.default_rng(3)
    for split, count in (("train", 6), ("val", 2)):
        (data / split).mkdir(parents=True)
        for i in range(count):
            img = rng.uniform(0, 255, (32, 32, 3)).astype(np.uint8)
            cv2.imwrite(str(data / split / f"im{i}.png"), img)
    runs = tmp_path / "runs"

    proc = subprocess.Popen(
        [
            sys.executable, "-m", "disentangledcolorization_tpu.cli.train_spixel",
            "--data", str(data), "--dataset", "disco", "--save_dir", str(runs),
            "--name", "sig", "--input_size", "32", "--batch_size", "2",
            "--epochs", "500", "--num_workers", "0", "--seed", "1",
        ],
        env=ge._scrubbed_cpu_env(1),
        cwd=REPO_ROOT,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )
    log = runs / "sig" / "train.log"
    deadline = time.time() + 600
    try:
        # wait until at least one train step has run (first iter line logged)
        while time.time() < deadline:
            if log.exists() and "iter 0" in log.read_text():
                break
            time.sleep(1.0)
        else:
            raise AssertionError("trainer never reached its first step")
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=600)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert proc.returncode == 0, f"trainer exited rc={proc.returncode}:\n{out[-4000:]}"
    assert "shutdown signal received" in out

    from disentangledcolorization_tpu.train.checkpoint import CheckpointManager

    mgr = CheckpointManager(str(runs / "sig" / "checkpts"))
    assert mgr.exists("last"), "no final checkpoint written on SIGTERM"
