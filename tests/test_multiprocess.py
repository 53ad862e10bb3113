"""True multi-process data parallelism: 2 OS processes, jax.distributed over
localhost, 1 CPU device each — the faithful analog of the reference's 2-GPU DDP
launch (/root/reference/scripts/train_imagenet_ddp.sh ->
torch.distributed.launch -> init_dist, utils_train.py:221-241).

The workers and a single-process control run the SAME global batch through one
colorizer train step; losses (computed over the global batch via XLA
collectives) and post-update parameter norms must agree.
"""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO_ROOT, "tests", "mp_worker.py")
RESULT_RE = re.compile(r"RESULT pid=(\d+) loss=([\d.eE+-]+) pnorm=([\d.eE+-]+)")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _launch(pid: int, nproc: int, port: int, gn: int) -> subprocess.Popen:
    sys.path.insert(0, REPO_ROOT)
    import __graft_entry__ as ge

    env = ge._scrubbed_cpu_env(1)  # 1 CPU device per process
    return subprocess.Popen(
        [sys.executable, WORKER, str(pid), str(nproc), str(port), str(gn)],
        env=env,
        cwd=REPO_ROOT,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )


def _collect(proc: subprocess.Popen):
    out, _ = proc.communicate(timeout=1200)
    assert proc.returncode == 0, f"worker failed (rc={proc.returncode}):\n{out[-4000:]}"
    m = RESULT_RE.search(out)
    assert m, f"no RESULT line in worker output:\n{out[-4000:]}"
    return int(m.group(1)), float(m.group(2)), float(m.group(3))


@pytest.mark.slow
def test_two_process_dp_step_matches_single_process():
    gn = 4  # global batch
    port = _free_port()
    # all three interpreters run concurrently (compile time dominates)
    workers = [_launch(i, 2, port, gn) for i in range(2)]
    control = _launch(0, 1, 0, gn)
    results = {}
    for p in workers:
        pid, loss, pnorm = _collect(p)
        results[pid] = (loss, pnorm)
    _, loss1, pnorm1 = _collect(control)

    # both ranks see the identical global loss (replicated output of psum-mean)
    assert results[0] == results[1], results
    # and the 2-process global-batch step equals the single-process step
    np.testing.assert_allclose(results[0][0], loss1, rtol=3e-5)
    np.testing.assert_allclose(results[0][1], pnorm1, rtol=3e-5)
