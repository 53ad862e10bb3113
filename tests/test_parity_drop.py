"""The weights-drop runbook (tools/parity_drop.py) exercised end-to-end with a
random-weight stand-in .pth.tar, so the only untested step of a real drop
(reference checkpoints/disco_download.sh artifacts) is the download itself.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_reference_subprocess_path_still_executes():
    """Fast bit-rot guard (runs in every CI pass, no `slow` mark): the
    runbook's reference-subprocess leg — sys.path stubbing, missing-dep
    shims, CPU monkeypatches, reference model construction — must keep
    executing against the CURRENT /root/reference checkout, so the runbook
    is ready the moment a weights drop lands (VERDICT r3 Next #8)."""
    pytest.importorskip("torch")
    if not os.path.isdir("/root/reference"):
        pytest.skip("reference tree not available")

    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    code = (
        "import sys; sys.path.insert(0, {repo!r}); "
        "from tools.parity_drop import _import_reference_model as f; "
        "m = f(4); "
        "n = sum(p.numel() for p in m.parameters()); "
        "assert n > 30_000_000, n; "  # the full 43M-param reference model
        "print('ref model ok', n)"
    ).format(repo=REPO)
    proc = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "ref model ok" in proc.stdout


@pytest.mark.slow
def test_parity_drop_runbook(tmp_path):
    pytest.importorskip("torch")
    if not os.path.isdir("/root/reference"):
        pytest.skip("reference tree not available")

    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")

    pth = str(tmp_path / "standin.pth.tar")
    code = (
        "import sys; sys.path.insert(0, {repo!r}); "
        "from tools.parity_drop import make_standin_pth as f; f({pth!r}, 4)"
    ).format(repo=REPO, pth=pth)
    subprocess.run([sys.executable, "-c", code], check=True, cwd=REPO, env=env)
    assert os.path.getsize(pth) > 1_000_000  # real checkpoint-sized artifact

    out = str(tmp_path / "PARITY_WEIGHTS.json")
    proc = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "tools", "parity_drop.py"),
            "--pth", pth, "--size", "64", "--n_clusters", "4",
            "--out", out, "--skip_eval",
        ],
        cwd=REPO, env=env, capture_output=True, text=True,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    artifact = json.load(open(out))
    assert artifact["parity_ok"] is True
    assert artifact["state_dict_missing_keys"] == []
    # every output surface compared, thresholds recorded
    for k in ("affinity", "pal_logit", "ref_logit", "pred_colors"):
        assert artifact["pixel_parity_vs_torch_reference"][k]["max_abs"] <= artifact["parity_thresholds"][k]
