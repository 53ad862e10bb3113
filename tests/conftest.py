"""Test configuration: force an 8-device virtual CPU mesh before jax imports.

Multi-device tests exercise the sharding paths exactly as the driver's
dryrun does (xla_force_host_platform_device_count).
"""

import os
import sys
import types

# Force CPU. The ambient environment presets JAX_PLATFORMS=axon (real TPU) and a
# sitecustomize hook imports jax at interpreter start, so jax.config already
# captured the env — os.environ edits are too late; update the config directly.
# On the TPU, default-bf16 matmuls would wreck golden-value comparisons.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags
        + " --xla_force_host_platform_device_count="
        + os.environ.get("DISCO_TEST_DEVICES", "8")
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import faulthandler  # noqa: E402
import signal  # noqa: E402

# kill -USR1 <pid> dumps all thread stacks to /tmp/pytest_faulthandler.log
faulthandler.register(signal.SIGUSR1, file=open("/tmp/pytest_faulthandler.log", "w"))

import pytest  # noqa: E402


def _stub_missing_module(name, **attrs):
    if name in sys.modules:
        return
    try:
        __import__(name)
    except ImportError:
        mod = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        parent_name = name.rsplit(".", 1)[0] if "." in name else None
        sys.modules[name] = mod
        if parent_name:
            _stub_missing_module(parent_name)
            setattr(sys.modules[parent_name], name.rsplit(".", 1)[1], mod)


@pytest.fixture(scope="session")
def reference_modules():
    """Import the read-only PyTorch reference for golden-value parity tests.

    The reference hard-codes ``.cuda()`` in several ops (e.g. poolfeat,
    basic.py:284); we monkeypatch tensor/module .cuda to the identity so the
    reference math runs on CPU torch. Missing optional deps of the reference
    (skimage, matplotlib, tqdm) are stubbed. Skips if torch or the reference
    tree is unavailable.
    """
    ref_root = "/root/reference"
    if not os.path.isdir(ref_root):
        pytest.skip("reference tree not available")
    torch = pytest.importorskip("torch")

    # identity .cuda() so reference code runs on cpu torch
    torch.Tensor.cuda = lambda self, *a, **k: self  # type: ignore[assignment]
    torch.nn.Module.cuda = lambda self, *a, **k: self  # type: ignore[assignment]

    _stub_missing_module("skimage.segmentation", mark_boundaries=lambda *a, **k: None)
    _stub_missing_module("matplotlib.pyplot")
    _stub_missing_module("tqdm", tqdm=lambda *a, **k: None)
    _stub_missing_module("torchvision")
    _stub_missing_module("torchvision.models")

    for p in (ref_root, os.path.join(ref_root, "models"), os.path.join(ref_root, "utils")):
        if p not in sys.path:
            sys.path.insert(0, p)

    import importlib

    # basic.py imports `utils.cielab`, so patch that exact module object;
    # the reference loads its gamut .npy via cwd-relative paths (cielab.py:6-7)
    ref_cielab = importlib.import_module("utils.cielab")
    ref_cielab.ABGamut.RESOURCE_POINTS = os.path.join(ref_root, "utils", "gamut_pts.npy")
    ref_cielab.ABGamut.RESOURCE_PRIOR = os.path.join(ref_root, "utils", "gamut_probs.npy")

    basic = importlib.import_module("basic")
    clusterkit = importlib.import_module("clusterkit")

    # reference ColorLabel is constructed with a cuda device (model.py:68)
    _orig_cl_init = basic.ColorLabel.__init__

    def _cpu_cl_init(self, lambda_=0.5, device="cpu"):
        _orig_cl_init(self, lambda_=lambda_, device="cpu")

    basic.ColorLabel.__init__ = _cpu_cl_init
    model = importlib.import_module("model")
    return {
        "torch": torch,
        "basic": basic,
        "clusterkit": clusterkit,
        "cielab": ref_cielab,
        "model": model,
    }
