"""One-time measurement of the PyTorch-CPU reference throughput (bench baseline).

Loads the *reference* model from /root/reference (read-only) on CPU torch with
.cuda() monkeypatched to the identity, and times the same workload bench.py
uses: batch 256x256 test-mode forward, enhanced, 8 k-means anchors.
Usage: PYTHONPATH=/root/repo python tools/bench_torch_ref.py [batch] [iters]
"""

from __future__ import annotations

import sys
import time
import types

import numpy as np
import torch

torch.Tensor.cuda = lambda self, *a, **k: self
torch.nn.Module.cuda = lambda self, *a, **k: self


def _stub(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    parent = name.rsplit(".", 1)[0] if "." in name else None
    if parent and parent not in sys.modules:
        _stub(parent)
    if parent:
        setattr(sys.modules[parent], name.rsplit(".", 1)[1], mod)


for m in ("skimage.segmentation", "matplotlib.pyplot"):
    _stub(m, mark_boundaries=None)
_stub("tqdm", tqdm=None)
_stub("torchvision")
_stub("torchvision.models")

for p in ("/root/reference", "/root/reference/models", "/root/reference/utils"):
    sys.path.insert(0, p)

import importlib

ref_cielab = importlib.import_module("utils.cielab")
ref_cielab.ABGamut.RESOURCE_POINTS = "/root/reference/utils/gamut_pts.npy"
ref_cielab.ABGamut.RESOURCE_PRIOR = "/root/reference/utils/gamut_probs.npy"

basic = importlib.import_module("basic")
# ColorLabel is constructed with a cuda device string in model.py:68
_orig_colorlabel_init = basic.ColorLabel.__init__


def _cpu_colorlabel_init(self, lambda_=0.5, device="cpu"):
    _orig_colorlabel_init(self, lambda_=lambda_, device="cpu")


basic.ColorLabel.__init__ = _cpu_colorlabel_init

model_mod = importlib.import_module("model")


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    torch.manual_seed(0)
    np.random.seed(0)
    m = model_mod.AnchorColorProb(
        inChannel=1, outChannel=313, sp_size=16, d_model=64, use_dense_pos=True,
        n_clusters=8, random_hint=False, hint2regress=False, enhanced=True, rank=0,
    )
    m.eval()
    grays = torch.rand(batch, 1, 256, 256) * 2 - 1
    colors = torch.zeros(batch, 2, 256, 256)
    with torch.no_grad():
        m(grays, colors, True, 0)  # warmup
        t0 = time.perf_counter()
        for _ in range(iters):
            m(grays, colors, True, 0)
        dt = time.perf_counter() - t0
    print(f"torch-cpu reference: {batch * iters / dt:.4f} images/sec  ({dt:.1f}s / {iters} iters, batch {batch})")


if __name__ == "__main__":
    main()
