"""VGG19 feature slices for the perceptual loss, in flax (NHWC).

Capability parity with reference VGG19Loss (/root/reference/models/loss.py:138-223)
and network.VGG19 (network.py:318-352). The reference downloads torchvision's
pretrained weights; this environment has no network egress, so weights are
loaded from a converted ``.npz`` when available (tools/convert_torch.py emits
it) and the perceptual loss is gated off otherwise.

Slice sets ('liu': conv1_1..conv5_1, 'lei': conv1_2..conv5_2) and per-slice
weights match loss.py:158-173.
"""

from __future__ import annotations

import os
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import Conv

# VGG19 feature config: conv channel per layer, 'M' = maxpool
_VGG19_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M", 512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]

# feature indices (in torchvision vgg19.features numbering) where each slice ends
_SLICES = {
    "liu": [2, 7, 12, 21, 30],
    "lei": [4, 9, 14, 23, 32],
    # post-relu taps for LPIPS: relu1_2, relu2_2, relu3_4, relu4_4, relu5_4
    # (the VGG19 adaptation of LPIPS-VGG's relu taps; train/metrics.py::make_lpips)
    "lpips": [4, 9, 18, 27, 36],
}
SLICE_WEIGHTS = {
    "liu": [1.0 / 32, 1.0 / 16, 1.0 / 8, 1.0 / 4, 1.0],
    "lei": [1.0 / 2.6, 1.0 / 4.8, 1.0 / 3.7, 1.0 / 5.6, 10.0 / 1.5],
}

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class VGG19Features(nn.Module):
    """Runs the VGG19 feature stack and returns activations at slice boundaries.

    Layer numbering mirrors torchvision's ``vgg19().features`` sequential
    indices so converted weights map by index (conv layers only).
    """

    feat_type: str = "liu"

    @nn.compact
    def __call__(self, x):
        # x: (N, H, W, 3) RGB in [0, 1]
        mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
        std = jnp.asarray(IMAGENET_STD, x.dtype)
        x = (x - mean) / std
        # explicit sequential op list with torchvision indices
        ops = []
        for c in _VGG19_CFG:
            if c == "M":
                ops.append(("pool", None))
            else:
                ops.append(("conv", int(c)))
                ops.append(("relu", None))
        boundaries = set(_SLICES[self.feat_type])
        last = max(boundaries)
        outs = []
        for idx, (kind, ch) in enumerate(ops):
            if idx in boundaries:
                outs.append(x)
            if idx >= last:
                break
            if kind == "conv":
                x = Conv(ch, kernel_size=3, name=f"conv{idx}")(x)
            elif kind == "relu":
                x = nn.relu(x)
            else:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return outs


def load_vgg19_params(path: str | None = None):
    """Load converted VGG19 conv weights from .npz -> flax params dict, or None.

    The npz holds torchvision layout arrays named ``features.<i>.weight/bias``;
    conversion to HWIO happens here so the npz stays a faithful dump.
    """
    candidates = [
        path,
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "..", "checkpoints", "vgg19.npz"),
        os.path.expanduser("~/checkpoints/vgg19.npz"),
    ]
    for p in candidates:
        if p and os.path.exists(p):
            raw = np.load(p)
            params = {}
            idx = 0
            for c in _VGG19_CFG:
                if c == "M":
                    idx += 1
                    continue
                w = raw[f"features.{idx}.weight"]  # (O, I, kh, kw)
                b = raw[f"features.{idx}.bias"]
                params[f"conv{idx}"] = {
                    "conv": {
                        "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
                        "bias": jnp.asarray(b),
                    }
                }
                idx += 2  # conv + relu
            return {"params": params}
    return None
