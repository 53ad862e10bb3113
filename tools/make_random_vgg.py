#!/usr/bin/env python3
"""Emit a frozen random-init VGG19 ``features.*`` npz (torchvision layout).

Purpose (round-4 verdict Next #3): the paper's training objective includes a
VGG19 perceptual term (/root/reference/models/loss.py:78-84,138-223). The
pretrained torchvision values are egress-blocked in this environment, but the
*graph* — compile + backward through the 16-conv VGG feature stack — can and
must be exercised on the TPU so the true training throughput of the faithful
objective is a measurement, not an estimate. A frozen random-init VGG is a
perfectly valid stand-in for that purpose: identical shapes, identical FLOPs,
identical memory traffic; only the feature semantics differ. (Random VGG
features are still a meaningful perceptual-style loss — random-weight VGG
metrics are an established baseline — but we make no quality claim here.)

The npz matches what tools/convert_torch.py::convert_vgg19_torchvision emits
from a real torchvision checkpoint: ``features.<i>.weight`` (O,I,3,3) and
``features.<i>.bias`` (O,) for every conv index in the VGG19 feature stack,
so models/vgg.py::load_vgg19_params consumes it unchanged and the real
weights drop-in replaces it with zero code changes.

Init: Kaiming-normal fan_in on weights (what torchvision uses for fresh
convs), zero bias. Seeded, deterministic.

Usage: python tools/make_random_vgg.py [--out checkpoints/vgg19_random.npz] [--seed 0]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from disentangledcolorization_tpu.models.vgg import _VGG19_CFG  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="checkpoints/vgg19_random.npz")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    rng = np.random.default_rng(args.seed)
    arrays = {}
    idx, in_ch = 0, 3
    for c in _VGG19_CFG:
        if c == "M":
            idx += 1
            continue
        fan_in = in_ch * 3 * 3
        std = float(np.sqrt(2.0 / fan_in))
        arrays[f"features.{idx}.weight"] = rng.normal(
            0.0, std, size=(c, in_ch, 3, 3)
        ).astype(np.float32)
        arrays[f"features.{idx}.bias"] = np.zeros((c,), np.float32)
        in_ch = c
        idx += 2  # conv + relu share the torchvision numbering

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    np.savez(args.out, **arrays)
    n_params = sum(a.size for a in arrays.values())
    print(f"wrote {args.out}: {len(arrays)//2} convs, {n_params/1e6:.1f}M params, seed {args.seed}")


if __name__ == "__main__":
    main()
