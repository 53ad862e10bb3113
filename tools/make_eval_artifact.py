"""Produce the per-round quality artifact (EVAL_r0N.json): the full BASELINE
config #5 pipeline, end-to-end, on the 4 COCO images bundled with the
reference (/root/reference/data/*.jpg).

Chain exercised:
  1. random-init PyTorch *reference* model (seed 0) -> state_dict ->
     tools/convert_torch.py converter -> flax variables  (the exact path real
     published DISCO weights will take the moment a weights drop arrives),
  2. cli/infer.py colorization of the 4 images (256x256 resize mode),
  3. cli/evaluate.py PSNR/SSIM/colorfulness/FID of outputs vs originals.

With random weights the colors are meaningless — the artifact proves the
pipeline, not the quality; swap --checkpt for real weights to produce the
reportable number (reference quality target: COCO FID 10.47, README.md:60).

Usage: python tools/make_eval_artifact.py [--round N] [--out EVAL_rN.json]
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"


def make_converted_random_reference_weights(out_pkl: str, n_clusters: int = 8) -> None:
    """Random reference AnchorColorProb -> converter -> flax variables pickle."""
    import types

    import torch

    # the reference hard-codes .cuda() in several places; shim to identity
    torch.Tensor.cuda = lambda self, *a, **k: self  # type: ignore[assignment]
    torch.nn.Module.cuda = lambda self, *a, **k: self  # type: ignore[assignment]

    # stub optional reference deps absent from this env (same shims as
    # tests/conftest.py::reference_modules)
    def _stub(name, **attrs):
        if name in sys.modules:
            return
        try:
            __import__(name)
        except ImportError:
            mod = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(mod, k, v)
            sys.modules[name] = mod
            if "." in name:
                parent = name.rsplit(".", 1)[0]
                _stub(parent)
                setattr(sys.modules[parent], name.rsplit(".", 1)[1], mod)

    _stub("skimage.segmentation", mark_boundaries=lambda *a, **k: None)
    _stub("matplotlib.pyplot")
    _stub("tqdm", tqdm=lambda *a, **k: None)
    _stub("torchvision")
    _stub("torchvision.models")
    for p in (REF, os.path.join(REF, "models"), os.path.join(REF, "utils")):
        if p not in sys.path:
            sys.path.insert(0, p)
    import importlib

    ref_cielab = importlib.import_module("utils.cielab")
    ref_cielab.ABGamut.RESOURCE_POINTS = os.path.join(REF, "utils", "gamut_pts.npy")
    ref_cielab.ABGamut.RESOURCE_PRIOR = os.path.join(REF, "utils", "gamut_probs.npy")
    basic = importlib.import_module("basic")
    _orig = basic.ColorLabel.__init__
    basic.ColorLabel.__init__ = lambda self, lambda_=0.5, device="cpu": _orig(
        self, lambda_=lambda_, device="cpu"
    )
    model_mod = importlib.import_module("model")

    torch.manual_seed(0)
    m = model_mod.AnchorColorProb(
        inChannel=1, outChannel=313, sp_size=16, d_model=64, use_dense_pos=True,
        n_clusters=n_clusters, random_hint=False, hint2regress=False,
        enhanced=True, rank=0,
    )
    # converge the spectral-norm u/v estimates: freshly initialized torch SN
    # stores a RANDOM u, so sigma is underestimated and folding w/sigma yields
    # weights with spectral norm >> 1 — the 23-conv repnet then blows up to
    # ~1e33 and the token LayerNorm overflows f32 to NaN (observed: all-white
    # PNGs). One train-mode forward per power iteration converges u/v the same
    # way real training would (trained checkpoints ship converged u).
    m.train()
    with torch.no_grad():
        g32 = torch.randn(1, 1, 32, 32)
        f64 = torch.randn(1, 64, 32, 32)
        for _ in range(30):
            m.repnet(g32)
            m.enhanceNet(torch.cat([g32, f64], 1))
    m.eval()
    sd = {k: v.detach().cpu().numpy() for k, v in m.state_dict().items()}

    from disentangledcolorization_tpu.tools import convert_torch as cvt

    variables = cvt.convert_disco_state_dict(sd, enhanced=True, sn_folded=True)
    with open(out_pkl, "wb") as f:
        pickle.dump(variables, f)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=0)
    ap.add_argument("--out", type=str, default="")
    ap.add_argument("--data", type=str, default=os.path.join(REF, "data"))
    ap.add_argument("--n_clusters", type=int, default=8)
    ap.add_argument(
        "--checkpt", type=str, default="",
        help="trained/converted weights (pkl, .pth.tar, or Orbax run dir); "
        "default = random reference weights through the converter (pipeline proof)",
    )
    ap.add_argument(
        "--save_images", type=str, default="",
        help="also copy the f32 output PNGs to this directory (committed evidence)",
    )
    args = ap.parse_args(argv)
    out_path = args.out or os.path.join(
        REPO, f"EVAL_r{args.round:02d}.json" if args.round else "EVAL.json"
    )

    t0 = time.time()
    with tempfile.TemporaryDirectory() as td:
        if args.checkpt:
            ckpt = args.checkpt
        else:
            ckpt = os.path.join(td, "disco_rand_converted.pkl")
            # converter runs in a subprocess so reference sys.path hacking
            # cannot leak into this interpreter
            code = (
                "import sys; sys.path.insert(0, {repo!r}); "
                "from tools.make_eval_artifact import make_converted_random_reference_weights as f; "
                "f({ckpt!r}, {k})"
            ).format(repo=REPO, ckpt=ckpt, k=args.n_clusters)
            subprocess.run([sys.executable, "-c", code], check=True, cwd=REPO)

        infer_cmd = [
            sys.executable, "-m", "disentangledcolorization_tpu.cli.infer",
            "--data", args.data, "--checkpt", ckpt, "--save_dir", td,
            "--name", "eval", "--seed", "130", "--n_clusters", str(args.n_clusters),
            "--batch_size", "4",
        ]
        subprocess.run(infer_cmd, check=True, cwd=REPO)
        pred_dir = os.path.join(td, f"eval-anchor{args.n_clusters}")
        if args.save_images:
            import shutil

            os.makedirs(args.save_images, exist_ok=True)
            for f in sorted(os.listdir(pred_dir)):
                shutil.copy(os.path.join(pred_dir, f), os.path.join(args.save_images, f))

        eval_out = subprocess.run(
            [
                sys.executable, "-m", "disentangledcolorization_tpu.cli.evaluate",
                "--pred", pred_dir, "--gt", args.data, "--batch", "4", "--fid",
            ],
            check=True, cwd=REPO, capture_output=True, text=True,
        )
        metrics = json.loads(eval_out.stdout.strip().splitlines()[-1])
        # A randproj-extractor FID over 4 images is a directional pipeline
        # check, NOT the BASELINE InceptionV3 FID target (10.47-class) — name
        # the key so the two can never be confused (round-3 verdict Weak #3).
        if metrics.get("extractor", "").startswith("randproj") and "fid" in metrics:
            metrics[f"randproj_fid_n{metrics.get('n', '')}"] = metrics.pop("fid")

        # int8 drift: re-run the same inference with the production PTQ paths
        # and score their outputs AGAINST the f32 outputs — the per-round
        # record of what quantization costs. Both modes are recorded since
        # round 5: 'int8' (bench.py's headline config) and 'int8_safe'
        # (repnet excluded — palette-stable on anchor-ambiguous checkpoints,
        # ops/quant.py::excluded).
        def _drift(mode: str) -> dict:
            q_dir = os.path.join(td, mode)
            q_cmd = list(infer_cmd) + ["--quantize", mode]
            q_cmd[q_cmd.index("--save_dir") + 1] = q_dir
            subprocess.run(q_cmd, check=True, cwd=REPO)
            q_pred = os.path.join(q_dir, f"eval-anchor{args.n_clusters}")
            out = subprocess.run(
                [
                    sys.executable, "-m", "disentangledcolorization_tpu.cli.evaluate",
                    "--pred", q_pred, "--gt", pred_dir, "--batch", "4",
                ],
                check=True, cwd=REPO, capture_output=True, text=True,
            )
            return json.loads(out.stdout.strip().splitlines()[-1])

        int8_drift = _drift("int8")
        int8_safe_drift = _drift("int8_safe")

    def _pack_drift(d: dict) -> dict:
        d = dict(d)
        # colorfulness is an absolute statistic, not a similarity score —
        # record the vs-f32 *delta* so the block only contains drift measures
        if "colorfulness" in d and "colorfulness" in metrics:
            d["colorfulness_delta"] = round(d.pop("colorfulness") - metrics["colorfulness"], 4)
        return d

    drift = _pack_drift(int8_drift)
    safe_drift = _pack_drift(int8_safe_drift)

    artifact = {
        "round": args.round,
        "pipeline": (
            ("trained-checkpoint" if args.checkpt else "random-reference-weights -> convert_torch")
            + " -> cli.infer -> cli.evaluate"
        ),
        "images": sorted(os.listdir(args.data)),
        "weights": (
            f"trained: {args.checkpt}" if args.checkpt
            else "reference AnchorColorProb random init (torch.manual_seed(0)), converted"
        ),
        "note": (
            "metrics from a trained checkpoint (PSNR/SSIM/colorfulness vs GT "
            "are real quality movements; FID on 4 images is directionally "
            "indicative only)"
            if args.checkpt
            else "pipeline-proof artifact: random weights, so FID/PSNR are not "
            "quality claims; identical commands with a real checkpoint "
            "produce the reportable number (target FID 10.47, BASELINE.md)"
        ),
        "metrics": metrics,
        "int8_drift_vs_f32": {
            "note": "production PTQ outputs scored against the f32 outputs "
                    "(same seed/weights); PSNR/SSIM here measure quantization "
                    "cost only. On anchor-ambiguous (chroma-jitter-trained) "
                    "checkpoints low values reflect a discrete PALETTE FLIP "
                    "(a different valid colorization), not degradation — see "
                    "int8_safe_drift_vs_f32 and docs/STATUS.md round-5",
            **drift,
        },
        "int8_safe_drift_vs_f32": {
            "note": "--quantize int8_safe (repnet excluded, palette-stable; "
                    "ops/quant.py::excluded) scored against the f32 outputs",
            **safe_drift,
        },
        "wall_seconds": round(time.time() - t0, 1),
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=2)
        f.write("\n")
    print(json.dumps(artifact))


if __name__ == "__main__":
    main()
