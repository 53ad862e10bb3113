"""CLI end-to-end tests (CPU, tiny inputs): inference main() in all modes."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_imgs(tmp_path_factory):
    import cv2

    d = tmp_path_factory.mktemp("tiny")
    rng = np.random.default_rng(0)
    for i in range(2):
        img = rng.uniform(0, 255, (48, 40, 3)).astype(np.uint8)
        cv2.imwrite(str(d / f"im{i}.jpg"), img)
    return str(d)


def _run_infer(tmp_path, tiny_imgs, extra):
    from disentangledcolorization_tpu.cli import infer

    out = str(tmp_path / "out")
    argv = [
        "--data", tiny_imgs, "--name", out, "--seed", "7",
        "--n_clusters", "2", "--batch_size", "2",
    ] + extra
    cwd = os.getcwd()
    infer.main(argv)
    return f"{out}-anchor2"


def test_infer_cli_resize_mode(tmp_path, tiny_imgs, monkeypatch):
    # shrink the compile: resize path uses 256x256; patch fetch to 64
    from disentangledcolorization_tpu.utils import io as io_lib

    orig = io_lib.fetch_image_lab
    monkeypatch.setattr(
        io_lib, "fetch_image_lab",
        lambda p, no_resize=True, scale=16, resize_to=256: orig(p, no_resize, scale, 64),
    )
    d = _run_infer(tmp_path, tiny_imgs, [])
    files = sorted(os.listdir(d))
    assert files == ["im0.png", "im1.png"]


def test_infer_cli_save_guided(tmp_path, tiny_imgs):
    """--save_guided writes the pre-enhancement colorization (reference
    inference.py:111-115 computes it but never saves it)."""
    d = _run_infer(tmp_path, tiny_imgs, ["--no_resize", "--save_guided"])
    files = sorted(os.listdir(d))
    assert files == ["im0-guided.png", "im0.png", "im1-guided.png", "im1.png"]
    import cv2

    g = cv2.imread(os.path.join(d, "im0-guided.png"))
    e = cv2.imread(os.path.join(d, "im0.png"))
    assert g.shape == (48, 40, 3) == e.shape
    assert (g != e).any()  # guided (token-level) differs from enhanced output


def test_infer_cli_no_resize_and_diverse(tmp_path, tiny_imgs):
    d = _run_infer(tmp_path, tiny_imgs, ["--no_resize", "--diverse", "--bucket", "16"])
    files = sorted(os.listdir(d))
    assert files == [
        "im0-c0.png", "im0-c1.png", "im0-c2.png",
        "im1-c0.png", "im1-c1.png", "im1-c2.png",
    ]
    # original (non-padded) sizes restored
    import cv2

    img = cv2.imread(os.path.join(d, "im0-c0.png"))
    assert img.shape[:2] == (48, 40)


def test_infer_cli_quantize_int8(tmp_path, tiny_imgs):
    """--quantize int8: first-batch calibration then static int8 convs; output
    PNGs land as usual and stay close to the f32 run (ops/quant.py)."""
    import cv2

    d_ref = _run_infer(tmp_path / "a", tiny_imgs, ["--no_resize"])
    d_q = _run_infer(tmp_path / "b", tiny_imgs, ["--no_resize", "--quantize", "int8"])
    assert os.environ.get("DISCO_INT8") == "static"  # calibration engaged
    os.environ.pop("DISCO_INT8", None)
    for name in ("im0.png", "im1.png"):
        ref = cv2.imread(os.path.join(d_ref, name)).astype(np.int16)
        q = cv2.imread(os.path.join(d_q, name)).astype(np.int16)
        assert q.shape == ref.shape
        # int8 PTQ on random weights: small per-pixel drift, same image
        assert np.abs(ref - q).mean() < 16.0, name


def test_infer_cli_shard_spatial_matches_replicated(tmp_path, tiny_imgs):
    """--shard_spatial (H-axis GSPMD sharding for huge no_resize inputs) must
    reproduce the single-device output up to fp reduce-order noise."""
    import cv2

    d_ref = _run_infer(tmp_path / "a", tiny_imgs, ["--no_resize"])
    d_sh = _run_infer(tmp_path / "b", tiny_imgs, ["--no_resize", "--shard_spatial"])
    for name in ("im0.png", "im1.png"):
        ref = cv2.imread(os.path.join(d_ref, name)).astype(np.int16)
        sh = cv2.imread(os.path.join(d_sh, name)).astype(np.int16)
        assert np.abs(ref - sh).max() <= 1, name


def test_infer_spixel_cli(tmp_path, tiny_imgs, monkeypatch):
    from disentangledcolorization_tpu.cli import infer_spixel

    os.chdir(tmp_path)
    infer_spixel.main(["--data", tiny_imgs, "--name", "sp", "--input_size", "32"])
    files = sorted(os.listdir(tmp_path / "sp-s16"))
    assert "im0-spix.png" in files and "im0-recon.png" in files


def test_evaluate_cli(tmp_path, tiny_imgs, capsys):
    import json

    from disentangledcolorization_tpu.cli import evaluate

    evaluate.main(
        ["--pred", tiny_imgs, "--gt", tiny_imgs, "--batch", "2", "--fid", "--lpips", "--is_score"]
    )
    out = capsys.readouterr().out.strip().splitlines()[-1]
    res = json.loads(out)
    assert res["n"] == 2
    assert res["psnr"] > 60  # identical dirs
    assert abs(res["ssim"] - 1.0) < 1e-3
    assert res["fid"] < 1e-3
    assert res["lpips"] < 1e-6  # identical dirs
    assert res["lpips_extractor"].startswith("lpips-vgg19")
    assert res["is_mean"] > 0 and res["is_extractor"].startswith("inception-v3")


def test_colorizer_api(tiny_imgs):
    import cv2

    from disentangledcolorization_tpu.api import Colorizer

    c = Colorizer(n_clusters=2, bucket=16)
    img = cv2.cvtColor(cv2.imread(os.path.join(tiny_imgs, "im0.jpg")), cv2.COLOR_BGR2RGB)
    out = c.colorize(img)
    assert out.shape == img.shape and out.dtype == np.uint8
    # grayscale input
    out2 = c.colorize(img[..., 0])
    assert out2.shape == img.shape
    # diverse
    outs = c.colorize(img, diverse=True)
    assert len(outs) == 3 and outs[0].shape == img.shape
    # hints on the token grid
    hc, wc = 48 // 16, 48 // 16
    mask = np.zeros((hc, wc), np.float32)
    mask[1, 1] = 1
    ab = np.zeros((hc, wc, 2), np.float32)
    ab[1, 1] = (0.4, -0.3)
    out3 = c.colorize(img, hints=(mask, ab))
    assert out3.shape == img.shape
    # hint colors must REACH the hintpath: same key, different anchor ab ->
    # different colorization (the override feeds the hintpath one-hot,
    # disco.py anchor_colors_override). This is a MECHANISM test under
    # random weights, so it pins the model seed and asserts only that the
    # hint value changes the output — including inside the hinted 16x16
    # block itself — with a threshold far below any plausible effect size
    # (round-3 advisor: the old mean > 0.5 was flakiness-prone across
    # platforms/BLAS). SEMANTIC steering (output moves TOWARD the hint
    # color) is asserted on trained weights in the evidence chain
    # (tools/make_capability_evidence.py::region_mean_ab).
    import jax

    cs = Colorizer(n_clusters=2, bucket=16, seed=11)
    k = jax.random.key(7)
    ab2 = np.zeros_like(ab)
    ab2[1, 1] = (-0.5, 0.45)
    s1 = cs.colorize(img, hints=(mask, ab), key=k).astype(int)
    s2 = cs.colorize(img, hints=(mask, ab2), key=k).astype(int)
    diff = np.abs(s1 - s2)
    assert diff.mean() > 0.02, "hint colors did not reach the hintpath"
    assert diff[16:32, 16:32].max() > 0, "hinted block unaffected by its own hint"


def test_colorizer_anchor_mask(tiny_imgs):
    """Colorizer.anchor_mask exposes the model's own k-means anchor
    positions on the token grid (reference affordance: mark_color_hints
    painting, basic.py:107-117) — one anchor per cluster, usable as the
    mask input of colorize(hints=...)."""
    import cv2
    import jax

    from disentangledcolorization_tpu.api import Colorizer

    c = Colorizer(n_clusters=2, bucket=16, seed=3)
    img = cv2.cvtColor(cv2.imread(os.path.join(tiny_imgs, "im0.jpg")), cv2.COLOR_BGR2RGB)
    mask = c.anchor_mask(img, key=jax.random.key(5))
    hc, wc = 48 // 16, 48 // 16
    assert mask.shape == (hc, wc)
    assert set(np.unique(mask)).issubset({0.0, 1.0})
    assert mask.sum() == 2  # one representative token per cluster
    # the mask is directly consumable as the hints mask
    ab = np.zeros((hc, wc, 2), np.float32)
    ab[mask > 0.5] = (0.3, -0.4)
    out = c.colorize(img, hints=(mask, ab), key=jax.random.key(5))
    assert out.shape == img.shape and out.dtype == np.uint8


def test_colorizer_api_quantize(tiny_imgs):
    """Colorizer(quantize='int8') calibrates on the first call and keeps
    producing images close to the f32 path."""
    import cv2

    from disentangledcolorization_tpu.api import Colorizer

    img = cv2.cvtColor(cv2.imread(os.path.join(tiny_imgs, "im0.jpg")), cv2.COLOR_BGR2RGB)
    try:
        ref = Colorizer(n_clusters=2, compute_dtype="float32", seed=3).colorize(img)
        c = Colorizer(n_clusters=2, compute_dtype="float32", seed=3, quantize="int8")
        out = c.colorize(img)
        assert c._calibrated and os.environ.get("DISCO_INT8") == "static"
        assert out.shape == img.shape and out.dtype == np.uint8
        assert np.abs(ref.astype(np.int16) - out.astype(np.int16)).mean() < 16.0
    finally:
        os.environ.pop("DISCO_INT8", None)


def test_reference_flag_aliases():
    """Reference trainer flag spellings parse as aliases (utils_argument.py:5-87)."""
    from disentangledcolorization_tpu.train.optim import build_schedule
    from disentangledcolorization_tpu.utils import config

    p = config.pcolor_argparser()
    a = p.parse_args(
        ["--optim", "sgd", "--workers", "2", "--exp_name", "foo", "--data_dir", "/tmp/x",
         "--input_dim", "224", "--decay_ratio", "0.01", "--scheduler", "linear",
         "--colorfulness", "0.2"]
    )
    assert a.optimizer == "sgd" and a.num_workers == 2 and a.name == "foo"
    assert a.data == "/tmp/x" and a.input_size == 224
    assert a.lr_decay_ratio == 0.01 and a.scheduler == "linear"
    assert a.colorfulness == 0.2
    sched = build_schedule("linear", 2e-4, 60, 100, a.lr_decay_ratio)
    assert abs(float(sched(0)) - 2e-4) < 1e-9


def test_infer_cli_quantize_int8_safe(tmp_path, tiny_imgs):
    """--quantize int8_safe: identical machinery to int8 but repnet (the
    anchor-feature trunk) stays on the exact path via DISCO_INT8_EXCLUDE —
    the palette-stable mode (ops/quant.py::excluded; measured 32.8 dB vs
    21.0 dB int8-vs-f32 drift on the round-5 jitter checkpoint)."""
    import cv2

    d_ref = _run_infer(tmp_path / "a", tiny_imgs, ["--no_resize"])
    d_q = _run_infer(
        tmp_path / "b", tiny_imgs, ["--no_resize", "--quantize", "int8_safe"]
    )
    try:
        assert os.environ.get("DISCO_INT8") == "static"
        assert os.environ.get("DISCO_INT8_EXCLUDE") == "repnet"
        for name in ("im0.png", "im1.png"):
            ref = cv2.imread(os.path.join(d_ref, name)).astype(np.int16)
            q = cv2.imread(os.path.join(d_q, name)).astype(np.int16)
            assert q.shape == ref.shape
            assert np.abs(ref - q).mean() < 16.0, name
    finally:
        os.environ.pop("DISCO_INT8", None)
        os.environ.pop("DISCO_INT8_EXCLUDE", None)


def test_serve_cli_accepts_int8_safe():
    """serve.py exposes --quantize {none,int8,int8_safe} (round-5)."""
    import argparse

    from disentangledcolorization_tpu import serve

    # pull the parser out of main() without starting a server: parse_known
    # via a trial parse of just the flag against a fresh parser is not
    # accessible, so assert on the argparse wiring through a dry parse
    import inspect

    src = inspect.getsource(serve.main)
    assert '"--quantize"' in src and '"int8_safe"' in src
