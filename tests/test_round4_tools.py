"""Round-4 tooling tests: soak instrumentation and the anchor-conditioning
data recipe.

The chroma-jitter invariant is the load-bearing one: the recipe defeats
gray->color memorization (VERDICT r3 Next #2) only if the jittered variants
present the SAME grayscale input with DIFFERENT ground-truth chroma.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


def test_steptime_stats_percentiles():
    from disentangledcolorization_tpu.utils.logging import steptime_stats

    # seconds in; ms out. 100 steps ramping 10ms -> 10.99ms
    durs = [0.010 + 0.00001 * i for i in range(100)]
    s = steptime_stats(durs)
    assert s["n_steps"] == 100
    assert 10.4 < s["p50_ms"] < 10.6
    assert s["p99_ms"] <= 11.0
    assert s["first_quartile_mean_ms"] < s["last_quartile_mean_ms"]
    assert steptime_stats([]) == {}


def test_chroma_jitter_preserves_gray_changes_color():
    from tools.make_overfit_data import chroma_jitter

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    # smooth it so it looks image-like (reduces extreme out-of-gamut pixels)
    img = cv2.GaussianBlur(img, (7, 7), 0)

    out = chroma_jitter(img, np.random.default_rng(5))
    lab_in = cv2.cvtColor(img, cv2.COLOR_BGR2LAB).astype(np.int16)
    lab_out = cv2.cvtColor(out, cv2.COLOR_BGR2LAB).astype(np.int16)

    # L (the model input) survives the round trip; ab (the training target)
    # moves by a lot. L tolerance is for uint8 Lab<->BGR round-trip + sRGB
    # gamut clipping, not for any intended L change.
    dl = np.abs(lab_in[..., 0] - lab_out[..., 0])
    dab = np.abs(lab_in[..., 1:] - lab_out[..., 1:])
    assert float(dl.mean()) < 1.5, "chroma jitter leaked into the L channel"
    assert float(dab.mean()) > 5.0, "chroma jitter did not change the colors"

    # rotation angle excludes near-identity: two different seeds give two
    # genuinely different colorizations of the same gray content
    out2 = chroma_jitter(img, np.random.default_rng(6))
    lab_out2 = cv2.cvtColor(out2, cv2.COLOR_BGR2LAB).astype(np.int16)
    assert float(np.abs(lab_out[..., 1:] - lab_out2[..., 1:]).mean()) > 5.0


def test_make_random_vgg_torchvision_layout(tmp_path):
    from tools.make_random_vgg import main as make_vgg

    out = tmp_path / "vgg19_random.npz"
    make_vgg(["--out", str(out), "--seed", "0"])
    z = np.load(out)
    # torchvision VGG19 features: conv indices 0,2,5,7,10,... first conv is
    # 64x3x3x3 (OIHW). The loss loader consumes exactly this layout
    # (tools/convert_torch.py::convert_vgg19_torchvision docstring).
    assert z["features.0.weight"].shape == (64, 3, 3, 3)
    assert z["features.0.bias"].shape == (64,)
    # all 16 convs of VGG19 present
    conv_keys = [k for k in z.files if k.endswith(".weight")]
    assert len(conv_keys) == 16, sorted(z.files)
    # deterministic for a fixed seed (drop-in reproducibility)
    out2 = tmp_path / "vgg19_random2.npz"
    make_vgg(["--out", str(out2), "--seed", "0"])
    z2 = np.load(out2)
    assert np.array_equal(z["features.0.weight"], z2["features.0.weight"])


def test_bench_no_resize_corpus(tmp_path, monkeypatch):
    """The no_resize bench's corpus builder: synthesizes the 3 native shape
    buckets when the reference data dir is absent (with a loud warning) and
    writes repeats x 4 distinct files."""
    import tools.bench_no_resize as bnr

    monkeypatch.setattr(bnr, "REF_DATA", str(tmp_path / "nope"))
    out = tmp_path / "corpus"
    out.mkdir()
    n = bnr.build_corpus(str(out), repeats=2)
    files = sorted(out.iterdir())
    assert n == 8 and len(files) == 8
    shapes = {cv2.imread(str(f)).shape[:2] for f in files}
    assert shapes == {(612, 612), (480, 640), (640, 480)}


def test_bench_no_resize_cli_leg_runs(tmp_path, monkeypatch):
    """End-to-end smoke of the tool's CLI leg (round-5 regression guard: the
    round-4 version was missing the repo-root sys.path insert, so run_cli had
    never actually executed). Tiny images via REF_DATA keep it CPU-cheap."""
    import json
    import sys

    import numpy as np

    import tools.bench_no_resize as bnr

    rng = np.random.default_rng(0)
    data = tmp_path / "tiny"
    data.mkdir()
    for i, (h, w) in enumerate([(24, 28), (32, 24)]):
        cv2.imwrite(
            str(data / f"t{i}.jpg"), rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        )
    monkeypatch.setattr(bnr, "REF_DATA", str(data))
    monkeypatch.setattr(
        sys, "argv",
        ["bench_no_resize.py", "--repeats", "1", "--n_clusters", "2",
         "--skip_resize_leg"],
    )
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        bnr.main()
    line = [l for l in buf.getvalue().splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    assert out["n"] == 2 and out["no_resize_img_s"] > 0
