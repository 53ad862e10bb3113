"""Native two-stage checkpoint chain, no conversion step in the middle:

    train_spixel -> (Orbax) -> train_colorizer --spixel_ckpt <run>
                 -> (Orbax) -> cli.infer --checkpt <run>

The reference chains its stages through its own torch .pth.tar files
(/root/reference/main/colorizer/train_colorizer.py:58-60 loads stage 1 into
the colorizer; inference.py:85-90 loads stage 2). Our trainers write Orbax
TrainState snapshots; this proves those snapshots are first-class citizens of
the rest of the framework: the stage-2 trainer freezes exactly stage-1's
weights, and the inference CLI loads a training run directly (spectral norm
folded on the fly to inference-ready weights).
"""

import os

import jax
import numpy as np
import pytest


@pytest.fixture(scope="module")
def chain_env(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("chain")
    data = root / "imgs"
    rng = np.random.default_rng(0)
    for split, count in (("train", 6), ("val", 4)):
        (data / split).mkdir(parents=True)
        for i in range(count):
            img = rng.uniform(0, 255, (32, 32, 3)).astype(np.uint8)
            cv2.imwrite(str(data / split / f"im{i}.png"), img)
    return root, str(data)


def _tree_equal(a, b) -> bool:
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    return len(la) == len(lb) and all(
        np.array_equal(np.asarray(x), np.asarray(y)) for x, y in zip(la, lb)
    )


@pytest.mark.slow
def test_native_two_stage_chain(chain_env):
    root, data = chain_env
    from disentangledcolorization_tpu.cli import infer, train_colorizer, train_spixel
    from disentangledcolorization_tpu.train.checkpoint import load_train_variables

    runs = str(root / "runs")

    # stage 1: superpixel pretraining
    train_spixel.main([
        "--data", data, "--dataset", "disco", "--save_dir", runs, "--name", "spix",
        "--input_size", "32", "--batch_size", "2", "--epochs", "1",
        "--num_workers", "0", "--seed", "1", "--cache_data",
    ])
    spix_run = os.path.join(runs, "spix")
    spix_vars = load_train_variables(spix_run)
    assert "net" in spix_vars["params"]

    # stage 2: colorizer consuming stage 1's Orbax run dir directly
    train_colorizer.main([
        "--data", data, "--dataset", "disco", "--save_dir", runs, "--name", "color",
        "--input_size", "32", "--batch_size", "2", "--epochs", "1",
        "--n_clusters", "2", "--num_workers", "0", "--seed", "2",
        "--enhanced", "--spixel_ckpt", spix_run,
    ])
    color_run = os.path.join(runs, "color")

    # the frozen segnet inside stage 2's checkpoint is exactly stage 1's params
    raw = load_train_variables(color_run, fold_spectral=False)
    assert _tree_equal(raw["params"]["segnet"], spix_vars["params"]), (
        "stage-2 segnet diverged from the frozen stage-1 weights"
    )

    # spectral folding: the colorizer has SN convs, so folding must change
    # kernels and drop the collection
    folded = load_train_variables(color_run)
    assert "spectral" in raw and "spectral" not in folded
    assert not _tree_equal(raw["params"]["repnet"], folded["params"]["repnet"])

    # inference CLI loads the training run dir directly (no conversion)
    infer.main([
        "--data", os.path.join(data, "val"), "--checkpt", color_run,
        "--save_dir", str(root), "--name", "out", "--seed", "7",
        "--n_clusters", "2", "--batch_size", "2", "--no_resize",
    ])
    out_dir = os.path.join(str(root), "out-anchor2")
    files = sorted(os.listdir(out_dir))
    assert files == [f"im{i}.png" for i in range(4)]
    import cv2

    first = cv2.imread(os.path.join(out_dir, "im0.png"))
    assert first.shape == (32, 32, 3) and np.isfinite(first).all()


def test_device_index_loader_matches_dataloader_order():
    """--device_data must see the IDENTICAL batch sequence the host loader
    would produce (same default_rng(seed+epoch) shuffle), so a --resume that
    switches modes mid-run continues the same data stream."""
    from disentangledcolorization_tpu.train.data import DataLoader, DeviceIndexLoader

    class FakeDS:
        def __len__(self):
            return 13

    host = DataLoader(FakeDS(), batch_size=3, shuffle=True, seed=5, num_workers=0)
    dev = DeviceIndexLoader(13, 3, shuffle=True, seed=5)
    for epoch in (0, 1, 7):
        host.set_epoch(epoch)
        dev.set_epoch(epoch)
        host_idx = host._indices()
        dev_batches = list(dev)
        assert len(dev_batches) == len(host) == 4  # drop_last
        got = np.concatenate(dev_batches)
        np.testing.assert_array_equal(got, host_idx[: len(got)])
        # full coverage before the dropped tail
        assert len(np.unique(got)) == len(got)


def test_colorizer_device_data_cli(tmp_path):
    """--device_data end-to-end: dataset uploaded once, in-jit gather across
    the 8-device test mesh, checkpoints written, finite metrics.

    Self-contained data: the conftest mesh has 8 devices, so global batch =
    batch_size * 8 — the shared 6-image fixture would yield ZERO steps."""
    import json

    import cv2

    data = tmp_path / "imgs"
    rng = np.random.default_rng(3)
    for split, count in (("train", 10), ("val", 8)):
        (data / split).mkdir(parents=True)
        for i in range(count):
            img = rng.uniform(0, 255, (32, 32, 3)).astype(np.uint8)
            cv2.imwrite(str(data / split / f"im{i}.png"), img)

    from disentangledcolorization_tpu.cli import train_colorizer

    runs = str(tmp_path / "runs")
    train_colorizer.main([
        "--data", str(data), "--dataset", "disco", "--save_dir", runs, "--name", "color_dd",
        "--input_size", "32", "--batch_size", "1", "--epochs", "1", "--grad_accum", "2",
        "--n_clusters", "2", "--num_workers", "0", "--seed", "2",
        "--enhanced", "--device_data",
    ])
    run = os.path.join(runs, "color_dd")
    assert os.path.isdir(os.path.join(run, "checkpts", "model_last"))
    with open(os.path.join(run, "metrics_train.jsonl")) as f:
        rows = [json.loads(l) for l in f]
    total = [r["value"] for r in rows if r["name"] == "train/totalLoss"]
    assert total and np.isfinite(total).all()
    with open(os.path.join(run, "metrics_val.jsonl")) as f:
        val = [json.loads(l)["value"] for l in f if '"val/totalLoss"' in l]
    assert val and np.isfinite(val).all()
