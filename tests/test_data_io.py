"""Data pipeline & host I/O tests."""

import os

import numpy as np
import pytest

from disentangledcolorization_tpu.train import data as data_lib
from disentangledcolorization_tpu.utils import io as io_lib


@pytest.fixture(scope="module")
def img_dir(tmp_path_factory):
    import cv2

    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    for i in range(6):
        img = (rng.uniform(0, 255, (40 + i, 50, 3))).astype(np.uint8)
        cv2.imwrite(str(d / f"img{i}.png"), img)
    return str(d)


def test_lab_dataset_shapes_and_ranges(img_dir):
    ds = data_lib.LabDataset(rootdir=img_dir, resize=32)
    assert len(ds) == 6
    item = ds[0]
    assert item["gray"].shape == (32, 32, 1)
    assert item["color"].shape == (32, 32, 2)
    assert item["BGR"].shape == (32, 32, 3)
    assert -1.01 <= item["gray"].min() and item["gray"].max() <= 1.01
    assert np.abs(item["color"]).max() <= 1.01


def test_lab_dataset_cache_bit_identical_and_decodes_once(img_dir, monkeypatch):
    """cache=True serves bit-identical items and hits the decoder exactly
    once per index (the point: repeated-epoch training on a decode-bound
    host, --cache_data)."""
    plain = data_lib.LabDataset(rootdir=img_dir, resize=32)
    cached = data_lib.LabDataset(rootdir=img_dir, resize=32, cache=True)
    expected = [plain[i] for i in range(len(plain))]  # before the counter patch

    calls = []
    real = io_lib.load_image_bgr_resized
    monkeypatch.setattr(
        io_lib, "load_image_bgr_resized", lambda p, r=None: (calls.append(p), real(p, r))[1]
    )
    for _ in range(3):  # three "epochs"
        for i, a in enumerate(expected):
            b = cached[i]
            for k in a:
                assert np.array_equal(a[k], b[k]), k
    assert len(calls) == len(cached), "cache did not stop re-decoding"


def test_dataloader_batching_and_sharding(img_dir):
    ds = data_lib.LabDataset(rootdir=img_dir, resize=32)
    dl = data_lib.DataLoader(ds, batch_size=2, shuffle=True, seed=1, num_workers=2)
    batches = list(dl)
    assert len(batches) == 3
    assert batches[0]["gray"].shape == (2, 32, 32, 1)
    # per-host sharding splits indices disjointly
    d0 = data_lib.DataLoader(ds, batch_size=1, shuffle=False, process_id=0, num_processes=2)
    d1 = data_lib.DataLoader(ds, batch_size=1, shuffle=False, process_id=1, num_processes=2)
    assert len(d0) == 3 and len(d1) == 3


def test_dataloader_epoch_shuffle_differs(img_dir):
    ds = data_lib.LabDataset(rootdir=img_dir, resize=16)
    dl = data_lib.DataLoader(ds, batch_size=6, shuffle=True, seed=2, num_workers=1)
    dl.set_epoch(0)
    a = next(iter(dl))["gray"]
    dl.set_epoch(1)
    b = next(iter(dl))["gray"]
    assert not np.allclose(a, b)


def test_fetch_image_lab_padding(img_dir):
    f = io_lib.get_filelist(img_dir)[0]
    gray, ab, rgb, (h, w) = io_lib.fetch_image_lab(f, no_resize=True, scale=16)
    assert gray.shape[0] % 16 == 0 and gray.shape[1] % 16 == 0
    assert (h, w) == (40, 50)
    gray2, _, _, _ = io_lib.fetch_image_lab(f, no_resize=False, resize_to=64)
    assert gray2.shape == (64, 64, 1)


def test_save_normlabs_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    lab = np.zeros((1, 16, 16, 3), np.float32)
    lab[..., 0] = rng.uniform(-0.5, 0.5, (1, 16, 16))
    io_lib.save_normLabs_from_batch(lab.copy(), str(tmp_path), ["x.png"], -1)
    assert os.path.exists(tmp_path / "x.png")


def test_mark_boundaries():
    img = np.zeros((8, 8, 3), np.float32)
    labels = np.zeros((8, 8), int)
    labels[:, 4:] = 1
    out = io_lib.mark_boundaries(img, labels)
    assert (out[:, 3:5] == 1.0).all()
    assert (out[:, :3] == 0.0).all()


def test_imagenet_filelist(tmp_path):
    lst = tmp_path / "train_list.txt"
    lst.write_text("a/x.jpg 3\nb/y.jpg 7\n")
    files = data_lib.load_imagenet_filelist(str(lst), "/root/data")
    assert files == ["/root/data/a/x.jpg", "/root/data/b/y.jpg"]


def test_dataloader_zero_workers_no_deadlock(tmp_path):
    """num_workers=0 used to kill the producer thread (ThreadPoolExecutor(0)
    raises) without ever queueing the end-sentinel — the trainer then hung
    forever on q.get(). Found by driving the trainer CLI with --num_workers 0."""
    import cv2

    for i in range(4):
        img = (np.full((16, 16, 3), 40 * i)).astype(np.uint8)
        cv2.imwrite(str(tmp_path / f"i{i}.png"), img)
    ds = data_lib.LabDataset(str(tmp_path), resize=16)
    loader = data_lib.DataLoader(ds, batch_size=2, shuffle=False, num_workers=0)
    batches = list(loader)
    assert len(batches) == 2 and batches[0]["gray"].shape == (2, 16, 16, 1)


def test_dataloader_producer_error_propagates(tmp_path):
    """A decode failure must raise in the consumer, not hang the train loop."""
    import pytest

    class Boom:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            raise ValueError("decode failed")

    loader = data_lib.DataLoader(Boom(), batch_size=2, shuffle=False, num_workers=1)
    with pytest.raises(ValueError, match="decode failed"):
        list(loader)


def test_prefetch_iter_order_and_exceptions():
    from disentangledcolorization_tpu.utils.io import prefetch_iter

    assert list(prefetch_iter(iter(range(7)), depth=2)) == list(range(7))
    assert list(prefetch_iter(iter(range(3)), depth=0)) == [0, 1, 2]  # serial path

    def boom():
        yield 1
        yield 2
        raise RuntimeError("decode failed")

    got = []
    import pytest

    with pytest.raises(RuntimeError, match="decode failed"):
        for x in prefetch_iter(boom(), depth=2):
            got.append(x)
    assert got == [1, 2]


def test_async_writer_surfaces_errors_at_flush():
    from disentangledcolorization_tpu.utils.io import AsyncWriter

    w = AsyncWriter()
    results = []
    w.submit(results.append, 1)

    def fail():
        raise ValueError("disk full")

    w.submit(fail)
    w.submit(results.append, 2)  # queue keeps draining after the failure
    import pytest

    with pytest.raises(ValueError, match="disk full"):
        w.flush()
    assert results == [1, 2]
    # after re-raising once, the writer is usable again
    w.submit(results.append, 3)
    w.flush()
    assert results == [1, 2, 3]
