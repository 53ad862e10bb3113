"""Host-side image I/O: loading, Lab conversion (OpenCV path), PNG savers.

Capability parity with /root/reference/utils/util.py (save_normLabs_from_batch
91-106, save_images_from_batch 56-88, save_markedSP_from_batch 109-122,
get_filelist/collect_filenames 125-138, exists_or_mkdir 141-147) and the
fetch_data loader of main/colorizer/inference.py:23-42.

Two Lab implementations coexist on purpose (as in the reference): OpenCV's
LAB conversion here for bit-compatible file I/O, and the differentiable jnp
chain in utils/color.py for losses.

The reference marks superpixel boundaries with skimage.mark_boundaries; this
environment has no skimage, so ``mark_boundaries`` is implemented directly
(4-neighbor label-transition test).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
from queue import Queue
from threading import Thread

import cv2
import numpy as np
from PIL import Image


def fetch_image_lab(img_path: str, no_resize: bool = True, scale: int = 16, resize_to: int = 256):
    """Load an image -> normalized (gray (H,W,1), ab (H,W,2), rgb (H,W,3)), orig (H, W).

    no_resize=True edge-pads H, W up to multiples of ``scale`` (inference.py:27-31);
    otherwise resizes to (resize_to, resize_to) with bilinear interpolation.
    """
    bgr = cv2.imread(img_path, cv2.IMREAD_COLOR)
    if bgr is None:
        raise FileNotFoundError(img_path)
    rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
    h, w = rgb.shape[:2]
    if no_resize:
        if h % scale != 0 or w % scale != 0:
            rgb = np.pad(rgb, ((0, (scale - h % scale) % scale), (0, (scale - w % scale) % scale), (0, 0)), mode="edge")
    else:
        rgb = cv2.resize(rgb, (resize_to, resize_to), interpolation=cv2.INTER_LINEAR)
    rgb = np.asarray(rgb / 255.0, np.float32)
    lab = cv2.cvtColor(rgb, cv2.COLOR_RGB2LAB)
    gray = (lab[..., :1] - 50.0) / 50.0
    ab = lab[..., 1:] / 110.0
    return gray, ab, rgb * 2.0 - 1.0, (h, w)


def load_image_bgr_resized(img_path: str, resize: int | None = None) -> np.ndarray:
    """Decode + square-resize only (uint8 BGR). Split out so the dataset's
    in-memory cache can hold the compact post-decode representation (3 bytes/
    px) instead of the 24-bytes/px float Lab item — decode+resize is the
    expensive part of the loader (~6.7 ms/img measured, tools/bench_data.py);
    the Lab conversion below is ~0.5 ms and recomputed per access."""
    bgr = cv2.imread(img_path, cv2.IMREAD_COLOR)
    if bgr is None:
        raise FileNotFoundError(img_path)
    if resize:
        bgr = cv2.resize(bgr, (resize, resize), interpolation=cv2.INTER_CUBIC)
    return bgr


def bgr_to_lab_item(bgr_u8: np.ndarray) -> dict:
    """uint8 BGR -> the normalized float32 training item
    (reference utils/dataset_lab.py:24-37 semantics)."""
    # float32 divide directly (differs from the reference's float64-then-cast
    # by <=0.5 ulp; avoids a full-size float64 temporary on the hot loader path)
    bgr = bgr_u8.astype(np.float32) / np.float32(255.0)
    lab = cv2.cvtColor(bgr, cv2.COLOR_BGR2LAB)
    return {
        "gray": (lab[..., :1] - 50.0) / 50.0,
        "color": lab[..., 1:] / 110.0,
        "BGR": bgr * 2.0 - 1.0,
    }


def load_image_lab_resized(img_path: str, resize: int | None = None):
    """Dataset-style loader (cv2 BGR->LAB, INTER_CUBIC square resize;
    reference utils/dataset_lab.py:24-37). Returns dict of float32 HWC arrays."""
    return bgr_to_lab_item(load_image_bgr_resized(img_path, resize))


def save_normLabs_from_batch(img_batch, save_dir, filename_list, batch_no=-1, suffix=None):
    """Denormalize NHWC Lab and save as RGB PNGs via cv2 LAB2RGB (util.py:91-106)."""
    img_batch = np.array(img_batch, np.float32, copy=True)
    n, h, w, c = img_batch.shape
    if c != 3:
        print("@Warning: the Lab images are NOT in 3 channels!")
        return None
    img_batch[..., 0] = img_batch[..., 0] * 50.0 + 50.0
    img_batch[..., 1:] = img_batch[..., 1:] * 110.0
    os.makedirs(save_dir, exist_ok=True)
    for i in range(n):
        rgb = cv2.cvtColor(img_batch[i], cv2.COLOR_LAB2RGB)
        name = filename_list[i] if batch_no == -1 else "%05d.png" % (batch_no * n + i)
        if suffix:
            name = name.replace(".png", "-%s.png" % suffix)
        Image.fromarray((rgb * 255.0).astype(np.uint8)).save(os.path.join(save_dir, name), "PNG")
    return None


def save_images_from_batch(img_batch, save_dir, filename_list, batch_no=-1, suffix=None):
    """[-1,1] NHWC images -> PNGs; 3ch RGB, 1ch gray, else per-channel (util.py:56-88)."""
    img_batch = np.asarray(img_batch, np.float32)
    n, h, w, c = img_batch.shape
    os.makedirs(save_dir, exist_ok=True)

    def _name(i, ch=None):
        if batch_no == -1:
            base = filename_list[i]
            if ch is not None:
                stem, _ = os.path.splitext(os.path.basename(base))
                base = f"{stem}_c{ch}.png"
        else:
            base = "%05d.png" % (batch_no * n + i) if ch is None else "%05d_c%d.png" % (batch_no * n + i, ch)
        return base.replace(".png", "-%s.png" % suffix) if suffix else base

    for i in range(n):
        if c == 3:
            arr = (127.5 * (img_batch[i] + 1.0)).astype(np.uint8)
            Image.fromarray(arr).save(os.path.join(save_dir, _name(i)), "PNG")
        elif c == 1:
            arr = (127.5 * (img_batch[i, :, :, 0] + 1.0)).astype(np.uint8)
            Image.fromarray(arr).save(os.path.join(save_dir, _name(i)), "PNG")
        else:
            for j in range(c):
                arr = (127.5 * (img_batch[i, :, :, j] + 1.0)).astype(np.uint8)
                Image.fromarray(arr).save(os.path.join(save_dir, _name(i, j)), "PNG")
    return None


def mark_boundaries(image: np.ndarray, label_map: np.ndarray, color=(1.0, 1.0, 1.0)) -> np.ndarray:
    """Paint segment boundaries of an integer label map onto an RGB [0,1] image.

    skimage.segmentation.mark_boundaries replacement: a pixel is a boundary if
    any 4-neighbor has a different label.
    """
    lm = np.asarray(label_map)
    b = np.zeros(lm.shape, bool)
    b[:-1, :] |= lm[:-1, :] != lm[1:, :]
    b[1:, :] |= lm[1:, :] != lm[:-1, :]
    b[:, :-1] |= lm[:, :-1] != lm[:, 1:]
    b[:, 1:] |= lm[:, 1:] != lm[:, :-1]
    out = np.array(image, np.float32, copy=True)
    out[b] = np.asarray(color, np.float32)
    return out


def save_markedSP_from_batch(img_batch, spix_batch, save_dir, filename_list, batch_no=-1, suffix=None):
    """[-1,1] NHWC images + (N,H,W,1) spixel ids -> boundary-marked PNGs (util.py:109-122)."""
    img_batch = np.asarray(img_batch, np.float32)
    spix_batch = np.asarray(spix_batch)
    n = img_batch.shape[0]
    os.makedirs(save_dir, exist_ok=True)
    for i in range(n):
        norm = img_batch[i] * 0.5 + 0.5
        marked = mark_boundaries(norm, spix_batch[i, :, :, 0].astype(int))
        name = filename_list[i] if batch_no == -1 else "%05d.png" % (batch_no * n + i)
        if suffix:
            name = name.replace(".png", "-%s.png" % suffix)
        Image.fromarray((marked * 255.0).astype(np.uint8)).save(os.path.join(save_dir, name), "PNG")
    return None


def get_filelist(data_dir: str):
    files = glob.glob(os.path.join(data_dir, "*.*"))
    files.sort()
    return files


def collect_filenames(data_dir: str):
    names = [os.path.split(p)[1] for p in get_filelist(data_dir)]
    names.sort()
    return names


def exists_or_mkdir(path: str, need_remove: bool = False):
    if not os.path.exists(path):
        os.makedirs(path)
    elif need_remove:
        shutil.rmtree(path)
        os.makedirs(path)
    return None


def save_list(save_path, data_list, append_mode=False):
    n = len(data_list)
    if append_mode:
        with open(save_path, "a") as f:
            f.writelines([str(data_list[i]) + "\n" for i in range(n - 1, n)])
    else:
        with open(save_path, "w") as f:
            f.writelines([str(x) + "\n" for x in data_list])
    return None


def save_dict(save_path, d):
    with open(save_path, "w") as f:
        json.dump(d, f)
    return None


class AsyncWriter:
    """Background-thread writer for metrics/images (reference PlotterThread,
    util.py:29-53): callers enqueue (fn, args) without blocking the step loop.

    A failing write records the first exception and keeps the thread draining
    (so ``flush`` can never deadlock on a dead worker); ``flush`` re-raises it
    on the caller's thread."""

    def __init__(self):
        self.q: Queue = Queue(maxsize=0)
        self._error: Exception | None = None
        t = Thread(target=self._work, daemon=True)
        t.start()

    def _work(self):
        while True:
            fn, args, kwargs = self.q.get()
            try:
                fn(*args, **kwargs)
            except Exception as e:  # noqa: BLE001 — surfaced at flush()
                if self._error is None:  # keep draining; report the first
                    self._error = e
            finally:
                self.q.task_done()

    def submit(self, fn, *args, **kwargs):
        self.q.put((fn, args, kwargs))

    def flush(self):
        self.q.join()
        if self._error is not None:
            err, self._error = self._error, None
            raise err

    def __len__(self):
        return self.q.qsize()


def prefetch_iter(it, depth: int = 2):
    """Run ``it`` on a background thread, buffering up to ``depth`` items —
    overlaps host-side decode with device compute in the inference CLI.

    ``depth <= 0`` yields from ``it`` directly (fully serial). Exceptions in
    the producer propagate to the consumer at the point of the failed item.
    """
    if depth <= 0:
        yield from it
        return
    q: Queue = Queue(maxsize=depth)
    sentinel = object()

    def run():
        try:
            for item in it:
                q.put(item)
        except BaseException as e:  # noqa: BLE001 — re-raised on the consumer
            q.put(e)
            return
        q.put(sentinel)

    Thread(target=run, daemon=True).start()
    while True:
        item = q.get()
        if item is sentinel:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


def get_gauss_kernel(size: int, sigma: float) -> np.ndarray:
    """MATLAB fspecial-style normalized Gaussian kernel (reference util.py:11-15)."""
    x, y = np.mgrid[-size // 2 + 1 : size // 2 + 1, -size // 2 + 1 : size // 2 + 1]
    g = np.exp(-((x**2 + y**2) / (2.0 * sigma**2)))
    return g / g.sum()
