"""High-level colorization API: one object, numpy in, numpy out.

The programmatic counterpart of cli/infer.py for serving/embedding:

    from disentangledcolorization_tpu.api import Colorizer
    c = Colorizer(checkpoint="disco-beta.pkl")       # or .pth.tar (auto-convert)
    rgb = c.colorize(gray_or_rgb_uint8_image)        # (H, W, 3) uint8 RGB
    variants = c.colorize(img, diverse=True)         # list of 3 arrays
    rgb = c.colorize(img, hints=(mask, ab))          # interactive hints

Forward graphs are jit-cached per (shape-bucket, mode); repeated calls at the
same resolution run at full device speed.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Sequence

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from .models import AnchorColorProb


class Colorizer:
    def __init__(
        self,
        checkpoint: str = "",
        n_clusters: int = 8,
        sp_size: int = 16,
        random_hint: bool = False,
        hint2regress: bool = False,
        compute_dtype: str = "bfloat16",
        seed: int = 130,
        bucket: int = 16,
        data_parallel: bool = False,
        quantize: str = "none",
        wire_dtype: str = "float32",
    ):
        """``quantize='int8'``: post-training-quantize the wide convs, with
        activation scales calibrated on the first image/batch processed
        (ops/quant.py; measured +31% serving throughput on v5e).
        ``quantize='int8_safe'``: same, minus the repnet trunk — the
        palette-stable choice for anchor-ambiguous checkpoints (see
        ops/quant.py::excluded for the measured drift numbers).

        ``wire_dtype='uint8'``: quantize the predicted ab channels to uint8 ON
        DEVICE and dequantize on host, quartering the device->host transfer
        (the serving default, serve.py). Precision cost is half a uint8 Lab
        step (<=0.43 ab units) — the same quantization the reference's own
        cv2 8-bit Lab I/O applies (utils/dataset_lab.py:29), invisible in the
        8-bit RGB output. float32 (default here) keeps the exact device
        values for the library API."""
        from .cli.infer import load_variables

        if quantize not in ("none", "int8", "int8_safe"):
            raise ValueError(f"quantize={quantize!r}")
        if wire_dtype not in ("float32", "uint8"):
            raise ValueError(f"wire_dtype={wire_dtype!r}")
        if quantize == "int8_safe":
            # palette-stable int8: keep the anchor-feature trunk (repnet) in
            # bf16 so int8 noise cannot flip the k-means palette choice on
            # anchor-ambiguous checkpoints (ops/quant.py::excluded)
            os.environ["DISCO_INT8_EXCLUDE"] = "repnet"
            quantize = "int8"
        self._quantize = quantize
        self._wire_uint8 = wire_dtype == "uint8"
        self._calibrated = False
        if quantize == "int8":
            os.environ["DISCO_INT8"] = "0"  # off until calibrated

        # multi-chip serving: shard the request batch over all local devices
        # (DP — each image independent, like cli/infer.py); batch buckets are
        # rounded up to a multiple of the device count
        self._data_sharding = None
        self._n_dev = 1
        if data_parallel and len(jax.devices()) > 1:
            from .parallel import batch_sharding, make_mesh

            self._n_dev = len(jax.devices())
            self._data_sharding = batch_sharding(make_mesh())

        self.sp_size = sp_size
        self.bucket = max(bucket, sp_size)
        self.seed = seed
        self._key = jax.random.key(seed)
        self.model = AnchorColorProb(
            sp_size=sp_size,
            n_clusters=n_clusters,
            random_hint=random_hint,
            hint2regress=hint2regress,
            enhanced=True,
            sn_folded=True,
            compute_dtype=jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32,
        )
        example = (
            jnp.zeros((1, 256, 256, 1), jnp.float32),
            jnp.zeros((1, 256, 256, 2), jnp.float32),
            True,
            0,
            False,
        )
        self.variables, self.loaded = load_variables(checkpoint, self.model, example, seed)

    def _maybe_calibrate(self, grays, key):
        """One f32 calibration forward on the first inputs (quantize='int8'):
        records per-conv activation ranges into the 'quant' collection, then
        flips the trace-time gate to static so later jits run int8."""
        if self._quantize != "int8" or self._calibrated:
            return
        os.environ["DISCO_INT8"] = "calib"

        def calib_fn(v, g, k):
            if g.dtype == jnp.uint8:
                g = g.astype(jnp.float32) / 127.5 - 1.0
            c = jnp.zeros(g.shape[:3] + (2,), jnp.float32)
            return self.model.apply(
                v, g, c, True, 0, False, rngs={"anchor": k}, mutable=["quant"]
            )

        _, mut = jax.jit(calib_fn)(self.variables, grays, key)
        self.variables = {**self.variables, **jax.block_until_ready(mut)}
        os.environ["DISCO_INT8"] = "static"
        self._calibrated = True

    @functools.lru_cache(maxsize=16)
    def _forward(self, sampled_T: int, with_hints: bool):
        wire_uint8 = self._wire_uint8

        def fn(variables, grays, key, hint_mask, hint_colors):
            if grays.dtype == jnp.uint8:  # inverse of the input wire codec
                grays = grays.astype(jnp.float32) / 127.5 - 1.0
            # the GT-color input is all zeros at inference — synthesized
            # in-graph so no (N, H, W, 2) zeros tensor crosses host->device
            colors = jnp.zeros(grays.shape[:3] + (2,), jnp.float32)
            pred = self.model.apply(
                variables,
                grays,
                colors,
                True,
                sampled_T,
                False,
                hint_mask_override=hint_mask if with_hints else None,
                anchor_colors_override=hint_colors if with_hints else None,
                rngs={"anchor": key},
            )["pred_colors"]
            if wire_uint8:
                # device-side wire quantization: ab in [-1, 1] -> uint8
                pred = jnp.clip(
                    jnp.round((pred.astype(jnp.float32) + 1.0) * 127.5), 0, 255
                ).astype(jnp.uint8)
            return pred

        return jax.jit(fn)

    def _wire_in(self, grays: np.ndarray) -> jnp.ndarray:
        """Host->device gray transfer, optionally uint8-coded (quarter bytes;
        precision = one 8-bit Lab step, the reference's own input precision —
        utils/dataset_lab.py:29 reads L through cv2 uint8 Lab)."""
        if self._wire_uint8:
            grays = np.clip(np.round((grays + 1.0) * 127.5), 0, 255).astype(np.uint8)
        return jnp.asarray(grays)

    def _unwire(self, pred: np.ndarray) -> np.ndarray:
        """Host-side inverse of the output wire quantization (no-op for f32)."""
        if pred.dtype == np.uint8:
            return pred.astype(np.float32) / 127.5 - 1.0
        return np.asarray(pred, np.float32)

    def _prep(self, image: np.ndarray):
        """uint8/float RGB or grayscale -> normalized L (1,H',W',1) + pad info."""
        img = np.asarray(image)
        if img.dtype == np.uint8:
            img = img.astype(np.float32) / 255.0
        if img.ndim == 2:
            img = np.repeat(img[..., None], 3, axis=-1)
        h, w = img.shape[:2]
        ph = (self.bucket - h % self.bucket) % self.bucket
        pw = (self.bucket - w % self.bucket) % self.bucket
        if ph or pw:
            img = np.pad(img, ((0, ph), (0, pw), (0, 0)), mode="edge")
        lab = cv2.cvtColor(img.astype(np.float32), cv2.COLOR_RGB2LAB)
        gray = (lab[..., :1] - 50.0) / 50.0
        return gray[None], (h, w)

    def anchor_mask(self, image: np.ndarray, key: Optional[jax.Array] = None):
        """Where the model itself would place its anchors: the k-means hint
        mask over the token grid, as an (h, w) float array in {0, 1}.

        The reference exposes the same information by painting the anchor
        markers onto the output (mark_color_hints, basic.py:107-117 /
        inference.py:130); interactive frontends need the raw positions to
        seed user hints at the model's own (content-representative) anchors.
        """
        grays, _ = self._prep(image)
        if key is None:
            self._key, key = jax.random.split(self._key)

        def fn(variables, g, k):
            c = jnp.zeros(g.shape[:3] + (2,), jnp.float32)
            out = self.model.apply(variables, g, c, True, 0, False, rngs={"anchor": k})
            return out["hint_mask"]

        mask = np.asarray(jax.jit(fn)(self.variables, jnp.asarray(grays), key))
        return mask[0, ..., 0]

    def colorize(
        self,
        image: np.ndarray,
        diverse: bool = False,
        hints: Optional[tuple] = None,
        key: Optional[jax.Array] = None,
    ):
        """Colorize one image. Returns (H, W, 3) uint8 RGB, or a list of 3 in
        diverse mode. ``hints`` is (mask (h, w), ab (h, w, 2)) on the token grid."""
        grays, (h, w) = self._prep(image)
        if key is None:
            self._key, key = jax.random.split(self._key)
        sampled_T = 2 if diverse else 0
        hint_mask = hint_colors = None
        if hints is not None:
            m, ab = hints
            hint_mask = jnp.asarray(np.asarray(m, np.float32)[None, ..., None])
            hint_colors = jnp.asarray(np.asarray(ab, np.float32)[None])
        grays_d = self._wire_in(grays)
        self._maybe_calibrate(grays_d, key)
        fwd = self._forward(sampled_T, hints is not None)
        pred = self._unwire(
            np.asarray(fwd(self.variables, grays_d, key, hint_mask, hint_colors))
        )

        def to_rgb(ab):
            lab = np.concatenate([grays[0], ab], axis=-1)
            lab[..., 0] = lab[..., 0] * 50.0 + 50.0
            lab[..., 1:] = lab[..., 1:] * 110.0
            rgb = cv2.cvtColor(lab, cv2.COLOR_LAB2RGB)
            return (np.clip(rgb[:h, :w], 0, 1) * 255).astype(np.uint8)

        if diverse:
            return [to_rgb(pred[i]) for i in range(3)]
        return to_rgb(pred[0])

    # batch-size buckets for serving: XLA compiles one graph per input shape,
    # so an unconstrained dynamic batcher would trigger a fresh multi-second
    # compile for every new request count. Batches are padded up to the next
    # bucket (repeating the last image) and the padding outputs dropped.
    BATCH_BUCKETS = (1, 2, 4, 8, 16, 32, 56, 128)

    def _batch_bucket(self, n: int) -> int:
        b = next((b for b in self.BATCH_BUCKETS if n <= b), n)
        return -(-b // self._n_dev) * self._n_dev  # shardable over the mesh

    def colorize_batch(self, images: list, key: Optional[jax.Array] = None) -> list:
        """Colorize several images in ONE device dispatch (serving hot path).

        All images must share the same bucket-padded resolution (the dynamic
        batcher in serve.py groups requests by shape before calling this).
        Returns a list of (H, W, 3) uint8 RGB arrays, order-preserving.
        """
        if not images:
            return []
        preps = [self._prep(img) for img in images]
        shapes = {g.shape for g, _ in preps}
        if len(shapes) > 1:
            raise ValueError(f"colorize_batch needs one padded shape, got {sorted(shapes)}")
        grays = np.concatenate([g for g, _ in preps], axis=0)
        nb = self._batch_bucket(len(preps))
        if nb > len(preps):
            pad = np.broadcast_to(grays[-1:], (nb - len(preps),) + grays.shape[1:])
            grays = np.concatenate([grays, pad], axis=0)
        if key is None:
            self._key, key = jax.random.split(self._key)
        grays_d = self._wire_in(grays)
        self._maybe_calibrate(grays_d, key)
        fwd = self._forward(0, False)
        if self._data_sharding is not None:
            grays_d = jax.device_put(grays_d, self._data_sharding)
        pred = self._unwire(np.asarray(fwd(self.variables, grays_d, key, None, None)))
        out = []  # padding entries (i >= len(preps)) are dropped here
        for i, (_, (h, w)) in enumerate(preps):
            lab = np.concatenate([grays[i], pred[i]], axis=-1)
            lab[..., 0] = lab[..., 0] * 50.0 + 50.0
            lab[..., 1:] = lab[..., 1:] * 110.0
            rgb = cv2.cvtColor(lab, cv2.COLOR_LAB2RGB)
            out.append((np.clip(rgb[:h, :w], 0, 1) * 255).astype(np.uint8))
        return out

    def warmup(self, size: int = 256, buckets: Sequence[int] = (1, 8, 56)) -> None:
        """Pre-compile the serving graphs for the given batch buckets so the
        first real requests don't pay XLA compile latency."""
        dummy = np.zeros((size, size), np.uint8)
        for b in buckets:
            self.colorize_batch([dummy] * b, key=jax.random.key(0))
