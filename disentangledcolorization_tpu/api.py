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
from typing import Optional

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
    ):
        from .cli.infer import load_variables

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

    @functools.lru_cache(maxsize=16)
    def _forward(self, sampled_T: int, with_hints: bool):
        def fn(variables, grays, colors, key, hint_mask, hint_colors):
            return self.model.apply(
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

        return jax.jit(fn)

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
        colors = np.zeros(grays.shape[:3] + (2,), np.float32)
        if key is None:
            self._key, key = jax.random.split(self._key)
        sampled_T = 2 if diverse else 0
        hint_mask = hint_colors = None
        if hints is not None:
            m, ab = hints
            hint_mask = jnp.asarray(np.asarray(m, np.float32)[None, ..., None])
            hint_colors = jnp.asarray(np.asarray(ab, np.float32)[None])
        fwd = self._forward(sampled_T, hints is not None)
        pred = np.asarray(
            fwd(self.variables, jnp.asarray(grays), jnp.asarray(colors), key, hint_mask, hint_colors),
            np.float32,
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
