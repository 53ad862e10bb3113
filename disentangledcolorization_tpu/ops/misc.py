"""Misc ops from the reference surface: straight-through rounding, segment
mean-spread, and the file-based interactive hint exchange.

Parity targets (all vestigial in the reference main path but part of its
public surface, SURVEY.md section 2.8):
  * Quantize (basic.py:77-92): round with straight-through gradient ->
    jax.custom_vjp.
  * suck_and_spread (basic.py:379-389): per-segment mean + redistribute.
  * io_user_control (basic.py:50-74): dump/load hint mask + anchor colors as
    PNGs for interactive editing; pairs with AnchorColorProb's
    hint_mask_override / anchor_colors_override arguments.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


@jax.custom_vjp
def quantize_ste(x: jnp.ndarray) -> jnp.ndarray:
    """Round to nearest integer; gradient passes straight through."""
    return jnp.round(x)


def _q_fwd(x):
    return jnp.round(x), None


def _q_bwd(_, g):
    return (g,)


quantize_ste.defvjp(_q_fwd, _q_bwd)


@jax.jit
def suck_and_spread(base_maps: jnp.ndarray, seg_layers: jnp.ndarray) -> jnp.ndarray:
    """Per-segment mean of ``base_maps`` redistributed by segment weight.

    Args (NHWC): base_maps (N, H, W, C), seg_layers (N, H, W, S) soft masks.
    Returns (N, H, W, C).
    """
    # (N, S, C): segment means
    num = jnp.einsum("nhws,nhwc->nsc", seg_layers, base_maps)
    den = jnp.sum(seg_layers, axis=(1, 2))[..., None] + 1e-5
    means = num / den
    weights = seg_layers / (jnp.sum(seg_layers, axis=-1, keepdims=True) + 1e-5)
    return jnp.einsum("nhws,nsc->nhwc", weights, means)


def save_user_hints(cache_dir: str, hint_mask: np.ndarray, spix_colors: np.ndarray):
    """Write hint mask + anchor colors as editable PNGs (basic.py:52-60). NHWC."""
    from ..utils import io as io_lib

    os.makedirs(cache_dir, exist_ok=True)
    io_lib.save_images_from_batch(
        np.asarray(hint_mask) * 2.0 - 1.0, cache_dir, ["mask.png"], -1
    )
    fake_gray = np.zeros_like(np.asarray(spix_colors)[..., :1])
    lab = np.concatenate([fake_gray, np.asarray(spix_colors)], axis=-1)
    io_lib.save_normLabs_from_batch(lab, cache_dir, ["color.png"], -1)


def load_user_hints(cache_dir: str):
    """Read back (possibly user-edited) hint mask + anchor colors (basic.py:61-74).

    Returns NHWC float32 arrays (1, H, W, 1) and (1, H, W, 2), ready to pass as
    hint_mask_override / anchor_colors_override.
    """
    import cv2

    mask = cv2.imread(os.path.join(cache_dir, "mask.png"), cv2.IMREAD_GRAYSCALE)
    hint_mask = (mask[None, :, :, None] / 255.0).astype(np.float32)
    bgr = cv2.imread(os.path.join(cache_dir, "color.png"), cv2.IMREAD_COLOR)
    rgb = np.asarray(cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB) / 255.0, np.float32)
    lab = cv2.cvtColor(rgb, cv2.COLOR_RGB2LAB)
    spix_colors = (lab[None, :, :, 1:] / 110.0).astype(np.float32)
    return hint_mask, spix_colors
