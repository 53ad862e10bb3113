"""Anchor-hint utilities: random hint masks, seed dilation, hint visualization.

Capability parity with /root/reference/models/basic.py (get_random_mask 42-47,
dilate_seeds 110-117, mark_color_hints 95-108), NHWC and jittable. Random
sampling uses jax.random keys instead of python's ``random``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("n", "h", "w", "min_num", "max_num"))
def get_random_mask(key: jax.Array, n: int, h: int, w: int, min_num: int, max_num: int) -> jnp.ndarray:
    """(N, H, W, 1) binary masks with a random count in [min_num, max_num] of ones.

    Each image gets ``count`` distinct random locations (reference basic.py:42-47).
    With jit-static shapes we draw max_num distinct locations via argsort of
    random scores and keep the first ``count``.
    """
    count_key, loc_key = jax.random.split(key)
    counts = jax.random.randint(count_key, (n,), min_num, max_num + 1)
    scores = jax.random.uniform(loc_key, (n, h * w))
    # rank positions per image; position is "on" if its rank < count
    order = jnp.argsort(scores, axis=-1)
    ranks = jnp.argsort(order, axis=-1)
    mask = (ranks < counts[:, None]).astype(jnp.float32)
    return mask.reshape(n, h, w, 1)


@partial(jax.jit, static_argnames=("kernel_size",))
def dilate_seeds(gate_maps: jnp.ndarray, kernel_size: int = 3) -> jnp.ndarray:
    """Morphological max-dilation with a k x k window, same padding (NHWC).

    Reference implements this as unfold+max (basic.py:110-117); on TPU a
    reduce_window max is the native fusion.
    """
    pad = kernel_size // 2
    return jax.lax.reduce_window(
        gate_maps,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, kernel_size, kernel_size, 1),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (pad, pad), (pad, pad), (0, 0)),
    ).astype(gate_maps.dtype)


@partial(jax.jit, static_argnames=("kernel_size",))
def mark_color_hints(
    input_grays: jnp.ndarray,
    target_abs: jnp.ndarray,
    gate_maps: jnp.ndarray,
    kernel_size: int = 3,
    base_abs: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Paint anchor markers (white 1px margin + anchor color center) for visualization.

    Args (all NHWC): grays (N,H,W,1), target_abs (N,H,W,2), gate_maps (N,H,W,1).
    Returns (N,H,W,3) normalized Lab. Mirrors reference basic.py:95-108.
    """
    binary = (gate_maps > 0.7).astype(gate_maps.dtype)
    center_mask = dilate_seeds(binary, kernel_size)
    margin_mask = dilate_seeds(binary, kernel_size + 2) - center_mask
    marked_grays = jnp.where(margin_mask > 1e-5, jnp.ones_like(gate_maps), input_grays)
    if base_abs is None:
        marked_abs = jnp.where(center_mask < 1e-5, jnp.zeros_like(target_abs), target_abs)
    else:
        marked_abs = jnp.where(margin_mask > 1e-5, jnp.zeros_like(target_abs), base_abs)
        marked_abs = jnp.where(center_mask > 1e-5, target_abs, marked_abs)
    return jnp.concatenate([marked_grays, marked_abs], axis=-1)
