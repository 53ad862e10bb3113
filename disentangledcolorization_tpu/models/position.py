"""2D positional encodings for the superpixel token grid.

Capability parity with /root/reference/models/position_encoding.py:10-85
(PositionEmbeddingSine, PositionEmbeddingLearned, build_position_encoding).
NHWC; outputs (H, W, C) broadcastable over batch.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from flax import linen as nn


def sine_position_encoding(
    h: int,
    w: int,
    num_pos_feats: int = 32,
    temperature: float = 10000.0,
    normalize: bool = True,
    scale: float | None = None,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Normalized 2D sine embedding (H, W, 2*num_pos_feats).

    Matches reference PositionEmbeddingSine.forward (position_encoding.py:26-47):
    cumsum-style 1-based coordinates, normalized to scale=2*pi, per-axis
    sin/cos interleave, concat (y-part, x-part) on channels.
    """
    if scale is None:
        scale = 2 * math.pi
    y = jnp.arange(1, h + 1, dtype=dtype)[:, None] * jnp.ones((1, w), dtype)
    x = jnp.ones((h, 1), dtype) * jnp.arange(1, w + 1, dtype=dtype)[None, :]
    if normalize:
        eps = 1e-6
        y = y / (y[-1:, :] + eps) * scale
        x = x / (x[:, -1:] + eps) * scale
    dim_t = jnp.arange(num_pos_feats, dtype=dtype)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)
    pos_x = x[:, :, None] / dim_t
    pos_y = y[:, :, None] / dim_t
    # interleave sin on even channels, cos on odd (stack+flatten trick)
    pos_x = jnp.stack([jnp.sin(pos_x[:, :, 0::2]), jnp.cos(pos_x[:, :, 1::2])], axis=3).reshape(h, w, -1)
    pos_y = jnp.stack([jnp.sin(pos_y[:, :, 0::2]), jnp.cos(pos_y[:, :, 1::2])], axis=3).reshape(h, w, -1)
    return jnp.concatenate([pos_y, pos_x], axis=-1)


class PositionEmbeddingLearned(nn.Module):
    """Learned absolute row/col embeddings (position_encoding.py:50-77)."""

    n_pos_x: int = 16
    n_pos_y: int = 16
    num_pos_feats: int = 32

    @nn.compact
    def __call__(self, h: int, w: int):
        row = nn.Embed(self.n_pos_y, self.num_pos_feats, name="row_embed")(jnp.arange(h))
        col = nn.Embed(self.n_pos_x, self.num_pos_feats, name="col_embed")(jnp.arange(w))
        x_emb = jnp.broadcast_to(col[None, :, :], (h, w, self.num_pos_feats))
        y_emb = jnp.broadcast_to(row[:, None, :], (h, w, self.num_pos_feats))
        return jnp.concatenate([x_emb, y_emb], axis=-1)
