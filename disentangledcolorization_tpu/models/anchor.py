"""Anchor generation & anchor-color sampling over the superpixel token grid.

Capability parity with /root/reference/models/anchor_gen.py (AnchorAnalysis):
  * __call__ (92-107): clustering mode -> per-image k-means over token features,
    one representative token per cluster (largest superpixel in the cluster),
    union -> binary hint mask; random mode -> scattered random anchors.
  * _sample_anchor_colors (54-90): top-10 bins per token, renormalized softmax;
    T=0 -> top-1 ab; T=1 -> bin farthest from top-1; T>=2 -> greedy
    farthest-point third pick.
  * _detect_correlation (14-52): cosine-similarity anchor merging (disabled in
    the reference main path; provided for parity).

Pure jittable functions, NHWC; randomness via explicit jax.random keys.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops import colorlabel as cl
from ..ops import hints as hints_ops
from ..ops import kmeans as km


@partial(jax.jit, static_argnames=("n_anchors", "iter_limit"))
def clustering_hint_mask(
    key: jax.Array,
    feats: jnp.ndarray,
    n_anchors: int,
    spixel_sizes: jnp.ndarray,
    iter_limit: int = 20,
):
    """K-means the token features, pick one representative token per cluster.

    Args:
      feats: (N, H, W, C) token features (GT spix colors in training,
        encoder features at test time — the caller decides).
      spixel_sizes: (N, H, W, 1) relative sizes, the tie-break bonus.
    Returns:
      hint_mask (N, H, W, 1) float binary, cluster_mask (N, H, W, K) one-hot.
    """
    n, h, w, _ = feats.shape
    cluster_mask = km.batch_kmeans_masks(key, feats, n_anchors, iter_limit)  # (N,H,W,K)
    cluster_prob = cluster_mask + spixel_sizes * 0.01
    flat = cluster_prob.reshape(n, h * w, n_anchors)
    best = jnp.argmax(flat, axis=1)  # (N, K): flattened HW index per cluster
    onehot = jax.nn.one_hot(best, h * w, dtype=jnp.float32)  # (N, K, HW)
    hint = jnp.sum(onehot, axis=1).reshape(n, h, w, 1)
    return hint, cluster_mask


@partial(jax.jit, static_argnames=("n", "h", "w", "n_anchors"))
def random_hint_mask(key: jax.Array, n: int, h: int, w: int, n_anchors: int):
    """Random scattered anchors (reference anchor_gen.py:102-106)."""
    hint = hints_ops.get_random_mask(key, n, h, w, n_anchors, n_anchors)
    cluster_mask = jnp.zeros((n, h, w, n_anchors), dtype=jnp.float32)
    return hint, cluster_mask


def _top_k_iterative(x: jnp.ndarray, k: int):
    """Exact top-k over the minor axis via k masked argmaxes.

    XLA lowers lax.top_k to a full 313-way sort (~1 ms/fwd on v5e at the
    token shape); k successive argmax+mask reduces are ~20x cheaper and give
    the identical ordering, including lowest-index-first tie behavior.
    """
    vals, idxs = [], []
    cur = x
    for _ in range(k):
        idx = jnp.argmax(cur, axis=-1)
        vals.append(jnp.take_along_axis(cur, idx[..., None], axis=-1)[..., 0])
        idxs.append(idx)
        cur = jnp.where(
            jax.nn.one_hot(idx, x.shape[-1], dtype=jnp.bool_), -jnp.inf, cur
        )
    return jnp.stack(vals, axis=-1), jnp.stack(idxs, axis=-1)


@partial(jax.jit, static_argnames=("T", "topk"))
def sample_anchor_colors(pred_prob: jnp.ndarray, T: int = 0, topk: int = 10) -> jnp.ndarray:
    """Sample per-token ab colors from the predicted 313-way distribution.

    Args:
      pred_prob: (N, H, W, 313) probabilities (softmaxed pal logits).
      T: diversity index. 0 = most probable bin. 1 = among the top-10 bins, the
        one farthest (ab L2) from the top-1. >=2 = greedy farthest-point pick
        ranked T-2 by (dist-to-top1 + dist-to-second).
    Returns:
      (N, H, W, 2) normalized ab. The hint mask is applied downstream.
    """
    assert T < topk
    bins = cl.q_to_ab().astype(jnp.float32) / 110.0
    if T == 0:
        # only the most probable bin is consumed — a single argmax suffices
        return bins[jnp.argmax(pred_prob, axis=-1)]
    _, idx = _top_k_iterative(pred_prob, topk)  # (N,H,W,topk) descending
    topk_abs = bins[idx]  # (N, H, W, topk, 2)
    ab0 = topk_abs[..., :1, :]
    d1 = jnp.linalg.norm(topk_abs - ab0, axis=-1)  # (N,H,W,topk)
    if T == 1:
        far = jnp.argmax(d1, axis=-1)
        return jnp.take_along_axis(topk_abs, far[..., None, None].repeat(2, -1), axis=-2)[..., 0, :]
    far1 = jnp.argmax(d1, axis=-1)
    ab1 = jnp.take_along_axis(topk_abs, far1[..., None, None].repeat(2, -1), axis=-2)
    d2 = jnp.linalg.norm(topk_abs - ab1, axis=-1)
    # rank T-2 of (d1 + d2) descending
    vals, order = jax.lax.top_k(d1 + d2, T - 1)
    sel = order[..., T - 2]
    return jnp.take_along_axis(topk_abs, sel[..., None, None].repeat(2, -1), axis=-2)[..., 0, :]


@partial(jax.jit, static_argnames=("thres", "n_anchors"))
def detect_correlation(
    data: jnp.ndarray,
    color_probs: jnp.ndarray,
    hint_mask: jnp.ndarray,
    thres: float = 0.1,
    n_anchors: int = 8,
):
    """Merge the color distributions of cosine-connected anchors.

    Parity with reference _detect_correlation (anchor_gen.py:14-52), which is
    disabled (commented call at model.py:144) but part of the surface. Returns
    the updated (N, H, W, 313) probs. Note: the (K, K) adjacency debug readout
    of the reference relies on boolean masked_select and is not returned here.
    """
    n, h, w, c = data.shape
    hw = h * w
    vecs = data.reshape(n, hw, c)
    mask = hint_mask.reshape(n, hw, 1)
    probs = color_probs.reshape(n, hw, -1)
    anchor_mask = mask @ mask.transpose(0, 2, 1)  # (N, HW, HW)
    norm = vecs / (jnp.linalg.norm(vecs, axis=-1, keepdims=True) + 1e-12)
    corr = norm @ norm.transpose(0, 2, 1)
    dist = 1.0 - 0.5 * (corr + 1.0)
    adj = jnp.where((dist < thres) & (anchor_mask > 0), 1.0, 0.0)
    adj = adj @ adj
    adj = adj / (1e-7 + adj)
    merged = (adj @ probs) / jnp.sum(adj, axis=-1, keepdims=True)
    updated = merged * mask + (1.0 - mask) * probs
    return updated.reshape(n, h, w, -1)
