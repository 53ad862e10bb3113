"""Soft encoding/decoding between ab chrominance and the 313-bin color vocabulary.

Capability parity with reference ``ColorLabel`` (/root/reference/models/basic.py:149-218),
re-designed as pure jittable functions, NHWC. The 5-NN Gaussian soft encoding is
expressed as a one-hot contraction (MXU-friendly) instead of scatter writes, and
the gradient-rebalancing autograd Function becomes a ``jax.custom_vjp``.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from ..utils import cielab as _cielab

NUM_BINS = _cielab.NUM_BINS


def q_to_ab() -> jnp.ndarray:
    """(313, 2) bin-center ab values (real units)."""
    return jnp.asarray(_cielab.default_cielab().q_to_ab)


def class_rebalance_weights(lambda_: float = 0.5) -> jnp.ndarray:
    """(313,) rare-color rebalancing weights (see utils.cielab)."""
    return jnp.asarray(_cielab.class_rebalance_weights(lambda_))


def _sq_dist_to_bins(ab_flat: jnp.ndarray, bins: jnp.ndarray) -> jnp.ndarray:
    """Squared euclidean distance (m, 313) from (m, 2) ab points to bin centers.

    Elementwise on purpose: a matmul form would run the ~1e2-magnitude
    ab x bins products through the TPU MXU's default bf16 path and scramble
    the nearest-neighbor ordering (~+-50 absolute distance error).
    """
    da = ab_flat[:, 0:1] - bins[None, :, 0]
    db = ab_flat[:, 1:2] - bins[None, :, 1]
    return da * da + db * db


def encode_ab2ind(
    batch_ab: jnp.ndarray,
    neighbours: int = 5,
    sigma: float = 5.0,
    backend: str = "auto",
) -> jnp.ndarray:
    """Soft-encode normalized ab (N, H, W, 2) -> (N, H, W, 313) soft labels.

    5 nearest bins weighted by an isotropic Gaussian (sigma=5 in real ab units),
    renormalized to sum to one (reference basic.py:177-194).

    backend: 'auto' uses the fused Pallas kernel on TPU (measured 3.3x faster
    than this XLA formulation at the training token shape, 3.0x at full
    resolution — tools/pallas_bench.py numbers in ops/pallas_colorlabel.py);
    'xla' / 'pallas' force a path. Targets are gradient-free (labels), so the
    non-differentiable pallas_call is safe here.
    """
    if backend == "pallas" or (backend == "auto" and jax.default_backend() == "tpu"):
        from . import pallas_colorlabel as _pcl

        return _pcl.encode_ab2ind(batch_ab, neighbours=neighbours, sigma=sigma)
    n, h, w, _ = batch_ab.shape
    bins = q_to_ab().astype(jnp.float32)
    ab = batch_ab.reshape(-1, 2).astype(jnp.float32) * _cielab.AB_NORM
    d2 = _sq_dist_to_bins(ab, bins)  # (m, 313)
    neg_d2, idx = jax.lax.top_k(-d2, neighbours)  # (m, k)
    norm = 1.0 / (2.0 * math.pi * sigma)
    gauss = norm * jnp.exp(neg_d2 / (2.0 * sigma**2))
    gauss = gauss / jnp.sum(gauss, axis=-1, keepdims=True)
    # scatter as one-hot contraction: (m, k, 313) x (m, k) -> (m, 313)
    onehot = jax.nn.one_hot(idx, NUM_BINS, dtype=jnp.float32)
    q = jnp.einsum("mk,mkb->mb", gauss, onehot, precision="highest")
    return q.reshape(n, h, w, NUM_BINS)


def nearest_bin_index(batch_ab: jnp.ndarray) -> jnp.ndarray:
    """Hard-encode normalized ab (N, H, W, 2) -> nearest bin index (N, H, W).

    Equals ``argmax(encode_ab2ind(ab))`` (the Gaussian weight is monotone in
    distance) but skips the soft-encoding work; the reference computes token
    labels this way at model.py:120.
    """
    n, h, w, _ = batch_ab.shape
    bins = q_to_ab().astype(jnp.float32)
    ab = batch_ab.reshape(-1, 2).astype(jnp.float32) * _cielab.AB_NORM
    d2 = _sq_dist_to_bins(ab, bins)
    return jnp.argmin(d2, axis=-1).reshape(n, h, w)


@partial(jax.jit, static_argnames=("T",))
def decode_ind2ab(batch_q: jnp.ndarray, T: float = 0.38) -> jnp.ndarray:
    """Decode logits (N, H, W, 313) -> normalized ab (N, H, W, 2).

    Integer T: pick the T-th most probable bin's center (T=0 -> argmax).
    Fractional T: annealed-mean, softmax(softmax(logits)/T) expectation over bin
    centers (reference basic.py:196-218, default T=0.38).
    """
    probs = jax.nn.softmax(batch_q.astype(jnp.float32), axis=-1)
    bins = q_to_ab().astype(jnp.float32)
    if float(T) % 1 == 0:
        t = int(T)
        _, idx = jax.lax.top_k(probs, t + 1)  # (N, H, W, t+1), sorted descending
        ab = bins[idx[..., t]]
    else:
        q = jnp.exp(probs / T)
        q = q / jnp.sum(q, axis=-1, keepdims=True)
        # full-precision expectation: bin centers are ~1e2 in magnitude
        ab = jnp.einsum("...k,kc->...c", q, bins, precision="highest")
    return (ab / _cielab.AB_NORM).astype(batch_q.dtype)


def get_classweights(gt_index: jnp.ndarray, lambda_: float = 0.5) -> jnp.ndarray:
    """Per-position rebalancing weight for ground-truth bin indices (...,)."""
    return class_rebalance_weights(lambda_)[gt_index]


@jax.custom_vjp
def rebalance_gradient(logits: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """Identity forward; backward multiplies the incoming gradient by ``weights``.

    TPU-native equivalent of the reference RebalanceLoss autograd Function
    (basic.py:120-134): rare colors get proportionally larger gradients.
    ``weights`` broadcasts against ``logits`` and receives no gradient.
    """
    return logits


def _rebalance_fwd(logits, weights):
    return logits, weights


def _rebalance_bwd(weights, g):
    return g * weights, None


rebalance_gradient.defvjp(_rebalance_fwd, _rebalance_bwd)


def visualize_label(step: int = 3) -> jnp.ndarray:
    """A (200, 313*step, 3) normalized-Lab strip of every bin color (basic.py:159-166)."""
    bins = q_to_ab() / _cielab.AB_NORM
    height, width = 200, NUM_BINS * step
    ab_row = jnp.repeat(bins, step, axis=0)  # (313*step, 2)
    ab = jnp.broadcast_to(ab_row[None, :, :], (height, width, 2))
    l = jnp.zeros((height, width, 1), dtype=ab.dtype)
    return jnp.concatenate([l, ab], axis=-1)
