"""Fixed-iteration Lloyd's k-means, fully jittable and vmapped over the batch.

Capability parity with the vendored kmeans_pytorch loop the reference uses for
anchor-location clustering (/root/reference/models/clusterkit.py:99-208 and the
batch wrapper at 31-58), re-designed for XLA:

  * data-dependent ``while center_shift < tol`` becomes a fixed ``iter_limit``
    ``lax.fori_loop`` (the reference caps at 20 iterations on this path anyway,
    clusterkit.py:40); convergence earlier just makes iterations no-ops.
  * random init / empty-cluster reinit use explicit jax.random keys threaded
    from the CLI seed. Seed-for-seed parity with torch RNG is impossible by
    construction; parity is distributional/perceptual.
  * the per-image python loop in batch_kmeans_pytorch becomes ``vmap``.

Assignment and the per-cluster mean are one (M, K) matmul each -> MXU-friendly.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _pairwise_sq_dist(x: jnp.ndarray, centers: jnp.ndarray) -> jnp.ndarray:
    """(M, C), (K, C) -> (M, K) squared euclidean distances (full precision:
    TPU default-bf16 matmuls would perturb assignment boundaries)."""
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)
    c2 = jnp.sum(centers * centers, axis=-1)
    return x2 - 2.0 * jnp.einsum("mc,kc->mk", x, centers, precision="highest") + c2[None, :]


def _pairwise_cosine_dist(x: jnp.ndarray, centers: jnp.ndarray) -> jnp.ndarray:
    xn = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)
    cn = centers / (jnp.linalg.norm(centers, axis=-1, keepdims=True) + 1e-12)
    return 1.0 - xn @ cn.T


def _kmeans_pp_init(key: jax.Array, x: jnp.ndarray, k: int, dist_fn) -> jnp.ndarray:
    """K-means++ seeding: each next center sampled with prob ~ D^2.

    A deliberate upgrade over the reference's uniform random-choice init
    (clusterkit.py:99-109): same cost class (k tiny), much better local optima
    and far less seed sensitivity, which the reference README itself flags
    (README.md:81-82).
    """
    m = x.shape[0]
    keys = jax.random.split(key, k)
    first = jax.random.randint(keys[0], (), 0, m)
    centers = jnp.zeros((k, x.shape[1]), x.dtype).at[0].set(x[first])
    min_d = dist_fn(x, x[first][None, :])[:, 0]
    for i in range(1, k):
        probs = jnp.maximum(min_d, 0.0)
        probs = probs / jnp.maximum(jnp.sum(probs), 1e-12)
        idx = jax.random.choice(keys[i], m, (), p=probs)
        centers = centers.at[i].set(x[idx])
        min_d = jnp.minimum(min_d, dist_fn(x, x[idx][None, :])[:, 0])
    return centers


@partial(jax.jit, static_argnames=("num_clusters", "iter_limit", "metric", "init"))
def kmeans(
    key: jax.Array,
    x: jnp.ndarray,
    num_clusters: int,
    iter_limit: int = 20,
    metric: str = "euclidean",
    init: str = "kmeans++",
):
    """Cluster (M, C) points into ``num_clusters`` groups.

    Returns (assignments (M,) int32, centers (K, C)).
    """
    m = x.shape[0]
    x = x.astype(jnp.float32)
    dist_fn = _pairwise_sq_dist if metric == "euclidean" else _pairwise_cosine_dist
    init_key, loop_key = jax.random.split(key)
    if init == "kmeans++":
        centers0 = _kmeans_pp_init(init_key, x, num_clusters, dist_fn)
    else:  # 'random': the reference's uniform no-replacement choice
        init_idx = jax.random.choice(init_key, m, (num_clusters,), replace=False)
        centers0 = x[init_idx]

    def body(i, centers):
        d = dist_fn(x, centers)
        assign = jnp.argmin(d, axis=-1)
        onehot = jax.nn.one_hot(assign, num_clusters, dtype=jnp.float32)  # (M, K)
        counts = jnp.sum(onehot, axis=0)  # (K,)
        sums = jnp.einsum("mk,mc->kc", onehot, x, precision="highest")  # (K, C)
        means = sums / jnp.maximum(counts, 1.0)[:, None]
        # empty clusters restart at a random point (clusterkit.py:181-182)
        rk = jax.random.fold_in(loop_key, i)
        rand_idx = jax.random.randint(rk, (num_clusters,), 0, m)
        return jnp.where(counts[:, None] > 0, means, x[rand_idx])

    centers = jax.lax.fori_loop(0, iter_limit, body, centers0)
    assign = jnp.argmin(dist_fn(x, centers), axis=-1).astype(jnp.int32)
    return assign, centers


@partial(jax.jit, static_argnames=("num_clusters", "iter_limit", "metric"))
def batch_kmeans_masks(
    key: jax.Array,
    data: jnp.ndarray,
    num_clusters: int,
    iter_limit: int = 20,
    metric: str = "euclidean",
) -> jnp.ndarray:
    """Per-image k-means over NHWC features -> one-hot cluster masks.

    Args:
      data: (N, H, W, C) feature maps; each image is clustered independently.
    Returns:
      (N, H, W, K) float one-hot cluster masks (reference batch_kmeans_pytorch
      + tensor_kmeans_pytorch, clusterkit.py:31-58).
    """
    n, h, w, c = data.shape
    keys = jax.random.split(key, n)
    flat = data.reshape(n, h * w, c)

    def one(k, xi):
        assign, _ = kmeans(k, xi, num_clusters, iter_limit, metric)
        return jax.nn.one_hot(assign, num_clusters, dtype=jnp.float32)

    masks = jax.vmap(one)(keys, flat)  # (N, HW, K)
    return masks.reshape(n, h, w, num_clusters)


@partial(jax.jit, static_argnames=("num_clusters", "iter_limit", "metric"))
def batch_kmeans_centers(
    key: jax.Array,
    data: jnp.ndarray,
    num_clusters: int,
    iter_limit: int = 20,
    metric: str = "euclidean",
) -> jnp.ndarray:
    """Per-image cluster centroids (N, K, C) (reference get_centroid_candidates)."""
    n, h, w, c = data.shape
    keys = jax.random.split(key, n)
    flat = data.reshape(n, h * w, c)

    def one(k, xi):
        _, centers = kmeans(k, xi, num_clusters, iter_limit, metric)
        return centers

    return jax.vmap(one)(keys, flat)


@partial(jax.jit, static_argnames=("metric",))
def kmeans_predict(x: jnp.ndarray, centers: jnp.ndarray, metric: str = "euclidean") -> jnp.ndarray:
    """Assign-only k-means (reference kmeans_predict, clusterkit.py:211-250)."""
    dist_fn = _pairwise_sq_dist if metric == "euclidean" else _pairwise_cosine_dist
    return jnp.argmin(dist_fn(x.astype(jnp.float32), centers.astype(jnp.float32)), axis=-1)


@partial(jax.jit, static_argnames=("num_clusters", "topk", "metric"))
def find_distinctive_elements(
    key: jax.Array,
    data: jnp.ndarray,
    num_clusters: int = 7,
    topk: int = 3,
    metric: str = "euclidean",
) -> jnp.ndarray:
    """Top-k nearest elements per centroid as (N, H, W, K) masks.

    Parity with reference find_distinctive_elements (clusterkit.py:69-90),
    which is unused by the main path but part of the public surface.
    """
    n, h, w, c = data.shape
    centers = batch_kmeans_centers(key, data, num_clusters, metric=metric)  # (N, K, C)
    flat = data.reshape(n, h * w, c).astype(jnp.float32)

    def one(xi, ci):
        d = _pairwise_sq_dist(xi, ci).T  # (K, HW)
        kth = -jax.lax.top_k(-d, topk)[0][:, topk - 1 :]  # (K, 1) k-th smallest
        return (d <= kth).astype(jnp.float32)

    masks = jax.vmap(one)(flat, centers)  # (N, K, HW)
    return masks.reshape(n, num_clusters, h, w).transpose(0, 2, 3, 1)
