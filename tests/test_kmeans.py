"""K-means tests: clustering quality on separable data + shape/one-hot properties."""

import jax
import jax.numpy as jnp
import numpy as np

from disentangledcolorization_tpu.ops import kmeans as km


def _blobs(rng, k=4, per=64, c=8, spread=0.05):
    centers = rng.normal(size=(k, c)).astype(np.float32) * 3
    pts = np.concatenate(
        [centers[i] + spread * rng.normal(size=(per, c)).astype(np.float32) for i in range(k)]
    )
    labels = np.repeat(np.arange(k), per)
    return pts, labels, centers


def test_kmeans_recovers_separable_blobs():
    rng = np.random.default_rng(0)
    pts, labels, _ = _blobs(rng)
    assign, centers = km.kmeans(jax.random.key(0), jnp.asarray(pts), 4, iter_limit=20)
    assign = np.asarray(assign)
    # each true blob maps to exactly one predicted cluster
    for i in range(4):
        blob_assign = assign[labels == i]
        assert len(np.unique(blob_assign)) == 1
    # and the mapping is a bijection
    assert len(np.unique([assign[labels == i][0] for i in range(4)])) == 4


def test_batch_kmeans_masks_onehot():
    rng = np.random.default_rng(1)
    data = rng.normal(size=(2, 16, 16, 6)).astype(np.float32)
    masks = np.asarray(km.batch_kmeans_masks(jax.random.key(1), jnp.asarray(data), 8))
    assert masks.shape == (2, 16, 16, 8)
    np.testing.assert_allclose(masks.sum(-1), 1.0)
    assert set(np.unique(masks)) <= {0.0, 1.0}


def test_kmeans_handles_fewer_unique_points_than_clusters():
    """Degenerate data (all points equal) must not NaN: empty clusters re-init."""
    x = jnp.ones((32, 4))
    assign, centers = km.kmeans(jax.random.key(2), x, 8, iter_limit=20)
    assert np.isfinite(np.asarray(centers)).all()
    assert np.asarray(assign).shape == (32,)


def test_kmeans_predict_assigns_nearest():
    centers = jnp.asarray([[0.0, 0.0], [10.0, 10.0]])
    x = jnp.asarray([[0.1, -0.1], [9.0, 11.0], [0.0, 0.2]])
    np.testing.assert_array_equal(np.asarray(km.kmeans_predict(x, centers)), [0, 1, 0])


def test_kmeans_deterministic_per_key():
    rng = np.random.default_rng(3)
    data = jnp.asarray(rng.normal(size=(1, 16, 16, 6)).astype(np.float32))
    a = np.asarray(km.batch_kmeans_masks(jax.random.key(7), data, 8))
    b = np.asarray(km.batch_kmeans_masks(jax.random.key(7), data, 8))
    np.testing.assert_array_equal(a, b)
