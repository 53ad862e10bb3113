"""L1 superpixel op tests: properties + exact parity vs the reference fusions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from disentangledcolorization_tpu.ops import superpixel as sp


def _rand_prob(rng, n, h, w):
    logits = rng.normal(size=(n, h, w, 9)).astype(np.float32)
    return np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))


def test_poolfeat_uniform_prob_recovers_mean():
    """With all probability on 'center', pooling is a plain block mean."""
    rng = np.random.default_rng(0)
    feat = rng.normal(size=(2, 32, 32, 5)).astype(np.float32)
    prob = np.zeros((2, 32, 32, 9), np.float32)
    prob[..., 4] = 1.0  # center
    pooled = np.asarray(sp.poolfeat(jnp.asarray(feat), jnp.asarray(prob), 16, 16))
    expected = feat.reshape(2, 2, 16, 2, 16, 5).mean(axis=(2, 4))
    np.testing.assert_allclose(pooled, expected, atol=1e-5)


def test_upfeat_center_prob_is_nearest_upsample():
    rng = np.random.default_rng(1)
    tok = rng.normal(size=(2, 2, 2, 3)).astype(np.float32)
    prob = np.zeros((2, 32, 32, 9), np.float32)
    prob[..., 4] = 1.0
    up = np.asarray(sp.upfeat(jnp.asarray(tok), jnp.asarray(prob), 16, 16))
    expected = tok.repeat(16, axis=1).repeat(16, axis=2)
    np.testing.assert_allclose(up, expected, atol=1e-6)


def test_upfeat_partition_of_unity():
    """Unpooling a constant token map through any softmax affinity stays constant
    away from the border (interior pixels see all 9 neighbors)."""
    rng = np.random.default_rng(2)
    prob = _rand_prob(rng, 1, 64, 64)
    tok = np.ones((1, 4, 4, 1), np.float32)
    up = np.asarray(sp.upfeat(jnp.asarray(tok), jnp.asarray(prob), 16, 16))
    interior = up[:, 16:-16, 16:-16, :]
    np.testing.assert_allclose(interior, 1.0, atol=1e-5)


def test_poolfeat_matches_reference(reference_modules):
    torch = reference_modules["torch"]
    basic = reference_modules["basic"]
    rng = np.random.default_rng(3)
    feat = rng.normal(size=(2, 5, 32, 32)).astype(np.float32)  # NCHW for reference
    prob = np.asarray(_rand_prob(rng, 2, 32, 32)).transpose(0, 3, 1, 2)
    ref, ref_mass = basic.poolfeat(
        torch.from_numpy(feat), torch.from_numpy(prob), 16, 16, True
    )
    ours, mass = sp.poolfeat(
        jnp.asarray(feat.transpose(0, 2, 3, 1)), jnp.asarray(prob.transpose(0, 2, 3, 1)), 16, 16, True
    )
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), ref.numpy(), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(mass).transpose(0, 3, 1, 2), ref_mass.numpy(), atol=1e-5
    )


def test_upfeat_matches_reference(reference_modules):
    torch = reference_modules["torch"]
    basic = reference_modules["basic"]
    rng = np.random.default_rng(4)
    tok = rng.normal(size=(2, 7, 2, 2)).astype(np.float32)
    prob = np.asarray(_rand_prob(rng, 2, 32, 32)).transpose(0, 3, 1, 2)
    ref = basic.upfeat(torch.from_numpy(tok), torch.from_numpy(prob), 16, 16)
    ours = sp.upfeat(
        jnp.asarray(tok.transpose(0, 2, 3, 1)), jnp.asarray(prob.transpose(0, 2, 3, 1)), 16, 16
    )
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2), ref.numpy(), atol=1e-5)


def test_get_spixel_size_matches_reference(reference_modules):
    torch = reference_modules["torch"]
    basic = reference_modules["basic"]
    rng = np.random.default_rng(5)
    prob = np.asarray(_rand_prob(rng, 1, 32, 32)).transpose(0, 3, 1, 2)
    ref = basic.get_spixel_size(torch.from_numpy(prob), 16, 16)
    ours = sp.get_spixel_size(jnp.asarray(prob.transpose(0, 2, 3, 1)), 16, 16)
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2), ref.numpy(), atol=1e-5)


def test_init_spixel_grid_matches_reference(reference_modules):
    basic = reference_modules["basic"]
    ref_ids, ref_coord = basic.init_spixel_grid(64, 64, 16)
    ids, coord = sp.init_spixel_grid(64, 64, 16)
    np.testing.assert_allclose(np.asarray(ids).transpose(2, 0, 1), ref_ids.numpy(), atol=0)
    np.testing.assert_allclose(np.asarray(coord).transpose(2, 0, 1), ref_coord.numpy(), atol=0)


def test_split_spixels_matches_reference(reference_modules):
    torch = reference_modules["torch"]
    basic = reference_modules["basic"]
    rng = np.random.default_rng(6)
    prob = np.asarray(_rand_prob(rng, 1, 32, 32)).transpose(0, 3, 1, 2)
    ref_ids, _ = basic.init_spixel_grid(32, 32, 16)
    ref = basic.split_spixels(torch.from_numpy(prob), ref_ids)
    ids, _ = sp.init_spixel_grid(32, 32, 16)
    ours = sp.split_spixels(jnp.asarray(prob.transpose(0, 2, 3, 1)), ids)
    np.testing.assert_array_equal(
        np.asarray(ours).squeeze(-1), ref.numpy().squeeze(1).astype(np.int32)
    )


def test_poolfeat_grad_flows():
    rng = np.random.default_rng(7)
    feat = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
    prob = jnp.asarray(_rand_prob(rng, 1, 32, 32))

    def loss(f, p):
        return jnp.sum(sp.poolfeat(f, p, 16, 16) ** 2)

    gf, gp = jax.grad(loss, argnums=(0, 1))(feat, prob)
    assert np.isfinite(np.asarray(gf)).all() and np.isfinite(np.asarray(gp)).all()
    assert float(jnp.abs(gf).sum()) > 0 and float(jnp.abs(gp).sum()) > 0
