"""Soft color encode/decode tests: properties + parity vs reference ColorLabel."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from disentangledcolorization_tpu.ops import colorlabel as cl


def _rand_ab(rng, n=1, h=4, w=4):
    # normalized ab in a safe in-gamut-ish range
    return rng.uniform(-0.5, 0.5, size=(n, h, w, 2)).astype(np.float32)


def test_encode_is_distribution():
    rng = np.random.default_rng(0)
    ab = jnp.asarray(_rand_ab(rng, 2, 8, 8))
    q = np.asarray(cl.encode_ab2ind(ab))
    assert q.shape == (2, 8, 8, 313)
    np.testing.assert_allclose(q.sum(-1), 1.0, atol=1e-5)
    assert (q >= 0).all()
    # exactly 5 nonzero entries per position
    assert int((q[0, 0, 0] > 0).sum()) == 5


def test_encode_decode_roundtrip_within_binsize():
    """argmax(encode(ab)) decodes to an ab within one bin of the input."""
    rng = np.random.default_rng(1)
    ab = _rand_ab(rng, 1, 8, 8)
    q = cl.encode_ab2ind(jnp.asarray(ab))
    # logits = log-probs, T=0 decode picks argmax bin
    dec = np.asarray(cl.decode_ind2ab(jnp.log(q + 1e-9), T=0))
    err = np.abs(dec - ab) * 110.0
    assert err.max() <= 10.0  # within bin size


def test_nearest_bin_matches_encode_argmax():
    rng = np.random.default_rng(2)
    ab = jnp.asarray(_rand_ab(rng, 2, 8, 8))
    q = cl.encode_ab2ind(ab)
    np.testing.assert_array_equal(
        np.asarray(cl.nearest_bin_index(ab)), np.asarray(jnp.argmax(q, axis=-1))
    )


def test_rebalance_gradient():
    x = jnp.ones((2, 3))
    w = jnp.asarray([[2.0, 3.0, 4.0], [1.0, 1.0, 1.0]])
    y, vjp = jax.vjp(lambda a: cl.rebalance_gradient(a, w), x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x))
    (gx,) = vjp(jnp.ones_like(x))
    np.testing.assert_allclose(np.asarray(gx), np.asarray(w))


def test_encode_matches_reference(reference_modules):
    torch = reference_modules["torch"]
    basic = reference_modules["basic"]
    labeler = basic.ColorLabel(device=torch.device("cpu"))
    rng = np.random.default_rng(3)
    ab = _rand_ab(rng, 2, 4, 4)
    ref = labeler.encode_ab2ind(torch.from_numpy(ab.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(cl.encode_ab2ind(jnp.asarray(ab)))
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref, atol=1e-4)


def test_decode_matches_reference_annealed(reference_modules):
    torch = reference_modules["torch"]
    basic = reference_modules["basic"]
    labeler = basic.ColorLabel(device=torch.device("cpu"))
    rng = np.random.default_rng(4)
    logits = rng.normal(size=(2, 313, 4, 4)).astype(np.float32)
    ref = labeler.decode_ind2ab(torch.from_numpy(logits), T=0.38).numpy()
    ours = np.asarray(cl.decode_ind2ab(jnp.asarray(logits.transpose(0, 2, 3, 1)), T=0.38))
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref, atol=1e-4)


def test_decode_matches_reference_topk(reference_modules):
    torch = reference_modules["torch"]
    basic = reference_modules["basic"]
    labeler = basic.ColorLabel(device=torch.device("cpu"))
    rng = np.random.default_rng(5)
    logits = rng.normal(size=(1, 313, 4, 4)).astype(np.float32)
    for t in (0, 1, 2):
        ref = labeler.decode_ind2ab(torch.from_numpy(logits), T=t).numpy()
        ours = np.asarray(cl.decode_ind2ab(jnp.asarray(logits.transpose(0, 2, 3, 1)), T=t))
        np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref, atol=1e-4)


def test_classweights_match_reference(reference_modules):
    torch = reference_modules["torch"]
    basic = reference_modules["basic"]
    labeler = basic.ColorLabel(device=torch.device("cpu"))
    idx = np.array([[0, 5], [100, 312]], dtype=np.int64)
    ref = labeler.get_classweights(torch.from_numpy(idx)).numpy()
    ours = np.asarray(cl.get_classweights(jnp.asarray(idx)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_classweights_colorfulness_lambda_matches_reference(reference_modules):
    """--colorfulness threading: lambda_ = 1 - colorfulness (the DISCO-c0.2
    recipe is --colorfulness 0.2 -> lambda_ 0.8; train_colorizer.py:270-271)."""
    torch = reference_modules["torch"]
    basic = reference_modules["basic"]
    idx = np.array([[0, 50], [200, 312]], dtype=np.int64)
    for colorfulness in (0.2, 0.5, 0.9):
        lam = 1.0 - colorfulness
        labeler = basic.ColorLabel(lambda_=lam, device=torch.device("cpu"))
        ref = labeler.get_classweights(torch.from_numpy(idx)).numpy()
        ours = np.asarray(cl.get_classweights(jnp.asarray(idx), lam))
        np.testing.assert_allclose(ours, ref, rtol=1e-5)
    # smaller lambda (higher colorfulness) upweights rare colors more
    w_low = np.asarray(cl.get_classweights(jnp.asarray(idx), 0.2)).max()
    w_high = np.asarray(cl.get_classweights(jnp.asarray(idx), 0.8)).max()
    assert w_low > w_high
