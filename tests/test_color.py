"""L0 color-science tests: LUT construction, conversion chains, parity vs reference."""

import jax.numpy as jnp
import numpy as np
import pytest

from disentangledcolorization_tpu.utils import cielab, color


def test_gamut_assets():
    g = cielab.ABGamut()
    assert g.points.shape == (313, 2)
    assert g.prior.shape == (313,)
    np.testing.assert_allclose(g.prior.sum(), 1.0, atol=1e-5)


def test_cielab_luts():
    c = cielab.default_cielab()
    assert c.q_to_ab.shape == (313, 2)
    assert c.ab_to_q.shape == (23, 23)
    assert int((c.ab_to_q >= 0).sum()) == 313
    # bin centers round-trip through hard binning
    q = c.bin_ab(c.q_to_ab)
    np.testing.assert_array_equal(q, np.arange(313))


def test_class_rebalance_weights_normalized():
    w = cielab.class_rebalance_weights(0.5)
    prior = cielab.default_cielab().gamut.prior
    np.testing.assert_allclose(np.sum(prior * w), 1.0, rtol=1e-5)
    assert np.all(w > 0)


def test_lab_range_of_rgb_cube():
    """Sweep an RGB lattice through rgb2lab; ranges must match the documented
    reference ranges L=[0,100], a=[-86.18, 98.23], b=[-107.86, 94.48]
    (reference basic.py:393, verified by its __main__ sweep)."""
    grid = np.linspace(0, 1, 24, dtype=np.float32)
    r, g, b = np.meshgrid(grid, grid, grid, indexing="ij")
    rgb = np.stack([r, g, b], -1).reshape(1, -1, 1, 3)
    lab = np.asarray(color.rgb2lab(jnp.asarray(rgb)))
    L = lab[..., 0] * 50 + 50
    a = lab[..., 1] * 110
    bb = lab[..., 2] * 110
    assert -1e-3 <= L.min() and L.max() <= 100.001
    assert -87 < a.min() and a.max() < 99
    assert -108 < bb.min() and bb.max() < 95


def test_rgb_lab_roundtrip():
    rng = np.random.default_rng(0)
    rgb = rng.uniform(0.02, 0.98, size=(2, 8, 8, 3)).astype(np.float32)
    back = np.asarray(color.lab2rgb(color.rgb2lab(jnp.asarray(rgb))))
    np.testing.assert_allclose(back, rgb, atol=2e-3)


def test_rgb2lab_matches_reference(reference_modules):
    torch = reference_modules["torch"]
    basic = reference_modules["basic"]
    rng = np.random.default_rng(1)
    rgb = rng.uniform(0, 1, size=(2, 3, 16, 16)).astype(np.float32)
    ref = basic.rgb2lab(torch.from_numpy(rgb)).numpy()  # NCHW
    ours = np.asarray(color.rgb2lab(jnp.asarray(rgb.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref, atol=1e-4)


def test_lab2rgb_matches_reference(reference_modules):
    torch = reference_modules["torch"]
    basic = reference_modules["basic"]
    rng = np.random.default_rng(2)
    lab = rng.uniform(-0.6, 0.6, size=(2, 3, 16, 16)).astype(np.float32)
    ref = basic.lab2rgb(torch.from_numpy(lab)).numpy()
    ours = np.asarray(color.lab2rgb(jnp.asarray(lab.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref, atol=1e-4)


def test_luts_match_reference(reference_modules):
    ref = reference_modules["cielab"].CIELAB()
    ours = cielab.CIELAB()
    np.testing.assert_allclose(ours.q_to_ab, ref.q_to_ab, atol=1e-6)
    np.testing.assert_array_equal(ours.ab_to_q, ref.ab_to_q)
