"""Parity tests for hint ops, anchor color sampling, correlation merging, misc ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from disentangledcolorization_tpu.models import anchor
from disentangledcolorization_tpu.ops import hints as hints_ops
from disentangledcolorization_tpu.ops import misc


def test_dilate_seeds_matches_reference(reference_modules):
    torch = reference_modules["torch"]
    basic = reference_modules["basic"]
    rng = np.random.default_rng(0)
    gate = (rng.uniform(size=(2, 1, 16, 16)) > 0.9).astype(np.float32)
    ref = basic.dilate_seeds(torch.from_numpy(gate), kernel_size=3).numpy()
    ours = hints_ops.dilate_seeds(jnp.asarray(gate.transpose(0, 2, 3, 1)), 3)
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2), ref, atol=1e-6)


def test_mark_color_hints_matches_reference(reference_modules):
    torch = reference_modules["torch"]
    basic = reference_modules["basic"]
    rng = np.random.default_rng(1)
    grays = rng.uniform(-1, 1, (1, 1, 32, 32)).astype(np.float32)
    abs_ = rng.uniform(-0.5, 0.5, (1, 2, 32, 32)).astype(np.float32)
    gate = (rng.uniform(size=(1, 1, 32, 32)) > 0.95).astype(np.float32)
    ref = basic.mark_color_hints(
        torch.from_numpy(grays), torch.from_numpy(abs_), torch.from_numpy(gate),
        base_ABs=torch.from_numpy(abs_),
    ).numpy()
    ours = hints_ops.mark_color_hints(
        jnp.asarray(grays.transpose(0, 2, 3, 1)),
        jnp.asarray(abs_.transpose(0, 2, 3, 1)),
        jnp.asarray(gate.transpose(0, 2, 3, 1)),
        base_abs=jnp.asarray(abs_.transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2), ref, atol=1e-6)


@pytest.mark.parametrize("T", [0, 1, 2])
def test_sample_anchor_colors_matches_reference(reference_modules, T):
    torch = reference_modules["torch"]
    basic = reference_modules["basic"]
    anchor_gen = __import__("anchor_gen")
    labeler = basic.ColorLabel(device=torch.device("cpu"))
    aa = anchor_gen.AnchorAnalysis(mode="clustering", colorLabeler=labeler)
    rng = np.random.default_rng(2)
    logits = rng.normal(size=(1, 313, 4, 4)).astype(np.float32)
    prob = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    mask = np.zeros((1, 1, 4, 4), np.float32)
    ref = aa._sample_anchor_colors(torch.from_numpy(prob), torch.from_numpy(mask), T=T).numpy()
    ours = anchor.sample_anchor_colors(jnp.asarray(prob.transpose(0, 2, 3, 1)), T=T)
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2), ref, atol=1e-5)


def test_detect_correlation_matches_reference(reference_modules):
    torch = reference_modules["torch"]
    basic = reference_modules["basic"]
    anchor_gen = __import__("anchor_gen")
    labeler = basic.ColorLabel(device=torch.device("cpu"))
    aa = anchor_gen.AnchorAnalysis(mode="clustering", colorLabeler=labeler)
    rng = np.random.default_rng(3)
    n, c, h, w = 1, 16, 4, 4
    data = rng.normal(size=(n, c, h, w)).astype(np.float32)
    probs = rng.uniform(0.01, 1, size=(n, 313, h, w)).astype(np.float32)
    probs /= probs.sum(1, keepdims=True)
    # exactly 8 anchors (reference hard-codes K=8 in its debug readout)
    mask_flat = np.zeros(h * w, np.float32)
    mask_flat[rng.choice(h * w, 8, replace=False)] = 1
    mask = mask_flat.reshape(n, 1, h, w)
    ref_probs, _ = aa._detect_correlation(
        torch.from_numpy(data), torch.from_numpy(probs), torch.from_numpy(mask), thres=0.6
    )
    ours = anchor.detect_correlation(
        jnp.asarray(data.transpose(0, 2, 3, 1)),
        jnp.asarray(probs.transpose(0, 2, 3, 1)),
        jnp.asarray(mask.transpose(0, 2, 3, 1)),
        thres=0.6,
    )
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), ref_probs.numpy(), atol=1e-5
    )


def test_quantize_ste():
    x = jnp.asarray([0.2, 0.7, -1.4])
    y, vjp = jax.vjp(misc.quantize_ste, x)
    np.testing.assert_array_equal(np.asarray(y), [0.0, 1.0, -1.0])
    (g,) = vjp(jnp.ones(3))
    np.testing.assert_array_equal(np.asarray(g), [1.0, 1.0, 1.0])


def test_suck_and_spread_matches_reference(reference_modules):
    torch = reference_modules["torch"]
    basic = reference_modules["basic"]
    rng = np.random.default_rng(4)
    base = rng.normal(size=(2, 3, 8, 8)).astype(np.float32)
    segs = rng.uniform(size=(2, 5, 8, 8)).astype(np.float32)
    ref = basic.suck_and_spread(None, torch.from_numpy(base), torch.from_numpy(segs)).numpy()
    ours = misc.suck_and_spread(
        jnp.asarray(base.transpose(0, 2, 3, 1)), jnp.asarray(segs.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2), ref, atol=1e-5)


def test_user_hint_roundtrip(tmp_path):
    rng = np.random.default_rng(5)
    mask = (rng.uniform(size=(1, 16, 16, 1)) > 0.9).astype(np.float32)
    colors = rng.uniform(-0.4, 0.4, (1, 16, 16, 2)).astype(np.float32)
    misc.save_user_hints(str(tmp_path), mask, colors)
    m2, c2 = misc.load_user_hints(str(tmp_path))
    np.testing.assert_allclose(m2, mask, atol=0.01)
    # colors go through Lab->RGB->PNG->RGB->Lab with L=0: coarse but monotone
    assert c2.shape == (1, 16, 16, 2)


def test_random_mask_counts():
    m = hints_ops.get_random_mask(jax.random.key(0), 4, 8, 8, 3, 7)
    counts = np.asarray(m).sum(axis=(1, 2, 3))
    assert ((counts >= 3) & (counts <= 7)).all()
    assert set(np.unique(np.asarray(m))) <= {0.0, 1.0}
