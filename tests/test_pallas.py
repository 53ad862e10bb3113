"""Pallas kernel tests (interpret mode on CPU): exact agreement with the jnp ops."""

import jax
import jax.numpy as jnp
import numpy as np

from disentangledcolorization_tpu.ops import pallas_superpixel as psp
from disentangledcolorization_tpu.ops import superpixel as sp


def _rand(rng, n=2, h=32, w=32, c=5):
    feat = rng.normal(size=(n, h, w, c)).astype(np.float32)
    prob = np.asarray(jax.nn.softmax(jnp.asarray(rng.normal(size=(n, h, w, 9)).astype(np.float32)), -1))
    return feat, prob


def test_pallas_poolfeat_matches_jnp():
    rng = np.random.default_rng(0)
    feat, prob = _rand(rng)
    ref, ref_mass = sp.poolfeat(jnp.asarray(feat), jnp.asarray(prob), 16, 16, True)
    out, mass = psp.poolfeat(jnp.asarray(feat), jnp.asarray(prob), 16, 16, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(mass), np.asarray(ref_mass), atol=1e-6)


def test_pallas_upfeat_matches_jnp():
    rng = np.random.default_rng(1)
    _, prob = _rand(rng)
    tok = rng.normal(size=(2, 2, 2, 5)).astype(np.float32)
    ref = sp.upfeat(jnp.asarray(tok), jnp.asarray(prob), 16, 16)
    out = psp.upfeat(jnp.asarray(tok), jnp.asarray(prob), 16, 16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pallas_poolfeat_sp8():
    rng = np.random.default_rng(2)
    feat, prob = _rand(rng, n=1, h=32, w=48, c=3)
    ref = sp.poolfeat(jnp.asarray(feat), jnp.asarray(prob), 8, 8)
    out = psp.poolfeat(jnp.asarray(feat), jnp.asarray(prob), 8, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pallas_upfeat_rect():
    rng = np.random.default_rng(3)
    prob = np.asarray(
        jax.nn.softmax(jnp.asarray(rng.normal(size=(1, 32, 64, 9)).astype(np.float32)), -1)
    )
    tok = rng.normal(size=(1, 2, 4, 7)).astype(np.float32)
    ref = sp.upfeat(jnp.asarray(tok), jnp.asarray(prob), 16, 16)
    out = psp.upfeat(jnp.asarray(tok), jnp.asarray(prob), 16, 16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pallas_encode_matches_jnp():
    from disentangledcolorization_tpu.ops import colorlabel as cl
    from disentangledcolorization_tpu.ops import pallas_colorlabel as pcl

    rng = np.random.default_rng(5)
    ab = jnp.asarray(rng.uniform(-0.5, 0.5, size=(2, 5, 7, 2)).astype(np.float32))
    ref = cl.encode_ab2ind(ab)
    out = pcl.encode_ab2ind(ab)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pallas_attention_matches_softmax():
    from disentangledcolorization_tpu.ops import pallas_attention as pattn

    rng = np.random.default_rng(6)
    n, t, d, h = 2, 16, 64, 8
    q = jnp.asarray(rng.normal(size=(n, t, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(n, t, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(n, t, d)).astype(np.float32))
    out = pattn.fused_attention(q, k, v, nhead=h)
    hd = d // h
    qh = q.reshape(n, t, h, hd)
    kh = k.reshape(n, t, h, hd)
    vh = v.reshape(n, t, h, hd)
    logits = jnp.einsum("nqhd,nkhd->nhqk", qh / np.sqrt(hd), kh)
    attn = jax.nn.softmax(logits, axis=-1)
    ref = jnp.einsum("nhqk,nkhd->nqhd", attn, vh).reshape(n, t, d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
