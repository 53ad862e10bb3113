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


def test_pallas_affinity_head_matches_xla():
    from disentangledcolorization_tpu.ops import pallas_affinity as pa

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, 16, 24, 16)).astype(np.float32))
    kernel = jnp.asarray(rng.normal(size=(3, 3, 16, 9)).astype(np.float32) * 0.2)
    bias = jnp.asarray(rng.normal(size=(9,)).astype(np.float32) * 0.1)
    ref = pa._xla_affinity_head(x, kernel, bias)
    out = pa.fused_affinity_head(x, kernel, bias)
    assert out.dtype == ref.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    # rows sum to one (it is a softmax)
    np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0, atol=1e-5)


def test_pallas_affinity_head_bf16_promotes_like_flax():
    from disentangledcolorization_tpu.ops import pallas_affinity as pa

    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 16))).astype(jnp.bfloat16)
    kernel = jnp.asarray(rng.normal(size=(3, 3, 16, 9)).astype(np.float32) * 0.2)
    bias = jnp.zeros((9,), jnp.float32)
    ref = pa._xla_affinity_head(x, kernel, bias)
    out = pa.fused_affinity_head(x, kernel, bias)
    assert out.dtype == ref.dtype == jnp.float32  # f32 params win the promotion
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_pallas_affinity_head_grad_routes_through_xla():
    from disentangledcolorization_tpu.ops import pallas_affinity as pa

    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 4)).astype(np.float32))
    kernel = jnp.asarray(rng.normal(size=(3, 3, 4, 9)).astype(np.float32) * 0.3)
    bias = jnp.asarray(rng.normal(size=(9,)).astype(np.float32) * 0.1)

    def loss_fused(x, k, b):
        return (pa.affinity_head(x, k, b) ** 2).sum()

    def loss_xla(x, k, b):
        return (pa._xla_affinity_head(x, k, b) ** 2).sum()

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(x, kernel, bias)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(x, kernel, bias)
    for a, b_ in zip(g_fused, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)


def test_spixelnet_fused_head_matches_xla_head(monkeypatch):
    from disentangledcolorization_tpu.models.spixelnet import SpixelSeg

    rng = np.random.default_rng(10)
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 1)).astype(np.float32))
    m = SpixelSeg()
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))

    monkeypatch.setenv("DISCO_SEG_HEAD", "xla")
    ref = m.apply(params, x)
    monkeypatch.setenv("DISCO_SEG_HEAD", "pallas")
    out = m.apply(params, x)
    assert out.shape == ref.shape and out.dtype == ref.dtype
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pallas_affinity_dispatch_guards(monkeypatch):
    from disentangledcolorization_tpu.ops import pallas_affinity as pa

    monkeypatch.setenv("DISCO_SEG_HEAD", "pallas")
    ok = jnp.zeros((1, 16, 16, 16))
    assert pa._fused_ok(ok)
    assert not pa._fused_ok(jnp.zeros((1, 18, 16, 16)))  # H % 8 != 0
    assert not pa._fused_ok(jnp.zeros((1, 2048, 2048, 16)))  # VMEM budget
    monkeypatch.setenv("DISCO_SEG_HEAD", "xla")
    assert not pa._fused_ok(ok)
    # retired kernel: default (unset) stays on the XLA head
    monkeypatch.delenv("DISCO_SEG_HEAD", raising=False)
    assert not pa._fused_ok(ok)


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
