"""Network module tests: shapes, determinism, and reference-matching semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from disentangledcolorization_tpu.models import (
    ColorProbNet,
    HourGlass2,
    SpixelSeg,
    TransformerEncoder,
    sine_position_encoding,
)
from disentangledcolorization_tpu.models.layers import Conv, Deconv, SNConv


def test_spixelseg_shapes_and_softmax():
    m = SpixelSeg()
    x = jnp.zeros((1, 64, 64, 1))
    variables = m.init(jax.random.key(0), x)
    y = m.apply(variables, x)
    assert y.shape == (1, 64, 64, 9)
    np.testing.assert_allclose(np.asarray(y.sum(-1)), 1.0, atol=1e-5)


def test_colorprobnet_shapes():
    m = ColorProbNet(out_channels=64)
    x = jnp.zeros((1, 64, 64, 1))
    variables = m.init(jax.random.key(0), x)
    y = m.apply(variables, x)
    assert y.shape == (1, 64, 64, 64)
    # spectral-norm state exists
    assert "spectral" in variables


def test_hourglass_shapes():
    m = HourGlass2(out_channels=2)
    x = jnp.zeros((1, 64, 64, 65))
    variables = m.init(jax.random.key(0), x)
    y = m.apply(variables, x)
    assert y.shape == (1, 64, 64, 2)


def test_transformer_encoder_shapes():
    m = TransformerEncoder(num_layers=2, d_model=64, nhead=8, dim_feedforward=256)
    x = jnp.zeros((2, 16, 64))
    pos = jnp.zeros((2, 16, 64))
    variables = m.init(jax.random.key(0), x, pos)
    y, attn = m.apply(variables, x, pos)
    assert y.shape == (2, 16, 64)
    assert attn.shape == (2, 8, 16, 16)
    # independent layer weights (reference deep-copies layers)
    p = variables["params"]
    assert "layer0" in p and "layer1" in p
    w0 = p["layer0"]["self_attn"]["in_proj_weight"]
    w1 = p["layer1"]["self_attn"]["in_proj_weight"]
    assert not np.allclose(np.asarray(w0), np.asarray(w1))


def test_sine_position_encoding_matches_reference(reference_modules):
    torch = reference_modules["torch"]
    import importlib

    pe_mod = importlib.import_module("position_encoding")
    ref_pe = pe_mod.PositionEmbeddingSine(32, normalize=True)
    ref = ref_pe(torch.zeros(1, 64, 16, 16)).numpy()  # (1, C, H, W)
    ours = np.asarray(sine_position_encoding(16, 16, 32))
    np.testing.assert_allclose(ours.transpose(2, 0, 1), ref[0], atol=1e-5)


def test_conv_matches_torch_stride2(reference_modules):
    """Explicit padding must equal torch Conv2d(padding=1, stride=2)."""
    torch = reference_modules["torch"]
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 3, 8, 8)).astype(np.float32)
    w = rng.normal(size=(5, 3, 3, 3)).astype(np.float32) * 0.2
    b = rng.normal(size=(5,)).astype(np.float32)
    tconv = torch.nn.Conv2d(3, 5, 3, stride=2, padding=1)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(w))
        tconv.bias.copy_(torch.from_numpy(b))
    ref = tconv(torch.from_numpy(x)).detach().numpy()

    m = Conv(5, kernel_size=3, stride=2)
    variables = m.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
    variables = jax.tree_util.tree_map(lambda a: a, variables)
    params = {"conv": {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)), "bias": jnp.asarray(b)}}
    y = m.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(y).transpose(0, 3, 1, 2), ref, atol=1e-5)


def test_deconv_matches_torch(reference_modules):
    """lhs-dilated conv must equal torch ConvTranspose2d(k=4, s=2, p=1)."""
    torch = reference_modules["torch"]
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 3, 8, 8)).astype(np.float32)
    w = rng.normal(size=(3, 5, 4, 4)).astype(np.float32) * 0.2  # torch: (I, O, kh, kw)
    b = rng.normal(size=(5,)).astype(np.float32)
    tconv = torch.nn.ConvTranspose2d(3, 5, 4, stride=2, padding=1)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(w))
        tconv.bias.copy_(torch.from_numpy(b))
    ref = tconv(torch.from_numpy(x)).detach().numpy()

    # converter mapping: flip spatial, (I, O, kh, kw) -> (kh, kw, I, O)
    wk = w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1).copy()
    m = Deconv(5)
    params = {"kernel": jnp.asarray(wk), "bias": jnp.asarray(b)}
    y = m.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert y.shape == (1, 16, 16, 5)
    np.testing.assert_allclose(np.asarray(y).transpose(0, 3, 1, 2), ref, atol=1e-5)


def test_snconv_normalizes_spectral_norm():
    """After many power iterations the effective weight's top singular value ~ 1."""
    m = SNConv(8, kernel_size=3)
    x = jnp.ones((1, 8, 8, 4))
    variables = m.init(jax.random.key(0), x)
    params, spectral = variables["params"], variables["spectral"]
    # scale kernel up so sigma >> 1
    params = jax.tree_util.tree_map(lambda a: a * 10 if a.ndim == 4 else a, params)
    for _ in range(30):
        y, mut = m.apply(
            {"params": params, "spectral": spectral}, x, True, mutable=["spectral"]
        )
        spectral = mut["spectral"]
    k = np.asarray(params["kernel"]).reshape(-1, 8)
    u = np.asarray(spectral["u"])
    sigma = np.linalg.svd(k.T, compute_uv=False)[0]
    # effective weight = kernel / sigma_est; check sigma_est ~ true sigma
    v = k @ u
    v /= np.linalg.norm(v)
    u2 = k.T @ v  # note: our W_mat = kernel.reshape(-1, O).T, shape (O, HWI)
    sigma_est = np.linalg.norm(u2)
    np.testing.assert_allclose(sigma_est, sigma, rtol=1e-3)


def test_mha_matches_torch(reference_modules):
    torch = reference_modules["torch"]
    from disentangledcolorization_tpu.models import MultiheadAttention

    d, h, n, t = 64, 8, 2, 16
    rng = np.random.default_rng(2)
    x = rng.normal(size=(t, n, d)).astype(np.float32)  # torch layout (T, N, C)
    tm = torch.nn.MultiheadAttention(d, h, dropout=0.0)
    tm.eval()
    with torch.no_grad():
        ref, _ = tm(torch.from_numpy(x), torch.from_numpy(x), torch.from_numpy(x))
    ref = ref.numpy()

    params = {
        "in_proj_weight": jnp.asarray(tm.in_proj_weight.detach().numpy()),
        "in_proj_bias": jnp.asarray(tm.in_proj_bias.detach().numpy()),
        "out_proj": {
            "kernel": jnp.asarray(tm.out_proj.weight.detach().numpy().T),
            "bias": jnp.asarray(tm.out_proj.bias.detach().numpy()),
        },
    }
    m = MultiheadAttention(d, h, dropout=0.0)
    xb = jnp.asarray(x.transpose(1, 0, 2))  # (N, T, C)
    y, _ = m.apply({"params": params}, xb, xb, xb)
    np.testing.assert_allclose(np.asarray(y).transpose(1, 0, 2), ref, atol=2e-5)


def test_spixelnet_s2d_matches_standard():
    """Space-to-depth SpixelSeg forward (models/spixelnet_s2d.py) is a
    weight-exact relayout: identical affinity to f32 round-off, including
    non-square inputs and every boundary phase."""
    from disentangledcolorization_tpu.models import spixelnet_s2d as ss
    from disentangledcolorization_tpu.models.spixelnet import SpixelSeg

    rng = np.random.default_rng(0)
    for shape in [(2, 64, 48, 1), (1, 32, 32, 1)]:
        x = jnp.asarray(rng.uniform(-1, 1, shape).astype(np.float32))
        seg = SpixelSeg(batch_norm=True, train=False)
        variables = seg.init(jax.random.key(0), x)
        ref = np.asarray(seg.apply(variables, x))
        fast = np.asarray(ss.apply_s2d(variables, x))
        np.testing.assert_allclose(fast, ref, atol=2e-6)
        assert not (np.argmax(ref, -1) != np.argmax(fast, -1)).any()


def test_disco_fast_seg_matches_default():
    """AnchorColorProb(fast_seg=True) reproduces the default forward at f32
    (same params via the dummy-materialization path)."""
    from disentangledcolorization_tpu.models import AnchorColorProb

    rng = np.random.default_rng(1)
    grays = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 1)).astype(np.float32))
    colors = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 2)).astype(np.float32))
    kw = dict(sp_size=16, n_clusters=2, enhanced=True)
    m0 = AnchorColorProb(fast_seg=False, **kw)
    m1 = AnchorColorProb(fast_seg=True, **kw)
    keys = {"params": jax.random.key(0), "anchor": jax.random.key(1)}
    v0 = m0.init(keys, grays, colors, True, 0, False)
    out0 = m0.apply(v0, grays, colors, True, 0, False, rngs={"anchor": jax.random.key(2)})
    # same variable tree (dummy call materializes identical param structure)
    out1 = m1.apply(v0, grays, colors, True, 0, False, rngs={"anchor": jax.random.key(2)})
    np.testing.assert_allclose(
        np.asarray(out1["affinity_map"]), np.asarray(out0["affinity_map"]), atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(out1["pred_colors"]), np.asarray(out0["pred_colors"]), atol=1e-4
    )


def test_fused_upsample_conv_matches_naive():
    from disentangledcolorization_tpu.models import layers as L

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(2, 8, 12, 16)).astype(np.float32))
    kernel = jnp.asarray(rng.normal(size=(3, 3, 16, 24)).astype(np.float32) * 0.2)
    bias = jnp.asarray(rng.normal(size=(24,)).astype(np.float32) * 0.1)

    up = L.upsample_nearest_2x(x)
    ref = jax.lax.conv_general_dilated(
        up, kernel, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + bias
    out = L.fused_upsample_conv(x, kernel, bias)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_padded_out_conv_matches_naive():
    from disentangledcolorization_tpu.models import layers as L

    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.normal(size=(2, 10, 10, 32)).astype(np.float32))
    kernel = jnp.asarray(rng.normal(size=(3, 3, 32, 2)).astype(np.float32) * 0.2)
    bias = jnp.asarray(rng.normal(size=(2,)).astype(np.float32))
    ref = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + bias
    out = L.padded_out_conv(x, kernel, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_conv_rewrites_preserve_networks(monkeypatch):
    """ColorProbNet / HourGlass2 give identical outputs and param trees with the
    conv rewrites on and off (same variables drive both paths)."""
    from disentangledcolorization_tpu.models.colorprobnet import ColorProbNet
    from disentangledcolorization_tpu.models.hourglass import HourGlass2

    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 32, 32, 1)).astype(np.float32))
    enh_in = jnp.asarray(rng.normal(size=(1, 32, 32, 65)).astype(np.float32))

    for make, inp in (
        (lambda: ColorProbNet(out_channels=64, train=False, sn_folded=True), x),
        (lambda: HourGlass2(out_channels=2, res_num=1, use_norm=True, train=False), enh_in),
    ):
        monkeypatch.setenv("DISCO_CONV_REWRITES", "0")
        m = make()
        v = m.init(jax.random.key(0), inp)
        ref = m.apply(v, inp)
        monkeypatch.setenv("DISCO_CONV_REWRITES", "1")
        m2 = make()
        v2 = m2.init(jax.random.key(0), inp)
        assert jax.tree_util.tree_structure(v2) == jax.tree_util.tree_structure(v)
        out = m2.apply(v, inp)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_conv_rewrites_gradients_flow(monkeypatch):
    """The rewritten convs are differentiable and match the naive gradients."""
    from disentangledcolorization_tpu.models.hourglass import HourGlass2

    rng = np.random.default_rng(14)
    enh_in = jnp.asarray(rng.normal(size=(1, 16, 16, 65)).astype(np.float32))
    m = HourGlass2(out_channels=2, res_num=1, use_norm=False, train=True, sn_folded=True)
    monkeypatch.setenv("DISCO_CONV_REWRITES", "0")
    v = m.init(jax.random.key(0), enh_in)

    def loss(params):
        return (m.apply({"params": params}, enh_in) ** 2).sum()

    g_ref = jax.grad(loss)(v["params"])
    monkeypatch.setenv("DISCO_CONV_REWRITES", "1")
    g_new = jax.grad(loss)(v["params"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4),
        g_new,
        g_ref,
    )
