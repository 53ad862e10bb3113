"""int8 PTQ conv path (ops/quant.py + DISCO_INT8 gating in models/layers.py).

The reference has no quantized path (pure fp32 torch); this is a TPU-native
opt-in addition, so the tests here check internal consistency (quantization
math, grid-exactness, end-to-end closeness to the f32 path), not reference
parity.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from disentangledcolorization_tpu.ops import quant


def test_quantize_weight_grid_exact():
    """Weights already on the per-channel int8 grid survive a round-trip."""
    rng = np.random.default_rng(0)
    scales = np.array([0.5 / 127, 2.0 / 127, 1.0 / 127, 3.0 / 127], np.float32)
    q = rng.integers(-126, 127, (3, 3, 8, 4)).astype(np.float32)
    q[0, 0, 0, :] = 127.0  # pin each channel's max so the scale is recoverable
    w = jnp.asarray(q * scales)
    wq, s = quant.quantize_weight(w)
    np.testing.assert_allclose(np.asarray(wq, np.float32) * np.asarray(s), np.asarray(w), rtol=1e-6)


def test_quantize_activation_range():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(-3, 3, (2, 8, 8, 16)).astype(np.float32))
    xq, s = quant.quantize_activation(x)
    assert xq.dtype == jnp.int8
    deq = np.asarray(xq, np.float32) * float(s)
    assert np.abs(deq - np.asarray(x)).max() <= float(s) * 0.5 + 1e-7


def test_int8_conv_matches_f32_quantized_reference():
    """int8_conv == the same conv computed in f32 on the dequantized operands."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 10, 10, 32)).astype(np.float32))
    w = jnp.asarray(rng.uniform(-0.2, 0.2, (3, 3, 32, 16)).astype(np.float32))
    b = jnp.asarray(rng.uniform(-0.1, 0.1, 16).astype(np.float32))
    y = quant.int8_conv(x, w, b, stride=1, padding=1)
    xq, sx = quant.quantize_activation(x)
    wq, sw = quant.quantize_weight(w)
    ref = jax.lax.conv_general_dilated(
        np.asarray(xq, np.float32) * float(sx),
        np.asarray(wq, np.float32) * np.asarray(sw),
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-4, atol=1e-5)
    # and it's close to the unquantized conv (PTQ error ~ 1/127 per operand)
    full = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b
    err = np.abs(np.asarray(y) - np.asarray(full)).max()
    assert err < 0.05 * float(np.abs(np.asarray(full)).max())


@pytest.mark.parametrize("stride", [1, 2])
def test_conv_layer_int8_gate(monkeypatch, stride):
    """DISCO_INT8=1 flips models/layers.py::Conv to the quantized path with the
    same param tree; outputs stay close to the f32 path."""
    from disentangledcolorization_tpu.models.layers import Conv

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 8, 8, 32)).astype(np.float32))
    m = Conv(16, stride=stride)
    variables = m.init(jax.random.key(0), x)
    y_f32 = m.apply(variables, x)
    monkeypatch.setenv("DISCO_INT8", "1")
    y_q = m.apply(variables, x)
    assert y_q.shape == y_f32.shape
    scale = float(np.abs(np.asarray(y_f32)).max())
    assert np.abs(np.asarray(y_q) - np.asarray(y_f32)).max() < 0.05 * scale
    # narrow convs stay un-quantized (bit-identical)
    xs = jnp.asarray(rng.uniform(-1, 1, (1, 8, 8, 8)).astype(np.float32))
    ms = Conv(16, stride=stride)
    vs = ms.init(jax.random.key(1), xs)
    np.testing.assert_array_equal(np.asarray(ms.apply(vs, xs)), np.asarray(ms.apply(vs, xs)))


def test_conv_calib_then_static(monkeypatch):
    """DISCO_INT8=calib records activation ranges into a 'quant' collection
    (exact f32 output), then DISCO_INT8=static quantizes with the stored
    scales and stays close to f32."""
    from disentangledcolorization_tpu.models.layers import Conv

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.uniform(-2, 2, (1, 8, 8, 32)).astype(np.float32))
    m = Conv(16)
    variables = m.init(jax.random.key(0), x)
    y_f32 = m.apply(variables, x)

    monkeypatch.setenv("DISCO_INT8", "calib")
    y_calib, mut = m.apply(variables, x, mutable=["quant"])
    np.testing.assert_array_equal(np.asarray(y_calib), np.asarray(y_f32))  # calib == f32
    amax = jax.tree_util.tree_leaves(mut["quant"])[0]
    np.testing.assert_allclose(float(amax), float(jnp.max(jnp.abs(x))), rtol=1e-6)

    monkeypatch.setenv("DISCO_INT8", "static")
    y_q = m.apply({**variables, **mut}, x)
    scale = float(np.abs(np.asarray(y_f32)).max())
    assert np.abs(np.asarray(y_q) - np.asarray(y_f32)).max() < 0.05 * scale

    # second calib pass keeps the running max monotone
    monkeypatch.setenv("DISCO_INT8", "calib")
    _, mut2 = m.apply({**variables, **mut}, x * 0.1, mutable=["quant"])
    amax2 = jax.tree_util.tree_leaves(mut2["quant"])[0]
    assert float(amax2) >= float(amax) - 1e-7


def test_snconv_calib_then_static(monkeypatch):
    from disentangledcolorization_tpu.models.layers import SNConv

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 8, 8, 64)).astype(np.float32))
    m = SNConv(32, folded=True)
    variables = m.init(jax.random.key(0), x)
    y_f32 = m.apply(variables, x)
    monkeypatch.setenv("DISCO_INT8", "calib")
    y_calib, mut = m.apply(variables, x, mutable=["quant"])
    np.testing.assert_array_equal(np.asarray(y_calib), np.asarray(y_f32))
    monkeypatch.setenv("DISCO_INT8", "static")
    y_q = m.apply({**variables, **mut}, x)
    scale = float(np.abs(np.asarray(y_f32)).max())
    assert np.abs(np.asarray(y_q) - np.asarray(y_f32)).max() < 0.05 * scale


def test_snconv_folded_int8_gate(monkeypatch):
    from disentangledcolorization_tpu.models.layers import SNConv

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 8, 8, 64)).astype(np.float32))
    m = SNConv(32, folded=True)
    variables = m.init(jax.random.key(0), x)
    y_f32 = m.apply(variables, x)
    monkeypatch.setenv("DISCO_INT8", "1")
    y_q = m.apply(variables, x)
    scale = float(np.abs(np.asarray(y_f32)).max())
    assert np.abs(np.asarray(y_q) - np.asarray(y_f32)).max() < 0.05 * scale
    # un-folded (training) SNConv ignores the gate entirely
    mt = SNConv(32, folded=False)
    vt = mt.init(jax.random.key(1), x)
    y_t = mt.apply(vt, x)
    monkeypatch.delenv("DISCO_INT8")
    np.testing.assert_array_equal(np.asarray(y_t), np.asarray(mt.apply(vt, x)))


def test_excluded_path_matching(monkeypatch):
    from disentangledcolorization_tpu.ops import quant

    monkeypatch.delenv("DISCO_INT8_EXCLUDE", raising=False)
    assert not quant.excluded(("repnet", "block1", "conv"))
    monkeypatch.setenv("DISCO_INT8_EXCLUDE", "repnet")
    assert quant.excluded(("repnet", "block1", "conv"))
    assert not quant.excluded(("segnet", "conv0"))
    assert not quant.excluded(())
    monkeypatch.setenv("DISCO_INT8_EXCLUDE", "repnet, segnet")
    assert quant.excluded(("segnet", "conv0"))


def test_exclusion_keeps_module_exact(monkeypatch):
    """DISCO_INT8_EXCLUDE=sub keeps convs under a module named 'sub' on the
    exact f32 path (bit-identical to no-quant) while sibling convs quantize —
    the mechanism behind --quantize int8_safe (palette-stable int8)."""
    import flax.linen as nn

    from disentangledcolorization_tpu.models.layers import Conv

    class Two(nn.Module):
        @nn.compact
        def __call__(self, x):
            a = Conv(16, name="other")(x)
            b = Conv(16, name="sub")(x)
            return a, b

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 8, 8, 32)).astype(np.float32))
    m = Two()
    variables = m.init(jax.random.key(0), x)
    a_f32, b_f32 = m.apply(variables, x)
    monkeypatch.setenv("DISCO_INT8", "1")
    monkeypatch.setenv("DISCO_INT8_EXCLUDE", "sub")
    a_q, b_q = m.apply(variables, x)
    # excluded subtree: bit-identical to the unquantized forward
    np.testing.assert_array_equal(np.asarray(b_q), np.asarray(b_f32))
    # sibling is genuinely on the int8 path (close but not identical)
    assert np.abs(np.asarray(a_q) - np.asarray(a_f32)).max() > 0
    # calib records no act_amax under the excluded subtree
    monkeypatch.setenv("DISCO_INT8", "calib")
    _, mut = m.apply(variables, x, mutable=["quant"])
    from flax import traverse_util

    keys = {"/".join(k) for k in traverse_util.flatten_dict(mut["quant"])}
    assert any(k.startswith("other/") for k in keys)
    assert not any(k.startswith("sub/") for k in keys)
