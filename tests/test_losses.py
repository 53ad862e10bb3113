"""Loss parity tests vs the reference loss module (CPU torch)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from disentangledcolorization_tpu.ops import colorlabel as cl
from disentangledcolorization_tpu.train import losses as L


def _softmax_prob(rng, shape):
    x = rng.normal(size=shape).astype(np.float32)
    e = np.exp(x - x.max(axis=-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def test_spixel_loss_matches_reference(reference_modules):
    torch = reference_modules["torch"]
    import importlib

    ref_loss_mod = importlib.import_module("loss")
    rng = np.random.default_rng(0)
    n, h, w = 2, 32, 32
    prob = _softmax_prob(rng, (n, h, w, 9))
    labxy = rng.normal(size=(n, h, w, 4)).astype(np.float32)

    ref = ref_loss_mod.SPixelLoss(psize=16)(
        {
            "pred_prob": torch.from_numpy(prob.transpose(0, 3, 1, 2)),
            "target_feat": torch.from_numpy(labxy.transpose(0, 3, 1, 2)),
        },
        epoch_no=0,
    )
    ours = L.spixel_loss(jnp.asarray(prob), jnp.asarray(labxy), 16)
    for k in ("totalLoss", "featLoss", "posLoss"):
        np.testing.assert_allclose(float(ours[k]), float(ref[k]), rtol=1e-4)


def test_colorizer_loss_classification_matches_reference(reference_modules):
    """palLoss + refLoss (classification path, enhanced=False) parity."""
    torch = reference_modules["torch"]
    import importlib

    ref_loss_mod = importlib.import_module("loss")
    basic = reference_modules["basic"]
    rng = np.random.default_rng(1)
    n, h, w, k = 2, 4, 4, 313
    pal = rng.normal(size=(n, h, w, k)).astype(np.float32)
    ref_logit = rng.normal(size=(n, h, w, k)).astype(np.float32)
    labels = rng.integers(0, k, size=(n, h, w))
    labeler = basic.ColorLabel(device=torch.device("cpu"))
    class_w = labeler.get_classweights(torch.from_numpy(labels)).numpy()

    ref_bundle = ref_loss_mod.AnchorColorProbLoss(hint2regress=False, enhanced=False)
    ref = ref_bundle(
        {
            "pal_prob": torch.from_numpy(pal.transpose(0, 3, 1, 2)),
            "ref_prob": torch.from_numpy(ref_logit.transpose(0, 3, 1, 2)),
            "target_label": torch.from_numpy(labels[:, None, :, :]),
            "class_weight": torch.from_numpy(class_w[:, None, :, :]),
        },
        epoch_no=0,
    )
    ours_bundle = L.AnchorColorProbLoss(hint2regress=False, enhanced=False)
    ours = ours_bundle(
        {
            "pal_logit": jnp.asarray(pal),
            "ref_logit": jnp.asarray(ref_logit),
            "target_label": jnp.asarray(labels),
            "class_weight": jnp.asarray(cl.get_classweights(jnp.asarray(labels))),
            "spix_color": None,
            "input_gray": None,
            "input_color": None,
            "pred_color": None,
        }
    )
    np.testing.assert_allclose(float(ours["palLoss"]), float(ref["palLoss"]), rtol=1e-4)
    np.testing.assert_allclose(float(ours["refLoss"]), float(ref["refLoss"]), rtol=1e-4)


def test_colorizer_loss_regress_refloss_matches_reference(reference_modules):
    torch = reference_modules["torch"]
    import importlib

    ref_loss_mod = importlib.import_module("loss")
    rng = np.random.default_rng(2)
    n, h, w = 2, 4, 4
    pal = rng.normal(size=(n, h, w, 313)).astype(np.float32)
    labels = rng.integers(0, 313, size=(n, h, w))
    spix = rng.uniform(-0.5, 0.5, (n, h, w, 2)).astype(np.float32)
    pred = rng.uniform(-0.5, 0.5, (n, h, w, 2)).astype(np.float32)
    class_w = np.asarray(cl.get_classweights(jnp.asarray(labels)))

    ref_bundle = ref_loss_mod.AnchorColorProbLoss(hint2regress=True, enhanced=False)
    ref = ref_bundle(
        {
            "pal_prob": torch.from_numpy(pal.transpose(0, 3, 1, 2)),
            "ref_prob": torch.from_numpy(pred.transpose(0, 3, 1, 2)),
            "spix_color": torch.from_numpy(spix.transpose(0, 3, 1, 2)),
            "target_label": torch.from_numpy(labels[:, None, :, :]),
            "class_weight": torch.from_numpy(class_w[:, None, :, :]),
        },
        epoch_no=0,
    )
    ours_bundle = L.AnchorColorProbLoss(hint2regress=True, enhanced=False)
    ours = ours_bundle(
        {
            "pal_logit": jnp.asarray(pal),
            "ref_logit": jnp.asarray(pred),
            "target_label": jnp.asarray(labels),
            "class_weight": jnp.asarray(class_w),
            "spix_color": jnp.asarray(spix),
            "input_gray": None,
            "input_color": None,
            "pred_color": None,
        }
    )
    np.testing.assert_allclose(float(ours["refLoss"]), float(ref["refLoss"]), rtol=1e-4)


def test_rebalance_affects_gradient_not_value():
    rng = np.random.default_rng(3)
    n, h, w, k = 1, 2, 2, 313
    pal = jnp.asarray(rng.normal(size=(n, h, w, k)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, k, size=(n, h, w)))
    weights = cl.get_classweights(labels)

    def loss_plain(x):
        return L.cross_entropy_with_indices(x, labels)

    def loss_reb(x):
        return L.cross_entropy_with_indices(cl.rebalance_gradient(x, weights[..., None]), labels)

    np.testing.assert_allclose(float(loss_plain(pal)), float(loss_reb(pal)), rtol=1e-6)
    g_plain = jax.grad(loss_plain)(pal)
    g_reb = jax.grad(loss_reb)(pal)
    ratio = np.asarray(g_reb / g_plain)
    expected = np.asarray(weights)[..., None]
    np.testing.assert_allclose(ratio, np.broadcast_to(expected, ratio.shape), rtol=1e-4)


def test_laplace_gradient_matches_reference(reference_modules):
    torch = reference_modules["torch"]
    import importlib

    ref_loss_mod = importlib.import_module("loss")
    rng = np.random.default_rng(4)
    pred = rng.normal(size=(1, 2, 16, 16)).astype(np.float32)
    tgt = rng.normal(size=(1, 2, 16, 16)).astype(np.float32)
    bundle = ref_loss_mod.AnchorColorProbLoss(hint2regress=False, enhanced=False)
    # _laplace_gradient calls .get_device(); give cpu tensors a stub
    torch.Tensor.get_device = lambda self: "cpu"  # type: ignore
    ref = bundle._laplace_gradient(torch.from_numpy(pred), torch.from_numpy(tgt))
    ours = L.laplace_gradient_loss(
        jnp.asarray(pred.transpose(0, 2, 3, 1)), jnp.asarray(tgt.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-4)


def test_perceptual_loss_with_vgg_flows_gradient():
    """Enhanced loss with (random-init) VGG19 features: finite, and gradient
    reaches the prediction but not the ground truth (stop_gradient on targets)."""
    import jax

    from disentangledcolorization_tpu.models.vgg import VGG19Features

    vgg = VGG19Features(feat_type="liu")
    rng = np.random.default_rng(0)
    vgg_vars = vgg.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    bundle = L.AnchorColorProbLoss(enhanced=True, vgg_variables=vgg_vars)
    gray = jnp.asarray(rng.uniform(-0.8, 0.8, (1, 64, 64, 1)).astype(np.float32))
    gt = jnp.asarray(rng.uniform(-0.4, 0.4, (1, 64, 64, 2)).astype(np.float32))
    pal = jnp.zeros((1, 4, 4, 313))
    labels = jnp.zeros((1, 4, 4), jnp.int32)

    def loss_fn(pred):
        data = {
            "pal_logit": pal,
            "ref_logit": pal,
            "target_label": labels,
            "class_weight": jnp.asarray(cl.get_classweights(labels)),
            "spix_color": None,
            "input_gray": gray,
            "input_color": gt,
            "pred_color": pred,
        }
        return bundle(data)["recLoss"]

    pred = jnp.asarray(rng.uniform(-0.4, 0.4, (1, 64, 64, 2)).astype(np.float32))
    val, grad = jax.value_and_grad(loss_fn)(pred)
    assert np.isfinite(float(val)) and float(val) > 0
    assert float(jnp.abs(grad).sum()) > 0
