"""Training losses: superpixel reconstruction, anchor-color CE, perceptual.

Capability parity with /root/reference/models/loss.py:
  * SPixelLoss (12-30): poolfeat->upfeat reconstruction of cat(ab, xy);
    10*featLoss + 0.003*posLoss/kernel.
  * AnchorColorProbLoss (33-87): palLoss = rebalanced CE over 313 bins;
    refLoss = CE (classification) or 50*l2 (hint2regress); recLoss = VGG19
    perceptual (x5 classif / x1 regress) + optional Laplacian-gradient L1.
  * helpers l1/l2/masked_l1/huber (104-134).

Reference bug intentionally fixed (SURVEY.md section 7): the reference calls
``_perceptual_loss(gray, pred, gt)`` against signature ``(gray, gt, pred)``
and detaches the first argument's features (loss.py:81 vs 45/219), so its
perceptual term carries no gradient. Here the perceptual loss is
L1(stop_grad(VGG(gt_rgb)), VGG(pred_rgb)) — gradient flows to the prediction.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..ops import colorlabel as cl
from ..ops import superpixel as sp
from ..utils import color as color_lib
from ..models.vgg import SLICE_WEIGHTS, VGG19Features

EPS = 1e-7


def l2_loss(y_input, y_target, weight_map=None):
    if weight_map is None:
        return jnp.mean((y_input - y_target) ** 2)
    diff = jnp.mean(jnp.abs(y_input - y_target), axis=-1, keepdims=True)
    num = jnp.sum(diff * diff * weight_map, axis=(1, 2, 3))
    den = EPS + jnp.sum(weight_map, axis=(1, 2, 3))
    return jnp.mean(num / den)


def l1_loss(y_input, y_target, weight_map=None):
    if weight_map is None:
        return jnp.mean(jnp.abs(y_input - y_target))
    diff = jnp.mean(jnp.abs(y_input - y_target), axis=-1, keepdims=True)
    num = jnp.sum(diff * weight_map, axis=(1, 2, 3))
    den = EPS + jnp.sum(weight_map, axis=(1, 2, 3))
    return jnp.mean(num / den)


def masked_l1_loss(y_input, y_target, outlier_mask):
    weight = jnp.where(outlier_mask, 0.0, 1.0)
    return l1_loss(y_input, y_target, weight)


def huber_loss(y_input, y_target, delta: float = 0.01):
    mann = jnp.abs(y_input - y_target)
    eucl = 0.5 * mann**2
    mask = (mann < delta).astype(y_input.dtype)
    return jnp.mean(eucl * mask / delta + (mann - 0.5 * delta) * (1 - mask))


def cross_entropy_with_indices(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean CE over (..., K) logits vs integer labels (...,). Matches
    torch nn.CrossEntropyLoss (mean reduction)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    picked = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return -jnp.mean(picked)


def laplace_gradient_loss(pred_ab: jnp.ndarray, target_ab: jnp.ndarray) -> jnp.ndarray:
    """L1 between 8-neighbor Laplacians, channelwise (loss.py:51-57). NHWC."""
    k = jnp.array([[1.0, 1.0, 1.0], [1.0, -8.0, 1.0], [1.0, 1.0, 1.0]], pred_ab.dtype)

    def lap(x):
        c = x.shape[-1]
        kern = jnp.zeros((3, 3, c, c), x.dtype)
        for i in range(c):
            kern = kern.at[:, :, i, i].set(k)
        return jax.lax.conv_general_dilated(
            x, kern, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    return l1_loss(lap(target_ab), lap(pred_ab))


def spixel_loss(pred_prob: jnp.ndarray, labxy_feat: jnp.ndarray, kernel_size: int = 16):
    """Superpixel training loss (loss.py:12-30). NHWC.

    Args:
      pred_prob: (N, H, W, 9) affinity.
      labxy_feat: (N, H, W, C+2) target features; last 2 channels are (x, y).
    """
    pooled = sp.poolfeat(labxy_feat, pred_prob, kernel_size, kernel_size)
    recon = sp.upfeat(pooled, pred_prob, kernel_size, kernel_size)
    diff = recon - labxy_feat
    feat_loss = jnp.mean(jnp.linalg.norm(diff[..., :-2], axis=-1))
    pos_loss = jnp.mean(jnp.linalg.norm(diff[..., -2:], axis=-1)) / kernel_size
    total = 10.0 * feat_loss + 0.003 * pos_loss
    return {"totalLoss": total, "featLoss": feat_loss, "posLoss": pos_loss}


class AnchorColorProbLoss:
    """Colorizer loss bundle (loss.py:33-87), stateless and jit-friendly.

    Construct once (optionally with VGG19 variables for the perceptual term),
    then call with the model outputs. If ``vgg_variables`` is None the
    perceptual term is zero (weights unavailable without network egress).
    """

    def __init__(
        self,
        hint2regress: bool = False,
        enhanced: bool = False,
        with_grad: bool = False,
        vgg_variables: Any | None = None,
        feat_type: str = "liu",
    ):
        self.hint2regress = hint2regress
        self.enhanced = enhanced
        self.with_grad = with_grad
        self.vgg_variables = vgg_variables
        self.feat_type = feat_type
        self._vgg = VGG19Features(feat_type=feat_type) if vgg_variables is not None else None
        if enhanced and vgg_variables is None:
            import warnings

            warnings.warn(
                "AnchorColorProbLoss: no VGG19 weights supplied — the reconstruction "
                "term falls back to pixel L1 instead of the reference's VGG19 "
                "perceptual loss (/root/reference/models/loss.py:78-84). This trains "
                "a DIFFERENT objective than the paper. Pass --vgg_npz (converted via "
                "tools/convert_torch.py::convert_vgg19_torchvision) to restore it.",
                stacklevel=2,
            )

    def _perceptual(self, input_grays, gt_colors, pred_colors):
        gt_rgb = color_lib.lab2rgb(jnp.concatenate([input_grays, gt_colors], axis=-1))
        pred_rgb = color_lib.lab2rgb(jnp.concatenate([input_grays, pred_colors], axis=-1))
        f_gt = self._vgg.apply(self.vgg_variables, gt_rgb)
        f_pred = self._vgg.apply(self.vgg_variables, pred_rgb)
        weights = SLICE_WEIGHTS[self.feat_type]
        loss = 0.0
        for w, a, b in zip(weights, f_gt, f_pred):
            loss = loss + w * jnp.mean(jnp.abs(jax.lax.stop_gradient(a) - b))
        return loss

    def __call__(self, data: dict) -> dict:
        """data keys: pal_logit (N,h,w,313), ref_logit, target_label (N,h,w) int,
        class_weight (N,h,w), spix_color (N,h,w,2), input_gray (N,H,W,1),
        input_color (N,H,W,2), pred_color (N,H,W,2) or None."""
        gt_labels = data["target_label"]
        w = data["class_weight"]
        pal = cl.rebalance_gradient(data["pal_logit"], w[..., None])
        pal_loss = cross_entropy_with_indices(pal, gt_labels)
        if self.hint2regress:
            ref_loss = 50.0 * l2_loss(data["spix_color"], data["ref_logit"])
        else:
            ref = cl.rebalance_gradient(data["ref_logit"], w[..., None])
            ref_loss = cross_entropy_with_indices(ref, gt_labels)
        rec_loss = jnp.zeros_like(pal_loss)
        if self.enhanced and self._vgg is not None:
            scalar = 1.0 if self.hint2regress else 5.0
            rec_loss = scalar * self._perceptual(
                data["input_gray"], data["input_color"], data["pred_color"]
            )
            if self.with_grad:
                rec_loss = rec_loss + laplace_gradient_loss(
                    data["pred_color"], data["input_color"]
                )
        elif self.enhanced:
            # no VGG weights available: fall back to an L1 reconstruction term
            # so the enhancement decoder still trains (documented deviation)
            scalar = 1.0 if self.hint2regress else 5.0
            rec_loss = scalar * l1_loss(data["pred_color"], data["input_color"])
            if self.with_grad:
                rec_loss = rec_loss + laplace_gradient_loss(
                    data["pred_color"], data["input_color"]
                )
        total = pal_loss + ref_loss + rec_loss
        return {
            "totalLoss": total,
            "palLoss": pal_loss,
            "refLoss": ref_loss,
            "recLoss": rec_loss,
        }
