"""Quality metrics: PSNR, SSIM, colorfulness, and FID (InceptionV3-free option).

The reference distributes its metric scripts as an external Google-Drive
download (README.md:109-118) — not in the repo. This module provides the same
metric surface natively (BASELINE config #5):

  * PSNR / SSIM: standard definitions, jittable, batched NHWC.
  * colorfulness: Hasler & Suesstrunk (the metric the DISCO paper reports).
  * FID: Frechet distance between Gaussian fits of feature activations. The
    canonical feature extractor is InceptionV3-pool3; without downloadable
    weights this uses a converted-weights npz when present, else falls back to
    the VGG19 slice-5 features (relative comparisons remain meaningful; the
    extractor is recorded in the result dict).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def psnr(img_a: jnp.ndarray, img_b: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    """Per-image PSNR over NHWC batches in [0, max_val]; returns (N,)."""
    mse = jnp.mean((img_a - img_b) ** 2, axis=(1, 2, 3))
    return 10.0 * jnp.log10(max_val**2 / jnp.maximum(mse, 1e-12))


@partial(jax.jit, static_argnames=("window", "max_val"))
def ssim(img_a: jnp.ndarray, img_b: jnp.ndarray, window: int = 11, max_val: float = 1.0) -> jnp.ndarray:
    """Mean SSIM (gaussian 11x11, sigma 1.5) over NHWC in [0, max_val]; (N,)."""
    sigma = 1.5
    xs = jnp.arange(window, dtype=jnp.float32) - (window - 1) / 2.0
    g = jnp.exp(-(xs**2) / (2 * sigma**2))
    g = g / g.sum()
    kern2d = jnp.outer(g, g)
    c = img_a.shape[-1]
    kern = jnp.zeros((window, window, c, c), jnp.float32)
    for i in range(c):
        kern = kern.at[:, :, i, i].set(kern2d)

    def filt(x):
        # precision="highest": TPU's default bf16 conv multiplies make
        # filt(x*x) - mu**2 cancel catastrophically (bf16 eps ~8e-3 >> c2),
        # which drove SSIM below -1 on real images (observed -22/image)
        return jax.lax.conv_general_dilated(
            x,
            kern,
            (1, 1),
            "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST,
        )

    k1, k2 = 0.01, 0.03
    c1, c2 = (k1 * max_val) ** 2, (k2 * max_val) ** 2
    mu_a, mu_b = filt(img_a), filt(img_b)
    var_a = filt(img_a * img_a) - mu_a**2
    var_b = filt(img_b * img_b) - mu_b**2
    cov = filt(img_a * img_b) - mu_a * mu_b
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a**2 + mu_b**2 + c1) * (var_a + var_b + c2)
    )
    return jnp.mean(s, axis=(1, 2, 3))


@jax.jit
def colorfulness(rgb: jnp.ndarray) -> jnp.ndarray:
    """Hasler-Suesstrunk colorfulness for NHWC RGB in [0, 1]; returns (N,)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    rg = r - g
    yb = 0.5 * (r + g) - b
    std = jnp.sqrt(jnp.var(rg, axis=(1, 2)) + jnp.var(yb, axis=(1, 2)))
    mean = jnp.sqrt(jnp.mean(rg, axis=(1, 2)) ** 2 + jnp.mean(yb, axis=(1, 2)) ** 2)
    return (std + 0.3 * mean) * 255.0


def frechet_distance(mu1, sigma1, mu2, sigma2) -> float:
    """FID between two Gaussians (numpy; uses eigensystem sqrtm for symmetry)."""
    mu1, mu2 = np.asarray(mu1), np.asarray(mu2)
    sigma1, sigma2 = np.asarray(sigma1), np.asarray(sigma2)
    diff = mu1 - mu2
    # sqrtm(sigma1 @ sigma2) via symmetric decomposition: both PSD
    s1_half = _sqrtm_psd(sigma1)
    cov_prod = s1_half @ sigma2 @ s1_half
    tr_covmean = np.sum(np.sqrt(np.maximum(np.linalg.eigvalsh(cov_prod), 0.0)))
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2) - 2 * tr_covmean)


def _sqrtm_psd(m: np.ndarray) -> np.ndarray:
    vals, vecs = np.linalg.eigh(m)
    vals = np.maximum(vals, 0.0)
    return (vecs * np.sqrt(vals)) @ vecs.T


class FeatureStats:
    """Streaming mean/covariance accumulator for FID."""

    def __init__(self, dim: int):
        self.n = 0
        self.sum = np.zeros(dim, np.float64)
        self.outer = np.zeros((dim, dim), np.float64)

    def update(self, feats: np.ndarray):
        feats = np.asarray(feats, np.float64)
        self.n += feats.shape[0]
        self.sum += feats.sum(0)
        self.outer += feats.T @ feats

    def finalize(self):
        mu = self.sum / self.n
        cov = self.outer / max(self.n - 1, 1) - np.outer(mu, mu) * self.n / max(self.n - 1, 1)
        return mu, cov


def make_feature_extractor(npz_path: str | None = None):
    """Returns (extract_fn(rgb_nhwc)->(N, D) np.ndarray, extractor_name).

    Prefers converted InceptionV3 weights (the canonical FID extractor; convert
    torchvision's inception_v3 state_dict with tools/convert_torch and pickle
    the variables), else VGG19 slices, else a fixed random-projection pool
    (deterministic, weight-free) so FID remains computable for relative
    comparisons. The extractor name is recorded in the result dict.
    """
    import os
    import pickle

    if npz_path and npz_path.endswith((".pkl", ".pickle")) and os.path.exists(npz_path):
        from ..models.inception import InceptionV3Features

        with open(npz_path, "rb") as f:
            inc_vars = pickle.load(f)
        model = InceptionV3Features()

        @jax.jit
        def extract_inc(rgb):
            n, h, w, _ = rgb.shape
            if (h, w) != (299, 299):
                rgb = jax.image.resize(rgb, (n, 299, 299, 3), "bilinear")
            return model.apply(inc_vars, rgb)

        return lambda rgb: np.asarray(extract_inc(jnp.asarray(rgb))), "inception-v3-pool3"

    from ..models.vgg import VGG19Features, load_vgg19_params

    vgg_vars = load_vgg19_params(npz_path)
    if vgg_vars is not None:
        model = VGG19Features(feat_type="liu")

        @jax.jit
        def extract(rgb):
            feats = model.apply(vgg_vars, rgb)[-1]  # deepest slice
            return jnp.mean(feats, axis=(1, 2))

        return lambda rgb: np.asarray(extract(jnp.asarray(rgb))), "vgg19-slice5"

    key = jax.random.key(0)
    proj = jax.random.normal(key, (3 * 16 * 16, 512), jnp.float32) / 16.0

    @jax.jit
    def extract_rand(rgb):
        n, h, w, c = rgb.shape
        # 16x16 average-pooled patches -> fixed random projection
        ph, pw = h // 16, w // 16
        x = rgb[:, : ph * 16, : pw * 16, :].reshape(n, 16, ph, 16, pw, c).mean((2, 4))
        return x.reshape(n, -1) @ proj

    return lambda rgb: np.asarray(extract_rand(jnp.asarray(rgb))), "randproj-512"


def inception_score(probs: np.ndarray, splits: int = 10) -> tuple[float, float]:
    """Inception Score from (N, K) class probabilities: exp(E_x KL(p(y|x) || p(y))).

    Salimans et al. 2016 definition with the standard 10-split mean/std.
    One of the metrics the reference distributes as an external download
    (/root/reference/README.md:109-118).
    """
    probs = np.asarray(probs, np.float64)
    n = probs.shape[0]
    splits = max(1, min(splits, n))
    scores = []
    for part in np.array_split(probs, splits):
        marginal = part.mean(axis=0, keepdims=True)
        kl = part * (np.log(np.maximum(part, 1e-16)) - np.log(np.maximum(marginal, 1e-16)))
        scores.append(float(np.exp(kl.sum(axis=1).mean())))
    return float(np.mean(scores)), float(np.std(scores))


def inception_score_from_dir(
    d: str, batch: int = 32, weights_path: str | None = None, splits: int = 10
) -> dict:
    """Inception Score of an image folder via InceptionV3 class probabilities.

    ``weights_path``: pickled flax variables converted from torchvision's
    inception_v3 with ``convert_inception_torchvision(sd, include_fc=True)``.
    Without a weights drop the net is deterministically random-initialized —
    the absolute number is then meaningless, but relative comparisons between
    folders remain stable; the extractor name records which case applied.
    """
    import os
    import pickle

    import cv2
    import jax

    from ..models.inception import InceptionV3Features
    from ..utils import io as io_lib

    model = InceptionV3Features(with_logits=True)
    if weights_path and os.path.exists(weights_path):
        with open(weights_path, "rb") as f:
            variables = pickle.load(f)
        name = "inception-v3-torchvision"
    else:
        variables = model.init(jax.random.key(0), jnp.zeros((1, 299, 299, 3), jnp.float32))
        name = "inception-v3-randinit"

    @jax.jit
    def class_probs(rgb):
        n, h, w, _ = rgb.shape
        if (h, w) != (299, 299):
            rgb = jax.image.resize(rgb, (n, 299, 299, 3), "bilinear")
        return jax.nn.softmax(model.apply(variables, rgb), axis=-1)

    files = io_lib.get_filelist(d)
    all_probs = []
    for s in range(0, len(files), batch):
        imgs = []
        for f in files[s : s + batch]:
            bgr = cv2.imread(f, cv2.IMREAD_COLOR)
            bgr = cv2.resize(bgr, (299, 299), interpolation=cv2.INTER_AREA)
            imgs.append(cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB) / 255.0)
        all_probs.append(np.asarray(class_probs(jnp.asarray(np.asarray(imgs, np.float32)))))
    mean, std = inception_score(np.concatenate(all_probs), splits=splits)
    return {"is_mean": mean, "is_std": std, "is_extractor": name, "is_n": len(files)}


def make_lpips(npz_path: str | None = None, lin_path: str | None = None):
    """Returns (lpips_fn(rgb_a, rgb_b) -> (N,) distances, name).

    LPIPS (Zhang et al. 2018) over VGG19 post-relu taps (relu1_2, relu2_2,
    relu3_4, relu4_4, relu5_4): unit-normalize each activation along channels,
    squared difference, per-channel linear weights, spatial mean, sum over
    slices. ``lin_path`` is an .npz of per-slice weight vectors ``lin0..lin4``
    (the learned LPIPS calibration); without it, uniform 1/C weights are used
    ("unweighted" variant). ``npz_path`` is the converted torchvision VGG19
    weights dump (models/vgg.py::load_vgg19_params); without a weights drop the
    backbone is deterministically random-initialized (relative comparisons
    only — same caveat as the FID fallback above; name records the case).
    """
    import jax

    from ..models.vgg import VGG19Features, load_vgg19_params

    model = VGG19Features(feat_type="lpips")
    variables = load_vgg19_params(npz_path)
    name = "lpips-vgg19" if variables is not None else "lpips-vgg19-randinit"
    if variables is None:
        variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    lin = None
    if lin_path:
        raw = np.load(lin_path)
        lin = [jnp.asarray(raw[f"lin{i}"], jnp.float32) for i in range(5)]
        name += "-calibrated"

    @jax.jit
    def lpips_fn(rgb_a, rgb_b):
        fa = model.apply(variables, rgb_a)
        fb = model.apply(variables, rgb_b)
        total = jnp.zeros(rgb_a.shape[0], jnp.float32)
        for i, (x, y) in enumerate(zip(fa, fb)):
            xn = x * jax.lax.rsqrt(jnp.sum(x * x, -1, keepdims=True) + 1e-10)
            yn = y * jax.lax.rsqrt(jnp.sum(y * y, -1, keepdims=True) + 1e-10)
            d = (xn - yn) ** 2
            w = lin[i] if lin is not None else 1.0 / d.shape[-1]
            total = total + jnp.mean(jnp.sum(d * w, axis=-1), axis=(1, 2))
        return total

    return lpips_fn, name


def fid_from_dirs(dir_a: str, dir_b: str, batch: int = 32, npz_path: str | None = None) -> dict:
    """Compute FID between two image folders (resized to 256)."""
    import cv2

    from ..utils import io as io_lib

    extract, name = make_feature_extractor(npz_path)

    def stats_for(d):
        files = io_lib.get_filelist(d)
        st = None
        for s in range(0, len(files), batch):
            imgs = []
            for f in files[s : s + batch]:
                bgr = cv2.imread(f, cv2.IMREAD_COLOR)
                bgr = cv2.resize(bgr, (256, 256), interpolation=cv2.INTER_AREA)
                imgs.append(cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB) / 255.0)
            feats = extract(np.asarray(imgs, np.float32))
            if st is None:
                st = FeatureStats(feats.shape[1])
            st.update(feats)
        return st.finalize()

    mu_a, cov_a = stats_for(dir_a)
    mu_b, cov_b = stats_for(dir_b)
    return {"fid": frechet_distance(mu_a, cov_a, mu_b, cov_b), "extractor": name}
