"""Metric tests: PSNR/SSIM identity cases, colorfulness sanity, FID properties."""

import numpy as np

from disentangledcolorization_tpu.train import metrics as M


def test_psnr_identical_is_large_and_noise_reduces():
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
    assert float(np.asarray(M.psnr(a, a)).min()) > 60
    noisy = np.clip(a + 0.1 * rng.normal(size=a.shape).astype(np.float32), 0, 1)
    p = np.asarray(M.psnr(a, noisy))
    assert 15 < p.mean() < 25


def test_ssim_bounds():
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
    s_same = np.asarray(M.ssim(a, a))
    np.testing.assert_allclose(s_same, 1.0, atol=1e-4)
    b = rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
    assert np.asarray(M.ssim(a, b)).mean() < 0.5


def test_colorfulness_gray_is_zero():
    g = np.ones((1, 32, 32, 3), np.float32) * 0.5
    np.testing.assert_allclose(np.asarray(M.colorfulness(g)), 0.0, atol=1e-3)
    colorful = np.zeros((1, 32, 32, 3), np.float32)
    colorful[..., 0] = 1.0  # pure red
    assert float(np.asarray(M.colorfulness(colorful))[0]) > 50


def test_frechet_distance_properties():
    rng = np.random.default_rng(2)
    mu = rng.normal(size=8)
    a = rng.normal(size=(64, 8))
    cov = np.cov(a, rowvar=False)
    assert abs(M.frechet_distance(mu, cov, mu, cov)) < 1e-6
    mu2 = mu + 2.0
    d = M.frechet_distance(mu, cov, mu2, cov)
    np.testing.assert_allclose(d, np.sum((mu - mu2) ** 2), rtol=1e-5)


def test_feature_stats_streaming_matches_batch():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(100, 16))
    st = M.FeatureStats(16)
    for s in range(0, 100, 32):
        st.update(x[s : s + 32])
    mu, cov = st.finalize()
    np.testing.assert_allclose(mu, x.mean(0), atol=1e-10)
    np.testing.assert_allclose(cov, np.cov(x, rowvar=False), atol=1e-8)


def test_fid_extractor_fallback_runs():
    extract, name = M.make_feature_extractor(None)
    rng = np.random.default_rng(4)
    feats = extract(rng.uniform(0, 1, (2, 256, 256, 3)).astype(np.float32))
    assert feats.shape[0] == 2 and feats.ndim == 2
