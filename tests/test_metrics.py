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


def test_inception_v3_features_shape_and_structure():
    """InceptionV3 extractor: pool3 is 2048-d; param tree matches torchvision
    module names so pretrained weights convert mechanically."""
    import jax
    import jax.numpy as jnp

    from disentangledcolorization_tpu.models.inception import InceptionV3Features

    m = InceptionV3Features()
    x = jnp.zeros((1, 299, 299, 3))
    variables = jax.eval_shape(lambda: m.init(jax.random.key(0), x))
    feats_shape = jax.eval_shape(lambda v: m.apply(v, x), variables)
    assert feats_shape.shape == (1, 2048)
    p = variables["params"]
    for name in ("Conv2d_1a_3x3", "Mixed_5b", "Mixed_6e", "Mixed_7c"):
        assert name in p, name
    # torchvision inception_v3 feature-extractor conv params: 21.8M
    n_params = sum(
        int(np.prod(s.shape)) for s in jax.tree_util.tree_leaves(variables["params"])
    )
    assert 20e6 < n_params < 24e6, n_params


def test_inception_converter_roundtrip():
    """A synthetic torchvision-keyed state_dict fills the entire flax tree."""
    import jax
    import jax.numpy as jnp

    from disentangledcolorization_tpu.models.inception import InceptionV3Features
    from disentangledcolorization_tpu.tools.convert_torch import convert_inception_torchvision

    m = InceptionV3Features()
    variables = jax.eval_shape(lambda: m.init(jax.random.key(0), jnp.zeros((1, 299, 299, 3))))

    # build the synthetic torch state_dict from our own shapes (HWIO -> OIHW)
    sd = {}

    def walk(tree, stats, prefix=""):
        for k, v in tree.items():
            path = f"{prefix}{k}" if not prefix else f"{prefix}.{k}"
            if hasattr(v, "items"):
                walk(v, stats.get(k, {}), path)
            else:
                if path.endswith(".conv.kernel"):
                    kh, kw, i, o = v.shape
                    sd[path.replace(".kernel", ".weight")] = np.zeros((o, i, kh, kw), np.float32)
                elif path.endswith(".bn.scale"):
                    sd[path.replace(".scale", ".weight")] = np.ones(v.shape, np.float32)
                elif path.endswith(".bn.bias"):
                    sd[path] = np.zeros(v.shape, np.float32)

    def walk_stats(tree, prefix=""):
        for k, v in tree.items():
            path = f"{prefix}{k}" if not prefix else f"{prefix}.{k}"
            if hasattr(v, "items"):
                walk_stats(v, path)
            else:
                if path.endswith(".bn.mean"):
                    sd[path.replace(".mean", ".running_mean")] = np.zeros(v.shape, np.float32)
                elif path.endswith(".bn.var"):
                    sd[path.replace(".var", ".running_var")] = np.ones(v.shape, np.float32)

    walk(variables["params"], variables.get("batch_stats", {}))
    walk_stats(variables["batch_stats"])
    converted = convert_inception_torchvision(sd)

    def same_structure(a, b, where=""):
        assert set(a.keys()) == set(b.keys()), f"{where}: {set(a) ^ set(b)}"
        for k in a:
            if hasattr(a[k], "items"):
                same_structure(a[k], b[k], where + "/" + k)
            else:
                assert tuple(a[k].shape) == tuple(np.asarray(b[k]).shape), where + "/" + k

    same_structure(variables["params"], converted["params"])
    same_structure(variables["batch_stats"], converted["batch_stats"])


def test_inception_score_math():
    """Uniform p(y|x) -> IS 1; balanced one-hot predictions -> IS = n_classes."""
    k = 8
    uniform = np.full((16, k), 1.0 / k)
    mean, std = M.inception_score(uniform, splits=4)
    assert abs(mean - 1.0) < 1e-6 and std < 1e-6
    onehot = np.eye(k)[np.arange(16) % k] * 0.999 + 0.001 / k
    mean, _ = M.inception_score(onehot, splits=1)
    assert abs(mean - k) < 0.1 * k


def test_inception_logits_head_and_fc_converter():
    """with_logits=True adds the torchvision fc head; converter fills it."""
    import jax
    import jax.numpy as jnp

    from disentangledcolorization_tpu.models.inception import InceptionV3Features
    from disentangledcolorization_tpu.tools.convert_torch import convert_inception_torchvision

    m = InceptionV3Features(with_logits=True)
    variables = jax.eval_shape(lambda: m.init(jax.random.key(0), jnp.zeros((1, 299, 299, 3))))
    out = jax.eval_shape(lambda v: m.apply(v, jnp.zeros((1, 299, 299, 3))), variables)
    assert out.shape == (1, 1000)
    assert variables["params"]["fc"]["kernel"].shape == (2048, 1000)

    sd = {"fc.weight": np.zeros((1000, 2048), np.float32), "fc.bias": np.zeros(1000, np.float32)}
    conv = convert_inception_torchvision(sd, include_fc=True)
    assert conv["params"]["fc"]["kernel"].shape == (2048, 1000)
    assert conv["params"]["fc"]["bias"].shape == (1000,)
    assert "fc" not in convert_inception_torchvision(sd)["params"]


def test_lpips_properties():
    """LPIPS: zero on identical inputs, positive and symmetric on distinct ones,
    and monotone in perturbation size."""
    lpips_fn, name = M.make_lpips()
    assert name == "lpips-vgg19-randinit"  # no weights drop in this env
    rng = np.random.default_rng(7)
    a = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    b = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    d_same = np.asarray(lpips_fn(a, a))
    assert d_same.shape == (2,)
    np.testing.assert_allclose(d_same, 0.0, atol=1e-6)
    d_ab = np.asarray(lpips_fn(a, b))
    d_ba = np.asarray(lpips_fn(b, a))
    assert (d_ab > 1e-4).all()
    np.testing.assert_allclose(d_ab, d_ba, rtol=1e-4)
    small = np.clip(a + 0.02 * rng.normal(size=a.shape).astype(np.float32), 0, 1)
    d_small = np.asarray(lpips_fn(a, small))
    assert (d_small < d_ab).all()


def test_lpips_calibrated_weights(tmp_path):
    """A lin0..lin4 npz reweights channels; zero weights give zero distance."""
    from disentangledcolorization_tpu.models.vgg import _SLICES, _VGG19_CFG

    # channel count at each lpips tap = channels of the conv preceding the tap
    chans = []
    idx_to_ch = {}
    i = 0
    for c in _VGG19_CFG:
        if c == "M":
            idx_to_ch[i] = None
            i += 1
        else:
            idx_to_ch[i] = c
            idx_to_ch[i + 1] = c
            i += 2
    for b in _SLICES["lpips"]:
        chans.append(idx_to_ch[b - 1])
    path = tmp_path / "lin.npz"
    np.savez(path, **{f"lin{i}": np.zeros(c, np.float32) for i, c in enumerate(chans)})
    lpips_fn, name = M.make_lpips(lin_path=str(path))
    assert name.endswith("-calibrated")
    rng = np.random.default_rng(8)
    a = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    b = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(lpips_fn(a, b)), 0.0, atol=1e-7)
