"""Flagship AnchorColorProb composition tests: all modes, shapes, determinism."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from disentangledcolorization_tpu.models import AnchorColorProb


def _inputs(n=1, h=64, w=64, seed=0):
    rng = np.random.default_rng(seed)
    grays = jnp.asarray(rng.uniform(-1, 1, size=(n, h, w, 1)).astype(np.float32))
    colors = jnp.asarray(rng.uniform(-0.5, 0.5, size=(n, h, w, 2)).astype(np.float32))
    return grays, colors


@pytest.fixture(scope="module")
def model_and_vars():
    m = AnchorColorProb(sp_size=16, n_clusters=4, enhanced=True)
    grays, colors = _inputs()
    variables = m.init(
        {"params": jax.random.key(0), "anchor": jax.random.key(1), "dropout": jax.random.key(2)},
        grays,
        colors,
        True,
        0,
        False,
    )
    return m, variables


def test_forward_test_mode(model_and_vars):
    m, variables = model_and_vars
    grays, colors = _inputs()
    out = m.apply(variables, grays, colors, True, 0, False, rngs={"anchor": jax.random.key(3)})
    assert out["pal_logit"].shape == (1, 4, 4, 313)
    assert out["ref_logit"].shape == (1, 4, 4, 313)
    assert out["pred_colors"].shape == (1, 64, 64, 2)
    assert out["affinity_map"].shape == (1, 64, 64, 9)
    assert out["hint_mask"].shape == (1, 4, 4, 1)
    # enhanced output is tanh-bounded
    assert float(jnp.abs(out["pred_colors"]).max()) <= 1.0
    # hint mask has ~n_clusters anchors
    assert 1 <= int(out["hint_mask"].sum()) <= 4


def test_forward_diverse_tiles_batch(model_and_vars):
    m, variables = model_and_vars
    grays, colors = _inputs()
    out = m.apply(variables, grays, colors, True, 2, False, rngs={"anchor": jax.random.key(3)})
    assert out["ref_logit"].shape == (3, 4, 4, 313)
    assert out["pred_colors"].shape == (3, 64, 64, 2)
    # pal_logit stays un-tiled (computed before sampling)
    assert out["pal_logit"].shape == (1, 4, 4, 313)


def test_forward_gt_anchor_mode(model_and_vars):
    m, variables = model_and_vars
    grays, colors = _inputs()
    out = m.apply(variables, grays, colors, True, -1, False, rngs={"anchor": jax.random.key(3)})
    assert out["pred_colors"].shape == (1, 64, 64, 2)


def test_forward_train_mode(model_and_vars):
    m, variables = model_and_vars
    grays, colors = _inputs()
    out, mutated = m.apply(
        variables,
        grays,
        colors,
        False,
        0,
        True,
        rngs={"anchor": jax.random.key(3), "dropout": jax.random.key(4)},
        mutable=["batch_stats", "spectral"],
    )
    assert out["pal_logit"].shape == (1, 4, 4, 313)
    assert out["ref_logit"].shape == (1, 4, 4, 313)
    assert "batch_stats" in mutated and "spectral" in mutated


def test_forward_deterministic_given_key(model_and_vars):
    m, variables = model_and_vars
    grays, colors = _inputs()
    o1 = m.apply(variables, grays, colors, True, 0, False, rngs={"anchor": jax.random.key(5)})
    o2 = m.apply(variables, grays, colors, True, 0, False, rngs={"anchor": jax.random.key(5)})
    np.testing.assert_array_equal(np.asarray(o1["pred_colors"]), np.asarray(o2["pred_colors"]))


def test_random_hint_variant():
    m = AnchorColorProb(sp_size=16, n_clusters=4, random_hint=True, enhanced=False)
    grays, colors = _inputs()
    variables = m.init(
        {"params": jax.random.key(0), "anchor": jax.random.key(1)}, grays, colors, True, 0, False
    )
    out = m.apply(variables, grays, colors, True, 0, False, rngs={"anchor": jax.random.key(3)})
    assert out["pred_colors"] is None
    assert int(out["hint_mask"].sum()) == 4  # exactly n_clusters random anchors


def test_hint2regress_variant():
    m = AnchorColorProb(sp_size=16, n_clusters=4, hint2regress=True, enhanced=False)
    grays, colors = _inputs()
    variables = m.init(
        {"params": jax.random.key(0), "anchor": jax.random.key(1)}, grays, colors, True, 0, False
    )
    out = m.apply(variables, grays, colors, True, 0, False, rngs={"anchor": jax.random.key(3)})
    assert out["ref_logit"].shape == (1, 4, 4, 2)
    # hint2regress training path must not crash (reference had a NameError here)
    out2, _ = m.apply(
        variables,
        grays,
        colors,
        False,
        0,
        True,
        rngs={"anchor": jax.random.key(3), "dropout": jax.random.key(4)},
        mutable=["batch_stats", "spectral"],
    )
    assert out2["ref_logit"].shape == (1, 4, 4, 2)


def test_grad_flows_and_segnet_frozen(model_and_vars):
    """Loss gradients reach repnet/wildpath but NOT the frozen segnet."""
    m, variables = model_and_vars
    grays, colors = _inputs()
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(p):
        out = m.apply(
            {"params": p, **rest},
            grays,
            colors,
            False,
            0,
            False,
            rngs={"anchor": jax.random.key(3)},
        )
        return jnp.sum(out["pal_logit"] ** 2) * 1e-6 + jnp.sum(out["pred_colors"] ** 2) * 1e-6

    grads = jax.grad(loss_fn)(params)
    seg_norm = sum(
        float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads["segnet"])
    )
    rep_norm = sum(
        float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads["repnet"])
    )
    wild_norm = sum(
        float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads["wildpath"])
    )
    assert seg_norm == 0.0
    assert rep_norm > 0.0
    assert wild_norm > 0.0


def test_spix_pos_variant():
    """--spix_pos: positions pooled with features at full res (model.py:106-112)."""
    m = AnchorColorProb(sp_size=16, n_clusters=4, spix_pos=True, enhanced=False)
    grays, colors = _inputs()
    variables = m.init(
        {"params": jax.random.key(0), "anchor": jax.random.key(1)}, grays, colors, True, 0, False
    )
    out = m.apply(variables, grays, colors, True, 0, False, rngs={"anchor": jax.random.key(3)})
    assert out["pal_logit"].shape == (1, 4, 4, 313)


def test_learning_pos_variant():
    """--learning_pos: learned row/col embeddings sized from the real token grid
    (the reference sizes them with a 16//sp_size bug, model.py:58)."""
    m = AnchorColorProb(sp_size=16, n_clusters=4, learning_pos=True, enhanced=False)
    grays, colors = _inputs()
    variables = m.init(
        {"params": jax.random.key(0), "anchor": jax.random.key(1)}, grays, colors, True, 0, False
    )
    assert "pos_enc" in variables["params"]
    out = m.apply(variables, grays, colors, True, 0, False, rngs={"anchor": jax.random.key(3)})
    assert out["ref_logit"].shape == (1, 4, 4, 313)


def test_token_mask_variant():
    """use_mask: empty-superpixel entries masked out of attention (model.py:121-125)."""
    m = AnchorColorProb(sp_size=16, n_clusters=4, use_mask=True, enhanced=False)
    grays, colors = _inputs()
    variables = m.init(
        {"params": jax.random.key(0), "anchor": jax.random.key(1)}, grays, colors, True, 0, False
    )
    out = m.apply(variables, grays, colors, True, 0, False, rngs={"anchor": jax.random.key(3)})
    assert np.isfinite(np.asarray(out["pal_logit"])).all()


def test_n_clusters_sweep_including_degenerate():
    """BASELINE config #3 sweep: n_clusters in {4, 8, 16}; 16 == token count
    here, so every token is its own cluster — must not NaN or crash."""
    grays, colors = _inputs()
    for k in (8, 16):
        m = AnchorColorProb(sp_size=16, n_clusters=k, enhanced=False)
        variables = m.init(
            {"params": jax.random.key(0), "anchor": jax.random.key(1)}, grays, colors, True, 0, False
        )
        out = m.apply(variables, grays, colors, True, 0, False, rngs={"anchor": jax.random.key(3)})
        assert np.isfinite(np.asarray(out["ref_logit"])).all()
        n_anchors = int(out["hint_mask"].sum())
        assert 1 <= n_anchors <= k


def test_non_square_resolution():
    """no_resize semantics: any (H, W) multiple of sp_size works (here 64x96)."""
    m = AnchorColorProb(sp_size=16, n_clusters=4, enhanced=True)
    rng = np.random.default_rng(9)
    grays = jnp.asarray(rng.uniform(-1, 1, (1, 64, 96, 1)).astype(np.float32))
    colors = jnp.zeros((1, 64, 96, 2), jnp.float32)
    variables = m.init(
        {"params": jax.random.key(0), "anchor": jax.random.key(1)}, grays, colors, True, 0, False
    )
    out = m.apply(variables, grays, colors, True, 0, False, rngs={"anchor": jax.random.key(3)})
    assert out["pal_logit"].shape == (1, 4, 6, 313)
    assert out["pred_colors"].shape == (1, 64, 96, 2)
