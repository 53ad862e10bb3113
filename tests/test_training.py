"""End-to-end training behavior: losses decrease, state updates correctly."""

import jax
import jax.numpy as jnp
import numpy as np

from disentangledcolorization_tpu.models import AnchorColorProb, SpixelSeg
from disentangledcolorization_tpu.ops import superpixel as sp
from disentangledcolorization_tpu.train import losses, optim, steps
from disentangledcolorization_tpu.train.state import TrainState, segnet_frozen_mask


def test_colorizer_loss_decreases():
    model = AnchorColorProb(sp_size=16, n_clusters=4, enhanced=False, dropout=0.0)
    rng = np.random.default_rng(0)
    batch = {
        "gray": jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 1)).astype(np.float32)),
        "color": jnp.asarray(rng.uniform(-0.5, 0.5, (2, 64, 64, 2)).astype(np.float32)),
    }
    variables = model.init(
        {"params": jax.random.key(0), "anchor": jax.random.key(1), "dropout": jax.random.key(2)},
        batch["gray"], batch["color"], False, 0, True,
    )
    tx = optim.build_optimizer("adam", 1e-3)
    # snapshot before training: the jitted step donates (and deletes) its input state
    seg0 = [np.asarray(x) for x in jax.tree_util.tree_leaves(variables["params"]["segnet"])]
    state = TrainState.create(dict(variables), tx, trainable_mask=segnet_frozen_mask(variables["params"]))
    step = steps.make_colorizer_train_step(model, losses.AnchorColorProbLoss(enhanced=False))
    first = last = None
    for i in range(12):
        state, metrics = step(state, batch, jax.random.key(42))
        val = float(metrics["totalLoss"])
        first = val if first is None else first
        last = val
    assert np.isfinite(last)
    assert last < first * 0.9, f"loss did not decrease: {first} -> {last}"
    assert int(state.step) == 12
    # frozen segnet unchanged
    seg1 = jax.tree_util.tree_leaves(state.params["segnet"])
    for a, b in zip(seg0, seg1):
        np.testing.assert_array_equal(a, np.asarray(b))


def test_spixel_loss_decreases():
    model = SpixelSeg(train=True)
    rng = np.random.default_rng(1)
    n, h, w = 2, 64, 64
    _, coord = sp.init_spixel_grid(h, w, 16)
    batch = {
        "gray": jnp.asarray(rng.uniform(-1, 1, (n, h, w, 1)).astype(np.float32)),
        "feat": jnp.asarray(rng.uniform(-0.5, 0.5, (n, h, w, 2)).astype(np.float32)),
        "coord": jnp.broadcast_to(coord[None], (n, h, w, 2)),
    }
    variables = model.init(jax.random.key(0), batch["gray"])
    state = TrainState.create(dict(variables), optim.build_optimizer("adam", 1e-3))
    step = steps.make_spixel_train_step(model, kernel_size=16)
    first = last = None
    for i in range(10):
        state, metrics = step(state, batch, jax.random.key(0))
        val = float(metrics["totalLoss"])
        first = val if first is None else first
        last = val
    assert last < first, f"loss did not decrease: {first} -> {last}"


def test_colorizer_remat_step_matches_plain():
    """jax.checkpoint rematerialization must not change the step result."""
    model = AnchorColorProb(sp_size=16, n_clusters=4, enhanced=False, dropout=0.0)
    rng = np.random.default_rng(2)
    batch = {
        "gray": jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 1)).astype(np.float32)),
        "color": jnp.asarray(rng.uniform(-0.5, 0.5, (1, 64, 64, 2)).astype(np.float32)),
    }
    variables = model.init(
        {"params": jax.random.key(0), "anchor": jax.random.key(1), "dropout": jax.random.key(2)},
        batch["gray"], batch["color"], False, 0, True,
    )
    tx = optim.build_optimizer("adam", 1e-3)
    bundle = losses.AnchorColorProbLoss(enhanced=False)
    # compare the 2-step loss trajectory: adam's first-step update is
    # ~lr*sign(grad), so raw param comparison is sign-flip sensitive to
    # recompute reassociation noise; the loss path is the meaningful check
    results = []
    for remat in (False, True):
        fresh = jax.tree_util.tree_map(jnp.copy, dict(variables))
        state = TrainState.create(fresh, tx)
        step = steps.make_colorizer_train_step(model, bundle, remat=remat)
        traj = []
        for _ in range(2):
            state, metrics = step(state, batch, jax.random.key(9))
            traj.append(float(metrics["totalLoss"]))
        results.append(traj)
    np.testing.assert_allclose(results[0], results[1], rtol=1e-4)


def test_colorizer_grad_accum_matches_manual_accumulation():
    """grad_accum=2 (lax.scan path) must equal an eager two-microbatch
    accumulation with the same per-microbatch keys: averaged grads, BN/spectral
    state threaded sequentially, ONE optimizer update."""
    import optax

    model = AnchorColorProb(sp_size=16, n_clusters=4, enhanced=False, dropout=0.0)
    rng = np.random.default_rng(7)
    n, h, w, accum = 4, 64, 64, 2
    batch = {
        "gray": jnp.asarray(rng.uniform(-1, 1, (n, h, w, 1)).astype(np.float32)),
        "color": jnp.asarray(rng.uniform(-0.5, 0.5, (n, h, w, 2)).astype(np.float32)),
    }
    variables = model.init(
        {"params": jax.random.key(0), "anchor": jax.random.key(1), "dropout": jax.random.key(2)},
        batch["gray"][:1], batch["color"][:1], False, 0, True,
    )
    tx = optim.build_optimizer("adam", 1e-3)
    bundle = losses.AnchorColorProbLoss(enhanced=False)
    base_key = jax.random.key(11)

    # --- scan path under test
    state = TrainState.create(
        jax.tree_util.tree_map(jnp.copy, dict(variables)),
        tx, trainable_mask=segnet_frozen_mask(variables["params"]),
    )
    step = steps.make_colorizer_train_step(model, bundle, grad_accum=accum)
    new_state, metrics = step(state, batch, base_key)

    # --- eager spec
    state2 = TrainState.create(
        jax.tree_util.tree_map(jnp.copy, dict(variables)),
        tx, trainable_mask=segnet_frozen_mask(variables["params"]),
    )
    micro_grads = steps.make_micro_grads(model, bundle)
    anchor_key, dropout_key = jax.random.split(
        jax.random.fold_in(base_key, state2.step)
    )
    m = n // accum
    bs, spec = state2.batch_stats, state2.spectral
    grads_sum = jax.tree_util.tree_map(jnp.zeros_like, state2.params)
    losses_seen = []
    for i in range(accum):
        g, mtr, mut = micro_grads(
            state2.params, bs, spec,
            batch["gray"][i * m:(i + 1) * m], batch["color"][i * m:(i + 1) * m],
            jax.random.fold_in(anchor_key, i), jax.random.fold_in(dropout_key, i),
        )
        grads_sum = jax.tree_util.tree_map(jnp.add, grads_sum, g)
        bs, spec = mut["batch_stats"], mut["spectral"]
        losses_seen.append(float(mtr["totalLoss"]))
    grads = jax.tree_util.tree_map(lambda x: x / accum, grads_sum)
    ref_state = state2.apply_gradients(grads, new_batch_stats=bs, new_spectral=spec)

    np.testing.assert_allclose(
        float(metrics["totalLoss"]), np.mean(losses_seen), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(jax.jit(optax.global_norm)(new_state.params)),
        float(jax.jit(optax.global_norm)(ref_state.params)),
        rtol=1e-5,
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(new_state.batch_stats),
        jax.tree_util.tree_leaves(ref_state.batch_stats),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)
    assert int(new_state.step) == 1


def test_colorizer_grad_accum_rejects_indivisible_batch():
    import pytest

    model = AnchorColorProb(sp_size=16, n_clusters=4, enhanced=False, dropout=0.0)
    rng = np.random.default_rng(8)
    batch = {
        "gray": jnp.asarray(rng.uniform(-1, 1, (3, 64, 64, 1)).astype(np.float32)),
        "color": jnp.asarray(rng.uniform(-0.5, 0.5, (3, 64, 64, 2)).astype(np.float32)),
    }
    variables = model.init(
        {"params": jax.random.key(0), "anchor": jax.random.key(1), "dropout": jax.random.key(2)},
        batch["gray"][:1], batch["color"][:1], False, 0, True,
    )
    state = TrainState.create(dict(variables), optim.build_optimizer("adam", 1e-3))
    step = steps.make_colorizer_train_step(
        model, losses.AnchorColorProbLoss(enhanced=False), grad_accum=2
    )
    with pytest.raises(ValueError, match="grad_accum"):
        step(state, batch, jax.random.key(0))
