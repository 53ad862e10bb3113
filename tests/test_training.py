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
