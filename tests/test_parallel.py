"""Multi-device tests on the 8-device virtual CPU mesh: DP training step,
sharding placement, and the driver's dryrun entry."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_mesh_has_8_devices():
    assert jax.device_count() >= 8


def test_dryrun_multichip_entry(monkeypatch):
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge

    # This test checks CORRECTNESS of the suite, not the driver's wall-clock
    # budget (the driver runs the default 1500 s deadline in a quiet process).
    # Inside a full pytest run the 8-thread collective legs contend with the
    # session's accumulated state on this 1-core host — measured 1026 s quiet
    # vs >1500 s mid-suite (round-5) — so give the subprocess more headroom
    # rather than failing on scheduler variance.
    monkeypatch.setenv("DISCO_DRYRUN_TIMEOUT", "2700")
    ge.dryrun_multichip(8)


def test_dp_step_matches_single_device():
    """A data-parallel spixel step over 8 devices must match the 1-device step."""
    from disentangledcolorization_tpu.models import SpixelSeg
    from disentangledcolorization_tpu.parallel import make_mesh, replicate, shard_batch
    from disentangledcolorization_tpu.train import optim, steps
    from disentangledcolorization_tpu.train.state import TrainState
    from disentangledcolorization_tpu.ops import superpixel as sp

    model = SpixelSeg(train=True)
    rng = np.random.default_rng(0)
    n, h, w = 8, 32, 32
    gray = rng.uniform(-1, 1, (n, h, w, 1)).astype(np.float32)
    color = rng.uniform(-0.5, 0.5, (n, h, w, 2)).astype(np.float32)
    _, coord = sp.init_spixel_grid(h, w, 16)
    batch = {
        "gray": jnp.asarray(gray),
        "feat": jnp.asarray(color),
        "coord": jnp.broadcast_to(coord[None], (n, h, w, 2)),
    }
    variables = model.init(jax.random.key(0), batch["gray"])
    tx = optim.build_optimizer("adam", 1e-3)

    def run(mesh):
        # fresh buffer copies: the jitted step donates its state argument
        fresh = jax.tree_util.tree_map(jnp.copy, dict(variables))
        state = TrainState.create(fresh, tx)
        step = steps.make_spixel_train_step(model, kernel_size=16)
        if mesh is not None:
            state = replicate(mesh, state)
            b = shard_batch(mesh, batch)
            with jax.set_mesh(mesh):
                state, metrics = step(state, b, jax.random.key(1))
        else:
            state, metrics = step(state, batch, jax.random.key(1))
        return float(metrics["totalLoss"]), jax.tree_util.tree_map(np.asarray, state.params)

    loss1, params1 = run(None)
    loss8, params8 = run(make_mesh(8))
    np.testing.assert_allclose(loss1, loss8, rtol=1e-4)
    flat1 = jax.tree_util.tree_leaves(params1)
    flat8 = jax.tree_util.tree_leaves(params8)
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_batch_sharding_placement():
    from disentangledcolorization_tpu.parallel import make_mesh, shard_batch

    mesh = make_mesh(8)
    x = jnp.zeros((16, 4))
    (sx,) = jax.tree_util.tree_leaves(shard_batch(mesh, {"x": x}))
    assert len(sx.sharding.device_set) == 8
    # each device holds 1/8 of the batch
    shard_shapes = {s.data.shape for s in sx.addressable_shards}
    assert shard_shapes == {(2, 4)}


def test_spatial_sharded_inference_matches_replicated():
    """Context/sequence-parallel analog for vision: shard the image H axis over
    the mesh for huge no_resize inputs; GSPMD inserts halo exchanges for the
    convs and gathers for the token stage. Output must match the unsharded run.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from disentangledcolorization_tpu.models import SpixelSeg
    from disentangledcolorization_tpu.ops import superpixel as sp
    from disentangledcolorization_tpu.parallel import make_mesh

    mesh = make_mesh(8, axis="h")
    model = SpixelSeg()
    rng = np.random.default_rng(0)
    gray = jnp.asarray(rng.uniform(-1, 1, (1, 128, 128, 1)).astype(np.float32))
    feat = jnp.asarray(rng.uniform(-1, 1, (1, 128, 128, 2)).astype(np.float32))
    variables = model.init(jax.random.key(0), gray)

    @jax.jit
    def fwd(v, g, f):
        prob = model.apply(v, g)
        pooled = sp.poolfeat(f, prob, 16, 16)
        return sp.upfeat(pooled, prob, 16, 16)

    ref = np.asarray(fwd(variables, gray, feat))
    with jax.set_mesh(mesh):
        sh = NamedSharding(mesh, P(None, "h", None, None))
        g_s = jax.device_put(gray, sh)
        f_s = jax.device_put(feat, sh)
        out = np.asarray(fwd(variables, g_s, f_s))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_diverse_forward_under_data_sharding():
    """Diverse mode tiles the batch 3x inside the graph; must compose with a
    batch-sharded input (DP inference on a pod)."""
    from disentangledcolorization_tpu.models import AnchorColorProb
    from disentangledcolorization_tpu.parallel import batch_sharding, make_mesh

    mesh = make_mesh(8)
    m = AnchorColorProb(sp_size=16, n_clusters=2, enhanced=False)
    rng = np.random.default_rng(0)
    grays = jnp.asarray(rng.uniform(-1, 1, (8, 32, 32, 1)).astype(np.float32))
    colors = jnp.zeros((8, 32, 32, 2), jnp.float32)
    variables = m.init(
        {"params": jax.random.key(0), "anchor": jax.random.key(1)}, grays, colors, True, 2, False
    )
    with jax.set_mesh(mesh):
        sh = batch_sharding(mesh)
        out = m.apply(
            variables,
            jax.device_put(grays, sh),
            jax.device_put(colors, sh),
            True,
            2,
            False,
            rngs={"anchor": jax.random.key(3)},
        )
    assert out["ref_logit"].shape == (24, 2, 2, 313)
    assert np.isfinite(np.asarray(out["ref_logit"])).all()


def test_hierarchical_mesh_dp_step():
    """2x4 (slices x chips) mesh: DP over both axes matches the flat-mesh step."""
    from disentangledcolorization_tpu.models import SpixelSeg
    from disentangledcolorization_tpu.ops import superpixel as sp
    from disentangledcolorization_tpu.parallel import make_mesh, replicate
    from disentangledcolorization_tpu.parallel.mesh import (
        hierarchical_batch_sharding,
        make_hierarchical_mesh,
    )
    from disentangledcolorization_tpu.train import optim, steps
    from disentangledcolorization_tpu.train.state import TrainState

    model = SpixelSeg(train=True)
    rng = np.random.default_rng(5)
    n, h, w = 8, 32, 32
    _, coord = sp.init_spixel_grid(h, w, 16)
    batch = {
        "gray": jnp.asarray(rng.uniform(-1, 1, (n, h, w, 1)).astype(np.float32)),
        "feat": jnp.asarray(rng.uniform(-0.5, 0.5, (n, h, w, 2)).astype(np.float32)),
        "coord": jnp.broadcast_to(coord[None], (n, h, w, 2)),
    }
    variables = model.init(jax.random.key(0), batch["gray"])
    tx = optim.build_optimizer("adam", 1e-3)

    losses = []
    for mesh, sharding in (
        (make_mesh(8), None),
        (make_hierarchical_mesh(2), None),
    ):
        fresh = jax.tree_util.tree_map(jnp.copy, dict(variables))
        state = replicate(mesh, TrainState.create(fresh, tx))
        sh = (
            hierarchical_batch_sharding(mesh)
            if len(mesh.axis_names) == 2
            else jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data"))
        )
        b = jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
        step = steps.make_spixel_train_step(model, kernel_size=16)
        with jax.set_mesh(mesh):
            _, metrics = step(state, b, jax.random.key(1))
        losses.append(float(metrics["totalLoss"]))
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-5)
