"""Worker process for the 2-process jax.distributed test (test_multiprocess.py).

Each worker joins a jax.distributed rendezvous over localhost, takes its slice
of a deterministic global batch, assembles it with host_local_batch_to_global,
and runs ONE full colorizer data-parallel train step — the TPU-native
equivalent of one reference DDP step (/root/reference/main/train_colorizer_ddp.py
via init_dist + DistributedSampler, utils_train.py:111-120,221-241).

Run as: python mp_worker.py <process_id> <num_processes> <port> <global_batch>
(num_processes=1 skips the rendezvous — the single-process control run).
Prints: RESULT pid=<i> loss=<f> pnorm=<f>
"""

import os
import sys


def main():
    pid, nproc, port, gn = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], int(sys.argv[4])
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    # initialize_distributed must precede any backend-touching jax call
    from disentangledcolorization_tpu.parallel import initialize_distributed

    initialize_distributed(
        coordinator=f"localhost:{port}" if nproc > 1 else None,
        num_processes=nproc,
        process_id=pid if nproc > 1 else None,
    )

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    from disentangledcolorization_tpu.models import AnchorColorProb
    from disentangledcolorization_tpu.parallel import host_local_batch_to_global, make_mesh
    from disentangledcolorization_tpu.train import losses, optim, steps
    from disentangledcolorization_tpu.train.state import TrainState, segnet_frozen_mask

    assert jax.process_count() == nproc, (jax.process_count(), nproc)
    mesh = make_mesh()
    model = AnchorColorProb(sp_size=16, n_clusters=4, enhanced=True)

    h = w = 64
    rng = np.random.default_rng(0)  # same global batch in every process
    g_gray = rng.uniform(-1, 1, (gn, h, w, 1)).astype(np.float32)
    g_color = rng.uniform(-0.5, 0.5, (gn, h, w, 2)).astype(np.float32)
    lo, hi = pid * gn // nproc, (pid + 1) * gn // nproc
    local = {"gray": g_gray[lo:hi], "color": g_color[lo:hi]}

    variables = model.init(
        {"params": jax.random.key(0), "anchor": jax.random.key(1), "dropout": jax.random.key(2)},
        jnp.asarray(g_gray[:1]),
        jnp.asarray(g_color[:1]),
        False,
        0,
        True,
    )
    tx = optim.build_optimizer("adam", optim.build_schedule("poly", 2e-4, 60, 100))
    state = TrainState.create(
        variables, tx, trainable_mask=segnet_frozen_mask(variables["params"])
    )

    with jax.set_mesh(mesh):
        if nproc > 1:
            # every process holds an identical host-local copy -> global replicated
            state = multihost_utils.host_local_array_to_global_array(state, mesh, P())
        batch = host_local_batch_to_global(mesh, local)
        train_step = steps.make_colorizer_train_step(
            model, losses.AnchorColorProbLoss(enhanced=True)
        )
        new_state, metrics = train_step(state, batch, jax.random.key(3))
        loss = float(metrics["totalLoss"])  # replicated scalar, same on all procs
        pnorm = float(jax.jit(optax.global_norm)(new_state.params))
    assert int(new_state.step) == 1
    print(f"RESULT pid={pid} loss={loss:.6f} pnorm={pnorm:.6f}", flush=True)


if __name__ == "__main__":
    main()
