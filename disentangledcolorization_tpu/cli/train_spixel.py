"""Stage-1 SpixelNet training CLI.

Capability parity with /root/reference/main/spixelseg/train_spixel.py (and its
DDP variant train_spixe_ddp.py): ab+xy reconstruction loss (SPixelLoss), Adam,
poly LR decay, per-epoch validation with boundary-marked spixel map dumps,
last/best checkpoints, resume. TPU-native: one jitted DP step over a device
mesh; multi-host via --coordinator/--num_processes (jax.distributed).

The reference passes scheduler args in the wrong order at train_spixel.py:80
(epochs as lr_decay_ratio) — not replicated.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..models import SpixelSeg
from ..ops import superpixel as sp
from ..parallel import make_mesh, replicate, shard_batch
from ..train import data as data_lib
from ..train import optim, steps
from ..train.checkpoint import CheckpointManager, restore_with_clip_migration
from ..train.losses import spixel_loss
from ..train.state import TrainState
from ..utils import io as io_lib
from ..utils.config import spixel_argparser
from ..utils.logging import MetricsWriter, StepTimer, build_logger
from ..utils.signals import GracefulShutdown, register_stack_dump


def main(argv=None):
    args = spixel_argparser().parse_args(argv)
    register_stack_dump()  # kill -USR1 <pid> = thread dump, not termination
    from ..parallel import initialize_distributed

    initialize_distributed(args.coordinator, args.num_processes, args.process_id)
    run_dir = os.path.join(args.save_dir, args.name)
    is_main = jax.process_index() == 0
    logger = build_logger(run_dir) if is_main else None
    writer_t = MetricsWriter(run_dir, "train") if is_main else None
    writer_v = MetricsWriter(run_dir, "val") if is_main else None

    mesh = make_mesh()
    n_dev = len(mesh.devices.flatten())
    global_batch = args.batch_size * n_dev  # per-device batch scaling (train_spixel.py:44-45 analog)

    train_ds = data_lib.build_dataset(
        args.dataset, args.data, "train", args.input_size, cache=args.cache_data
    )
    val_ds = data_lib.build_dataset(
        args.dataset, args.data, "val", args.input_size, cache=args.cache_data
    )
    loader_kwargs = dict(
        batch_size=global_batch // jax.process_count(),
        num_workers=args.num_workers,
        process_id=jax.process_index(),
        num_processes=jax.process_count(),
        seed=args.seed,
    )
    train_loader = data_lib.DataLoader(train_ds, shuffle=True, **loader_kwargs)
    val_loader = data_lib.DataLoader(val_ds, shuffle=False, **loader_kwargs)

    model = SpixelSeg(train=True)
    eval_model = SpixelSeg(train=False)
    example = jnp.zeros((1, args.input_size, args.input_size, 1), jnp.float32)
    # jitted init: eager init through the axon TPU tunnel pays one round trip
    # per op; one compiled call is far cheaper (same fix as bench.py)
    variables = jax.jit(model.init)(jax.random.key(args.seed), example)
    if is_main:
        n_params = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
        logger.info(f"SpixelSeg params: {n_params / 1e6:.2f}M, devices: {n_dev}")

    steps_per_epoch = max(len(train_loader), 1)
    schedule = optim.build_schedule(args.scheduler, args.lr, args.epochs, steps_per_epoch, args.lr_decay_ratio)
    tx = optim.build_optimizer(
        args.optimizer, schedule, weight_decay=args.wd, grad_clip=args.grad_clip
    )
    state = TrainState.create(variables, tx)
    mgr = CheckpointManager(os.path.join(run_dir, "checkpts"))
    start_epoch, best_loss = 0, float("inf")
    if args.resume and mgr.exists("last"):
        def make_alt_state():
            alt_tx = optim.build_optimizer(
                args.optimizer, schedule, weight_decay=args.wd,
                grad_clip=0.0 if args.grad_clip and args.grad_clip > 0 else 1.0,
            )
            return TrainState.create(variables, alt_tx)

        restored, start_epoch, best_loss = restore_with_clip_migration(
            mgr, "last", state, make_alt_state, logger if is_main else None
        )
        state = jax.tree_util.tree_map(jnp.asarray, restored)
        if is_main:
            logger.info(f"resumed from epoch {start_epoch} (best {best_loss:.4f})")

    state = replicate(mesh, state)
    train_step = steps.make_spixel_train_step(model, kernel_size=args.psize)
    _, coord = sp.init_spixel_grid(args.input_size, args.input_size, args.psize)
    coord_np = np.asarray(coord)

    @jax.jit
    def eval_step(variables, batch):
        prob = eval_model.apply(variables, batch["gray"])
        labxy = jnp.concatenate([batch["feat"], batch["coord"]], axis=-1)
        return spixel_loss(prob, labxy, args.psize), prob

    def add_coord(batch):
        n = batch["gray"].shape[0]
        # reconstruction feature: ab chroma or BGR pixels (--feat, utils_argument.py)
        batch["feat"] = batch["color"] if args.feat == "ab" else batch["BGR"]
        batch["coord"] = np.broadcast_to(coord_np[None], (n,) + coord_np.shape).copy()
        return batch

    ids, _ = sp.init_spixel_grid(args.input_size, args.input_size, args.psize)

    with jax.set_mesh(mesh), GracefulShutdown() as shutdown:
        for epoch in range(start_epoch, args.epochs):
            train_loader.set_epoch(epoch)
            timer = StepTimer()
            ep_loss, n_steps = 0.0, 0
            for it, batch in enumerate(train_loader):
                if shutdown.requested:
                    break
                batch = shard_batch(mesh, add_coord(batch))
                timer.mark_data()
                state, metrics = train_step(state, batch, jax.random.key(args.seed))
                metrics = jax.device_get(metrics)  # one tunnel round trip for all scalars
                timer.mark_step(global_batch)
                loss = float(metrics["totalLoss"])
                ep_loss += loss
                n_steps += 1
                if is_main and it % 100 == 0:
                    s = timer.summary()
                    logger.info(
                        f"epoch {epoch} iter {it}: loss {loss:.4f} "
                        f"(io/proc {s['io_proc_ratio']:.2f}, {s['images_per_sec']:.1f} img/s)"
                    )
            ep_loss /= max(n_steps, 1)
            if not np.isfinite(ep_loss):
                # fail fast and DON'T overwrite 'last' with poisoned params —
                # resume from the last finite checkpoint (use --grad_clip to
                # bound the soft-pool 1/mass^2 backward spike, train/optim.py)
                if is_main:
                    logger.error(
                        f"non-finite train loss at epoch {epoch} ({ep_loss}); "
                        "aborting WITHOUT checkpointing. Resume from the last "
                        "finite checkpoint, ideally with --grad_clip > 0."
                    )
                break
            if is_main:
                writer_t.scalar("train/totalLoss", ep_loss, epoch)

            if shutdown.requested:
                # preemption: final "last" snapshot (epoch not advanced so
                # --resume redoes it), then a clean exit
                if is_main:
                    logger.info(
                        f"shutdown signal received at epoch {epoch} iter {n_steps}: "
                        "checkpointing and exiting"
                    )
                    host_state = jax.device_get(state)  # one batched transfer (vs per-leaf tunnel round trips)
                    mgr.save("last", host_state, epoch, best_loss)
                break

            # validation + visual dumps (train_spixel.py:173-226)
            val_loss, vn = 0.0, 0
            for it, batch in enumerate(val_loader):
                batch = shard_batch(mesh, add_coord(batch))
                metrics, prob = eval_step(state.variables(), batch)
                val_loss += float(metrics["totalLoss"])
                vn += 1
                if is_main and it == 0:
                    spix_map = sp.split_spixels(prob[:4], ids)
                    io_lib.save_markedSP_from_batch(
                        np.asarray(batch["BGR"][:4])[..., ::-1],
                        np.asarray(spix_map),
                        os.path.join(run_dir, "val_imgs"),
                        [],
                        epoch,
                    )
            if vn == 0:
                # val set smaller than the global batch (drop_last): a silent
                # 0.0 here would be recorded as a spurious "best"
                if is_main:
                    logger.warning(
                        "validation produced no batches (val set < global batch); "
                        "saving 'last' only"
                    )
                    host_state = jax.device_get(state)  # one batched transfer (vs per-leaf tunnel round trips)
                    mgr.save("last", host_state, epoch + 1, best_loss)
                continue
            val_loss /= vn
            if is_main:
                writer_v.scalar("val/totalLoss", val_loss, epoch)
                logger.info(f"epoch {epoch}: train {ep_loss:.4f} val {val_loss:.4f}")
                host_state = jax.device_get(state)  # one batched transfer (vs per-leaf tunnel round trips)
                mgr.save("last", host_state, epoch + 1, min(best_loss, val_loss))
                if val_loss < best_loss:
                    best_loss = val_loss
                    mgr.save("best", host_state, epoch + 1, best_loss)
    if is_main:
        writer_t.flush()
        writer_v.flush()
        logger.info("done.")


if __name__ == "__main__":
    main()
