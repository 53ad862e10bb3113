"""Stage-2 colorizer training CLI (AnchorColorProb).

Capability parity with /root/reference/main/colorizer/train_colorizer.py (and
train_colorizer_ddp.py): frozen SpixelNet from the stage-1 checkpoint, palLoss
(rebalanced CE) + refLoss (CE or 50*l2) + perceptual recLoss, Adam + poly decay
(lr 2e-4, 60 epochs recipe), validation with intermediate image dumps, last/best
checkpoints, resume, per-100-iter loss + io/proc ratio logging.

TPU-native replacements: jitted DP step over a jax mesh (gradients all-reduced
by XLA; global-batch BatchNorm = SyncBN), Orbax checkpoints, jax.distributed
multi-host. The reference's perceptual-loss argument bug is fixed
(see train/losses.py).
"""

from __future__ import annotations

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from ..models import AnchorColorProb, xavier_reinit_params
from ..ops import colorlabel as cl
from ..ops import superpixel as sp
from ..parallel import initialize_distributed, make_mesh, replicate, shard_batch
from ..train import data as data_lib
from ..train import optim, steps
from ..train.checkpoint import CheckpointManager, restore_with_clip_migration
from ..train.losses import AnchorColorProbLoss
from ..train.state import TrainState, segnet_frozen_mask
from ..utils import io as io_lib
from ..utils.config import pcolor_argparser
from ..utils.logging import MetricsWriter, StepTimer, build_logger, steptime_stats
from ..utils.signals import GracefulShutdown, register_stack_dump


def _merge_segnet(variables: dict, spixel_vars: dict) -> dict:
    """Install frozen stage-1 SpixelNet weights (load_and_froze_weight,
    model.py:78-87)."""
    variables = jax.tree_util.tree_map(lambda x: x, variables)  # shallow copy
    variables["params"] = dict(variables["params"])
    variables["params"]["segnet"] = spixel_vars["params"]
    if "batch_stats" in spixel_vars:
        variables["batch_stats"] = dict(variables.get("batch_stats", {}))
        variables["batch_stats"]["segnet"] = spixel_vars["batch_stats"]
    return variables


def main(argv=None):
    args = pcolor_argparser().parse_args(argv)
    register_stack_dump()  # kill -USR1 <pid> = thread dump, not termination
    initialize_distributed(args.coordinator, args.num_processes, args.process_id)
    run_dir = os.path.join(args.save_dir, args.name)
    is_main = jax.process_index() == 0
    logger = build_logger(run_dir) if is_main else None
    writer_t = MetricsWriter(run_dir, "train") if is_main else None
    writer_v = MetricsWriter(run_dir, "val") if is_main else None

    mesh = make_mesh()
    n_dev = len(mesh.devices.flatten())
    global_batch = args.batch_size * n_dev

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

    # --device_data: dataset lives in HBM, only int32 index batches move per
    # step (zero steady-state host->device input traffic; the axon tunnel
    # retains every shipped buffer — see train/data.py::DeviceIndexLoader).
    # Same default_rng(seed+epoch) shuffle as DataLoader, so a --resume that
    # switches modes continues the identical batch sequence.
    dd_train = dd_val = None
    if args.device_data:
        if jax.process_count() > 1:
            raise SystemExit("--device_data is single-process; multi-host uses the sharded DataLoader")
        dd_train = replicate(mesh, data_lib.stack_dataset(train_ds))
        dd_val = replicate(mesh, data_lib.stack_dataset(val_ds))
        train_loader = data_lib.DeviceIndexLoader(len(train_ds), global_batch, shuffle=True, seed=args.seed)
        val_loader = data_lib.DeviceIndexLoader(len(val_ds), global_batch, shuffle=False, seed=args.seed)
        if is_main:
            nbytes = sum(a.nbytes for d in (dd_train, dd_val) for a in d.values())
            logger.info(f"device-resident dataset: {nbytes/1e9:.2f} GB uploaded once")

    model = AnchorColorProb(
        sp_size=args.psize,
        d_model=args.d_model,
        use_dense_pos=args.dense_pos,
        spix_pos=args.spix_pos,
        learning_pos=args.learning_pos,
        n_clusters=args.n_clusters,
        random_hint=args.random_hint,
        hint2regress=args.hint2regress,
        enhanced=args.enhanced,
        n_enc_layers=args.n_enc,
        d_mlp=args.d_mlp,
        compute_dtype=jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32,
    )
    example_g = jnp.zeros((1, args.input_size, args.input_size, 1), jnp.float32)
    example_c = jnp.zeros((1, args.input_size, args.input_size, 2), jnp.float32)
    # jitted init: eager init through the axon tunnel costs one round trip per
    # op (~minutes for this model); one compiled call is ~20 s (same fix as
    # bench.py). xavier_reinit is jitted for the same reason.
    variables = jax.jit(model.init, static_argnums=(3, 4, 5))(
        {"params": jax.random.key(args.seed), "anchor": jax.random.key(1), "dropout": jax.random.key(2)},
        example_g, example_c, False, 0, True,
    )
    # blanket xavier re-init of matrices, as the reference ctor does (model.py:73-76)
    variables = dict(variables)
    variables["params"] = jax.jit(xavier_reinit_params)(
        jax.random.key(args.seed + 7), variables["params"]
    )

    # frozen stage-1 superpixel net
    if args.spixel_ckpt:
        if args.spixel_ckpt.endswith((".pkl", ".pickle")):
            with open(args.spixel_ckpt, "rb") as f:
                spixel_vars = pickle.load(f)
        elif os.path.isdir(args.spixel_ckpt):
            # stage-1's own Orbax run/snapshot dir (SpixelNet has no SN,
            # folding is a no-op)
            from ..train.checkpoint import load_train_variables

            spixel_vars = load_train_variables(args.spixel_ckpt)
        else:
            from ..tools import convert_torch as cvt

            spixel_vars = cvt.convert_spixelseg_state_dict(cvt.load_torch_checkpoint(args.spixel_ckpt))
        variables = _merge_segnet(variables, spixel_vars)
        if is_main:
            logger.info(f"frozen SpixelNet loaded from {args.spixel_ckpt}")
    elif is_main:
        logger.warning("no --spixel_ckpt: segnet is random AND frozen (smoke-test only)")

    if is_main:
        n_params = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
        logger.info(f"AnchorColorProb params: {n_params / 1e6:.2f}M, devices: {n_dev}")

    steps_per_epoch = max(len(train_loader), 1)
    schedule = optim.build_schedule(args.scheduler, args.lr, args.epochs, steps_per_epoch, args.lr_decay_ratio)
    tx = optim.build_optimizer(
        args.optimizer, schedule, weight_decay=args.wd, grad_clip=args.grad_clip
    )
    state = TrainState.create(variables, tx, trainable_mask=segnet_frozen_mask(variables["params"]))
    mgr = CheckpointManager(os.path.join(run_dir, "checkpts"))
    start_epoch, best_loss = 0, float("inf")
    if args.resume and mgr.exists("last"):
        def make_alt_state():
            alt_tx = optim.build_optimizer(
                args.optimizer, schedule, weight_decay=args.wd,
                grad_clip=0.0 if args.grad_clip and args.grad_clip > 0 else 1.0,
            )
            return TrainState.create(
                variables, alt_tx, trainable_mask=segnet_frozen_mask(variables["params"])
            )

        restored, start_epoch, best_loss = restore_with_clip_migration(
            mgr, "last", state, make_alt_state, logger if is_main else None
        )
        state = jax.tree_util.tree_map(jnp.asarray, restored)
        if is_main:
            logger.info(f"resumed from epoch {start_epoch} (best {best_loss:.4f})")

    from ..models.vgg import load_vgg19_params

    vgg_vars = load_vgg19_params(args.vgg_npz or None) if args.enhanced else None
    if is_main and args.enhanced:
        logger.info("perceptual loss: " + ("VGG19" if vgg_vars else "L1 fallback (no VGG weights)"))
    loss_bundle = AnchorColorProbLoss(
        hint2regress=args.hint2regress,
        enhanced=args.enhanced,
        with_grad=args.in_gradient,
        vgg_variables=vgg_vars,
        feat_type=args.vgg_type,
    )
    state = replicate(mesh, state)
    class_lambda = 1.0 - args.colorfulness  # reference train_colorizer.py:270-271
    train_step = steps.make_colorizer_train_step(
        model, loss_bundle, remat=args.remat, class_lambda=class_lambda,
        grad_accum=args.grad_accum,
    )
    eval_model = model
    eval_step = steps.make_colorizer_eval_step(eval_model, loss_bundle, class_lambda=class_lambda)

    if args.device_data:
        from ..parallel import batch_sharding

        _inner_train_step = train_step
        _bsh = batch_sharding(mesh)

        @jax.jit
        def train_step_dd(state, dd, idx, base_key):
            # gather fuses into the step graph: one dispatch, no input ship
            batch = {k: jax.lax.with_sharding_constraint(jnp.take(dd[k], idx, axis=0), _bsh)
                     for k in ("gray", "color")}
            return _inner_train_step(state, batch, base_key)

        def gather_val(idx):
            return {k: jnp.take(dd_val[k], jnp.asarray(idx), axis=0) for k in ("gray", "color")}

    base_key = jax.random.key(args.seed)
    run_steptimes: list[float] = []  # per-step seconds across the whole run
    with jax.set_mesh(mesh), GracefulShutdown() as shutdown:
        for epoch in range(start_epoch, args.epochs):
            train_loader.set_epoch(epoch)
            timer = StepTimer()
            sums, n_steps = {}, 0
            for it, batch in enumerate(train_loader):
                if shutdown.requested:
                    break
                if dd_train is not None:
                    timer.mark_data()
                    state, metrics = train_step_dd(state, dd_train, jnp.asarray(batch), base_key)
                else:
                    batch = shard_batch(mesh, {"gray": batch["gray"], "color": batch["color"]})
                    timer.mark_data()
                    state, metrics = train_step(state, batch, base_key)
                # ONE device->host transfer for all scalars: each float() of a
                # device scalar is a separate ~28 ms axon-tunnel round trip
                metrics = jax.device_get(metrics)
                timer.mark_step(global_batch)
                n_steps += 1
                for k, v in metrics.items():
                    sums[k] = sums.get(k, 0.0) + float(v)
                if is_main and it % 100 == 0:
                    s = timer.summary()
                    logger.info(
                        f"epoch {epoch} iter {it}: total {float(metrics['totalLoss']):.4f} "
                        f"pal {float(metrics['palLoss']):.4f} ref {float(metrics['refLoss']):.4f} "
                        f"rec {float(metrics['recLoss']):.4f} "
                        f"(io/proc {s['io_proc_ratio']:.2f}, {s['images_per_sec']:.1f} img/s)"
                    )
            run_steptimes.extend(timer.durations)
            ep_total = sums.get("totalLoss", 0.0) / max(n_steps, 1)
            if not np.isfinite(ep_total):
                # fail fast and DON'T overwrite 'last' with poisoned params
                # (soft-pool 1/mass^2 backward spike — see train/optim.py)
                if is_main:
                    logger.error(
                        f"non-finite train loss at epoch {epoch} ({ep_total}); "
                        "aborting WITHOUT checkpointing. Resume from the last "
                        "finite checkpoint, ideally with --grad_clip > 0."
                    )
                break
            if is_main:
                for k, v in sums.items():
                    writer_t.scalar(f"train/{k}", v / max(n_steps, 1), epoch)

            if shutdown.requested:
                # preemption: one final "last" snapshot, then a clean exit.
                # Saved epoch = the one we were in, so --resume redoes it.
                if is_main:
                    logger.info(
                        f"shutdown signal received at epoch {epoch} iter {n_steps}: "
                        "checkpointing and exiting"
                    )
                    host_state = jax.device_get(state)  # one batched transfer (vs per-leaf tunnel round trips)
                    mgr.save("last", host_state, epoch, best_loss)
                break

            # validation (+ intermediate image dumps, train_colorizer.py:215-243)
            if (epoch + 1) % args.eval_freq != 0 and epoch + 1 != args.epochs:
                continue
            val_loss, vn = 0.0, 0
            for it, batch in enumerate(val_loader):
                if dd_val is not None:
                    b = gather_val(batch)
                else:
                    b = shard_batch(mesh, {"gray": batch["gray"], "color": batch["color"]})
                metrics = eval_step(state, b, jax.random.fold_in(base_key, 10_000 + it))
                val_loss += float(metrics["totalLoss"])
                vn += 1
                if is_main and it == 0:
                    _dump_val_images(model, state, b, run_dir, epoch, args)
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
                logger.info(f"epoch {epoch}: val {val_loss:.4f}")
                host_state = jax.device_get(state)  # one batched transfer (vs per-leaf tunnel round trips)
                mgr.save("last", host_state, epoch + 1, min(best_loss, val_loss))
                if val_loss < best_loss:
                    best_loss = val_loss
                    mgr.save("best", host_state, epoch + 1, best_loss)
    if is_main:
        # run-level step-time stability (soak evidence: p50/p99 + first-vs-
        # last-quartile drift). run_steptimes[0] is the jit-compile step of a
        # cold start — excluded so percentiles describe steady state.
        stats = steptime_stats(run_steptimes[1:] if start_epoch == 0 else run_steptimes)
        if stats:
            logger.info(
                "step-time stability: "
                + " ".join(f"{k}={v:.1f}" if isinstance(v, float) else f"{k}={v}" for k, v in stats.items())
            )
            for k, v in stats.items():
                writer_t.scalar(f"steptime/{k}", float(v), int(state.step))
        writer_t.flush()
        writer_v.flush()
        logger.info("done.")


_dump_fwd_cache: dict = {}


def _dump_val_images(model, state, batch, run_dir, epoch, args, max_n: int = 4):
    """Decode pal/ref predictions, unpool, and save visualization panels.

    The whole device-side computation is one jitted graph (compiled once,
    reused every dump): an eager forward through the axon TPU tunnel costs
    one round trip per op, which would dominate the epoch time."""
    from ..ops import hints as hints_ops

    # Keyed on the model AND the closure-captured args that change the traced
    # graph (a same-model call with different psize/hint2regress must not
    # reuse a stale executable — advisor finding, round 3).
    cache_key = (id(model), args.psize, args.hint2regress)
    if cache_key not in _dump_fwd_cache:

        @jax.jit
        def fwd(variables, gray, color, akey):
            out = model.apply(variables, gray, color, False, 0, False, rngs={"anchor": akey})
            pal_ab = cl.decode_ind2ab(out["pal_logit"], T=0.38)
            pal_full = sp.upfeat(pal_ab, out["affinity_map"], args.psize, args.psize)
            ref_ab = (
                out["ref_logit"] if args.hint2regress else cl.decode_ind2ab(out["ref_logit"], T=0)
            )
            ref_full = sp.upfeat(ref_ab, out["affinity_map"], args.psize, args.psize)
            anchor_masks = sp.upfeat(out["hint_mask"], out["affinity_map"], args.psize, args.psize)
            marked = hints_ops.mark_color_hints(gray, ref_full, anchor_masks, base_abs=ref_full)
            return pal_full, ref_full, out["pred_colors"], marked

        _dump_fwd_cache[cache_key] = fwd

    pal_full, ref_full, pred_colors, marked = _dump_fwd_cache[cache_key](
        state.variables(), batch["gray"][:max_n], batch["color"][:max_n], jax.random.key(epoch)
    )
    grays = np.asarray(batch["gray"][:max_n])
    dump_dir = os.path.join(run_dir, "val_imgs")
    io_lib.save_normLabs_from_batch(
        np.concatenate([grays, np.asarray(pal_full)], -1), dump_dir, [], epoch, suffix="pal"
    )
    io_lib.save_normLabs_from_batch(
        np.concatenate([grays, np.asarray(ref_full)], -1), dump_dir, [], epoch, suffix="ref"
    )
    if pred_colors is not None:
        io_lib.save_normLabs_from_batch(
            np.concatenate([grays, np.asarray(pred_colors)], -1),
            dump_dir,
            [],
            epoch,
            suffix="enhanced",
        )
    # anchor-location panel (train_colorizer.py:236 equivalent)
    io_lib.save_normLabs_from_batch(np.asarray(marked), dump_dir, [], epoch, suffix="hints")


if __name__ == "__main__":
    main()
