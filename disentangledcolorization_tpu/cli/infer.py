"""Colorizer inference CLI — the north-star path (BASELINE config #1/#3/#4).

Capability parity with /root/reference/main/colorizer/inference.py: same public
flags (--checkpt --data --name --seed --psize --n_clusters --random_hint
--no_resize --diverse --hint2regress ...), same padding/resize semantics, PNG
output through cv2 LAB2RGB. dense_pos and model=AnchorColorProb are forced as
in the reference (inference.py:165-166); enhanced=True always (inference.py:74).

TPU-native: one jitted graph per (shape-bucket, mode); resize-mode inference is
batched across images for throughput; no_resize runs per bucket with a jit
cache keyed on the padded shape.

Usage: python -m disentangledcolorization_tpu.cli.infer --data ./imgs --checkpt ckpt.pkl
"""

from __future__ import annotations

import functools
import os
import pickle
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..models import AnchorColorProb
from ..ops import colorlabel as cl
from ..ops import hints as hints_ops
from ..ops import superpixel as sp
from ..utils import io as io_lib
from ..utils.config import inference_argparser


def load_variables(checkpt: str, model, example_args, seed: int = 0):
    """Load model variables from a converted pickle, an Orbax dir, or a raw
    torch .pth(.tar) (converted on the fly). Falls back to random init."""
    if checkpt and os.path.exists(checkpt):
        if checkpt.endswith((".pkl", ".pickle")):
            with open(checkpt, "rb") as f:
                return pickle.load(f), True
        if checkpt.endswith((".pth", ".tar", ".pth.tar")):
            from ..tools import convert_torch as cvt

            sd = cvt.load_torch_checkpoint(checkpt)
            return cvt.convert_disco_state_dict(sd, sn_folded=True), True
        if os.path.isdir(checkpt):
            from ..train.checkpoint import load_train_variables

            return load_train_variables(checkpt), True
    print("@Warning: no checkpoint loaded — random weights (smoke-test mode)")
    variables = model.init(
        {"params": jax.random.key(seed), "anchor": jax.random.key(seed + 1)}, *example_args
    )
    return variables, False


def build_model(args, sn_folded: bool) -> AnchorColorProb:
    return AnchorColorProb(
        sp_size=args.psize,
        d_model=args.d_model,
        use_dense_pos=True,  # forced, inference.py:165
        spix_pos=args.spix_pos,
        learning_pos=args.learning_pos,
        n_clusters=args.n_clusters,
        random_hint=args.random_hint,
        hint2regress=args.hint2regress,
        enhanced=True,  # forced, inference.py:74
        sn_folded=sn_folded,
        compute_dtype=jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32,
    )


def main(argv=None):
    args = inference_argparser().parse_args(argv)
    if args.quantize == "int8_safe":
        # palette-stable int8: identical machinery, but convs under repnet
        # (the anchor-feature trunk) stay bf16 (ops/quant.py::excluded)
        os.environ["DISCO_INT8_EXCLUDE"] = "repnet"
        args.quantize = "int8"
    args.dense_pos = True
    args.model = "AnchorColorProb"
    print(f"@Inference: [AnchorColorProb] (spixel-size={args.psize})")

    sampled_T = 2 if args.diverse else 0
    save_dir = os.path.join(args.save_dir, f"{args.name}-anchor{args.n_clusters}")
    os.makedirs(save_dir, exist_ok=True)
    img_list = io_lib.get_filelist(args.data)
    print(f"-data dir ({len(img_list)} images): {args.data}")
    print(f"-saving dir: {save_dir}")

    h0 = w0 = 256
    example = (
        jnp.zeros((1, h0, w0, 1), jnp.float32),
        jnp.zeros((1, h0, w0, 2), jnp.float32),
        True,
        sampled_T,
        False,
    )
    model = build_model(args, sn_folded=True)
    variables, loaded = load_variables(args.checkpt, model, example, args.seed)
    if args.checkpt:
        print("-weight loaded successfully." if loaded else "-weight load FAILED.")

    @functools.partial(jax.jit, static_argnames=())
    def forward(variables, grays, colors, key):
        out = model.apply(
            variables, grays, colors, True, sampled_T, False, rngs={"anchor": key}
        )
        # guided (pre-enhancement) colors, for parity with inference.py:111-115
        if args.hint2regress:
            guided = out["ref_logit"]
        else:
            guided = cl.decode_ind2ab(out["ref_logit"], T=0)
        guided_full = sp.upfeat(guided, out["affinity_map"], args.psize, args.psize)
        return out["pred_colors"], guided_full, out["hint_mask"], out["affinity_map"]

    # multi-chip: shard the image batch over all local devices (DP inference);
    # XLA partitions the whole graph, k-means and all (each image independent)
    n_dev = len(jax.devices())
    mesh = None
    spatial_sharding = None
    if n_dev > 1 and not args.no_resize and args.batch_size % n_dev == 0:
        from ..parallel import make_mesh, batch_sharding

        mesh = make_mesh()
        data_sharding = batch_sharding(mesh)
        print(f"-data-parallel inference over {n_dev} devices")
    elif n_dev > 1 and args.no_resize and args.shard_spatial:
        # context-parallel analog (SURVEY §5 long-context row): shard the H
        # axis; GSPMD inserts conv halo exchanges and token-stage gathers
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel import make_mesh

        smesh = make_mesh(axis="h")
        spatial_sharding = NamedSharding(smesh, P(None, "h", None, None))
        print(f"-spatially-sharded (H axis) inference over {n_dev} devices")

    key = jax.random.key(args.seed)
    t_start = time.time()
    n_done = 0
    calibrated = False
    # PNG writes go through a background thread unless --prefetch 0 (serial
    # reference behavior); flush() at the end re-raises any write error
    if args.prefetch > 0:
        writer = io_lib.AsyncWriter()
        save = writer.submit
    else:
        writer = None

        def save(fn, *a, **k):
            fn(*a, **k)
    if args.quantize == "int8":
        os.environ["DISCO_INT8"] = "0"  # off until calibrated (first batch)
    from ..utils.logging import profiler_trace

    def process_batch(grays_np, colors_np, names, orig_sizes):
        nonlocal key, n_done, variables, calibrated
        key, sub = jax.random.split(key)
        grays = jnp.asarray(grays_np)
        colors = jnp.asarray(colors_np)
        if mesh is not None:
            grays = jax.device_put(grays, data_sharding)
            colors = jax.device_put(colors, data_sharding)
        elif spatial_sharding is not None:
            grays = jax.device_put(grays, spatial_sharding)
            colors = jax.device_put(colors, spatial_sharding)
        if args.quantize == "int8" and not calibrated:
            # one f32 calibration pass on the first batch records per-conv
            # activation ranges (ops/quant.py); subsequent traces of
            # ``forward`` run the wide convs in int8 with those static scales
            os.environ["DISCO_INT8"] = "calib"
            _, mut = jax.jit(
                lambda v, g, c, k: model.apply(
                    v, g, c, True, sampled_T, False, rngs={"anchor": k}, mutable=["quant"]
                )
            )(variables, grays, colors, sub)
            variables = {**variables, **jax.block_until_ready(mut)}
            os.environ["DISCO_INT8"] = "static"
            calibrated = True
        pred_ab, guided, hint_mask, affinity = forward(variables, grays, colors, sub)
        pred_ab = np.asarray(pred_ab, np.float32)
        guided = np.asarray(guided, np.float32)
        if not np.isfinite(pred_ab).all():
            print(
                "@Warning: non-finite prediction values — broken/unconverged "
                "weights? (outputs will be garbage)",
                file=sys.stderr,
            )
        nb = grays_np.shape[0]
        for i in range(nb):
            if names[i] is None:  # batch-padding tail
                continue
            h, w = orig_sizes[i] if orig_sizes[i] is not None else grays_np.shape[1:3]
            if args.diverse:
                for no in range(3):
                    lab = np.concatenate([grays_np[i], pred_ab[no * nb + i]], axis=-1)[None]
                    if args.no_resize:
                        lab = lab[:, :h, :w]
                    save(io_lib.save_normLabs_from_batch, lab, save_dir, [names[i]], -1, suffix=f"c{no}")
            else:
                lab = np.concatenate([grays_np[i], pred_ab[i]], axis=-1)[None]
                if args.no_resize:
                    lab = lab[:, :h, :w]
                save(io_lib.save_normLabs_from_batch, lab, save_dir, [names[i]], -1)
                if args.save_guided:
                    glab = np.concatenate([grays_np[i], guided[i]], axis=-1)[None]
                    if args.no_resize:
                        glab = glab[:, :h, :w]
                    save(io_lib.save_normLabs_from_batch, glab, save_dir, [names[i]], -1, suffix="guided")
                if args.save_anchors:
                    masks = sp.upfeat(hint_mask[i : i + 1], affinity[i : i + 1], args.psize, args.psize)
                    marked = hints_ops.mark_color_hints(
                        grays[i : i + 1], pred_ab[i : i + 1], masks, base_abs=pred_ab[i : i + 1]
                    )
                    marked = np.asarray(marked)
                    if args.no_resize:
                        marked = marked[:, :h, :w]
                    save(io_lib.save_normLabs_from_batch, marked, save_dir, [names[i]], -1, suffix="anchors")
            n_done += 1

    if args.no_resize:
        # arbitrary resolutions: per-image, jit cache per padded shape bucket
        # (--bucket > 16 pads further to reduce distinct compiled shapes)
        bucket = max(args.bucket, args.psize)

        def decode_batches():
            for pth in img_list:
                name = os.path.splitext(os.path.basename(pth))[0] + ".png"
                print(f"-processing {os.path.basename(pth)} ...")
                gray, ab, _, (h, w) = io_lib.fetch_image_lab(pth, no_resize=True, scale=bucket)
                yield gray[None], ab[None], [name], [(h, w)]
    else:
        bs = max(args.batch_size, 1)

        def decode_batches():
            for s in range(0, len(img_list), bs):
                chunk = img_list[s : s + bs]
                grays, colors, names, sizes = [], [], [], []
                for pth in chunk:
                    g, ab, _, hw = io_lib.fetch_image_lab(pth, no_resize=False)
                    grays.append(g)
                    colors.append(ab)
                    names.append(os.path.splitext(os.path.basename(pth))[0] + ".png")
                    sizes.append(hw)
                pad = bs - len(chunk)
                gb = np.stack(grays + [grays[-1]] * pad)
                cb = np.stack(colors + [colors[-1]] * pad)
                yield gb, cb, names + [None] * pad, sizes + [None] * pad

    with profiler_trace(args.trace_dir or None):
        # pipeline: a background thread decodes batch b+1 while the device
        # computes batch b and the async writer saves batch b-1's PNGs. The
        # reference's loop is fully serial (inference.py:93-133); --prefetch 0
        # restores that.
        for item in io_lib.prefetch_iter(decode_batches(), depth=args.prefetch):
            process_batch(*item)
        if writer is not None:
            writer.flush()
    print(f"-processed {n_done} imgs. consumed {time.time() - t_start:.3f} sec")


if __name__ == "__main__":
    main()
