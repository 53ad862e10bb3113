"""Capture a device trace of the flagship inference forward and print the
op-level time table (the measured answer to "where do the non-MXU
milliseconds go").

Runs the same batch-16 256x256 forward as bench.py under jax.profiler, then
parses the trace locally with the tensorboard_plugin_profile convert API and
prints the top ops by self-time, grouped into pipeline stages by HLO metadata.

Run on the chip:  python tools/trace_forward.py [--batch 16] [--outdir /tmp/trace]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

H = W = 256


def capture(batch: int, outdir: str, iters: int = 4, int8: bool = False) -> None:
    from disentangledcolorization_tpu.models import AnchorColorProb

    model = AnchorColorProb(
        sp_size=16, n_clusters=8, enhanced=True, sn_folded=True, compute_dtype=jnp.bfloat16
    )
    rng = np.random.default_rng(0)
    grays = jnp.asarray(rng.uniform(-1, 1, (batch, H, W, 1)).astype(np.float32))
    colors = jnp.zeros((batch, H, W, 2), jnp.float32)
    # jitted batch-1 init: eager init costs ~230 s of per-op tunnel round trips
    variables = jax.jit(model.init, static_argnums=(3, 4, 5))(
        {"params": jax.random.key(0), "anchor": jax.random.key(1)},
        grays[:1],
        colors[:1],
        True,
        0,
        False,
    )
    jax.block_until_ready(variables)

    if int8:
        # bench.py's production PTQ setup: one f32 calibration forward records
        # per-conv activation amax into the 'quant' collection, then the traced
        # forwards run with static int8 scales (ops/quant.py)
        os.environ["DISCO_INT8"] = "calib"
        _, mut = jax.jit(
            lambda v, g, c, k: model.apply(
                v, g, c, True, 0, False, rngs={"anchor": k}, mutable=["quant"]
            )
        )(variables, grays, colors, jax.random.key(9))
        variables = {**variables, **jax.block_until_ready(mut)}
        os.environ["DISCO_INT8"] = "static"

    @jax.jit
    def fwd(g, key):
        out = model.apply(variables, g, colors, True, 0, False, rngs={"anchor": key})
        return out["pred_colors"]

    # warm up + compile outside the trace
    float(fwd(grays, jax.random.key(2)).mean())
    with jax.profiler.trace(outdir):
        for i in range(iters):
            float(fwd(grays + 0.001 * i, jax.random.key(3 + i)).mean())


def summarize(outdir: str, top: int = 40, runs: int = 4) -> None:
    """Aggregate XLA-op self-times from the chrome trace json.

    (tensorboard_plugin_profile's converter is broken in this env — protobuf
    descriptor mismatch — so parse the .trace.json.gz the profiler also
    writes.)
    """
    import collections

    traces = glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"), recursive=True)
    if not traces:
        print("no trace.json.gz found", file=sys.stderr)
        return
    with gzip.open(max(traces, key=os.path.getmtime)) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    pids, tids = {}, {}
    for e in ev:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                pids[e["pid"]] = e["args"].get("name", "")
            if e.get("name") == "thread_name":
                tids[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    ops = [
        e
        for e in ev
        if e.get("ph") == "X"
        and pids.get(e["pid"], "").startswith("/device:TPU")
        and tids.get((e["pid"], e.get("tid"))) == "XLA Ops"
    ]
    agg = collections.defaultdict(float)
    args = {}
    for e in ops:
        agg[e["name"]] += e["dur"]
        args.setdefault(e["name"], e.get("args", {}))
    total = sum(agg.values())
    print(f"total device op time: {total/1e3/runs:.2f} ms/run over {runs} runs")
    rows = sorted(agg.items(), key=lambda x: -x[1])
    acc = 0.0
    for n, d in rows[:top]:
        acc += d
        src = args[n].get("tf_op", "") or ""
        print(f"{d/1e3/runs:8.3f} ms  {n[:30]:30s} {src[:90]}")
    print(f"(top {top} = {100*acc/total:.1f}% of device time)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--outdir", type=str, default="/tmp/disco_trace")
    ap.add_argument("--summarize_only", action="store_true")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--int8", action="store_true", help="trace the production int8 PTQ config")
    args = ap.parse_args()
    if not args.summarize_only:
        capture(args.batch, args.outdir, int8=args.int8)
    summarize(args.outdir, args.top)


if __name__ == "__main__":
    main()
