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


def capture(batch: int, outdir: str, iters: int = 4) -> None:
    from disentangledcolorization_tpu.models import AnchorColorProb

    model = AnchorColorProb(
        sp_size=16, n_clusters=8, enhanced=True, sn_folded=True, compute_dtype=jnp.bfloat16
    )
    rng = np.random.default_rng(0)
    grays = jnp.asarray(rng.uniform(-1, 1, (batch, H, W, 1)).astype(np.float32))
    colors = jnp.zeros((batch, H, W, 2), jnp.float32)
    variables = model.init(
        {"params": jax.random.key(0), "anchor": jax.random.key(1)}, grays, colors, True, 0, False
    )

    @jax.jit
    def fwd(g, key):
        out = model.apply(variables, g, colors, True, 0, False, rngs={"anchor": key})
        return out["pred_colors"]

    # warm up + compile outside the trace
    float(fwd(grays, jax.random.key(2)).mean())
    with jax.profiler.trace(outdir):
        for i in range(iters):
            float(fwd(grays + 0.001 * i, jax.random.key(3 + i)).mean())


def summarize(outdir: str, top: int = 40) -> None:
    """Parse the .xplane.pb with tensorboard_plugin_profile and print op table."""
    planes = glob.glob(os.path.join(outdir, "**", "*.xplane.pb"), recursive=True)
    if not planes:
        print("no xplane.pb found", file=sys.stderr)
        return
    plane = max(planes, key=os.path.getmtime)
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data([plane], "hlo_op_profile", {})
    if isinstance(data, bytes):
        data = data.decode()
    prof = json.loads(data)

    # The op_profile JSON is a tree: byProgram -> children. Walk leaves.
    rows = []

    def walk(node, path):
        ch = node.get("children", [])
        m = node.get("metrics", {})
        name = node.get("name", "?")
        if not ch and m:
            rows.append((m.get("time", 0.0), name, path))
        for c in ch:
            walk(c, path + "/" + name)

    walk(prof.get("byProgram", prof), "")
    rows.sort(reverse=True)
    total = sum(r[0] for r in rows)
    print(f"{'self%':>7}  op")
    acc = 0.0
    for t, name, _ in rows[:top]:
        acc += t
        print(f"{100*t/total:6.2f}%  {name[:130]}")
    print(f"(top {top} = {100*acc/total:.1f}% of total)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--outdir", type=str, default="/tmp/disco_trace")
    ap.add_argument("--summarize_only", action="store_true")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()
    if not args.summarize_only:
        capture(args.batch, args.outdir)
    summarize(args.outdir, args.top)


if __name__ == "__main__":
    main()
