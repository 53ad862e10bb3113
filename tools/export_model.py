"""AOT model export: serialize the flagship inference forward to StableHLO.

Deployment artifact for serving without Python model code: the jitted
AnchorColorProb test-mode forward (same graph as __graft_entry__.entry) is
lowered and serialized with ``jax.export``. The artifact is loadable with
``jax.export.deserialize`` in any process (no flax, no model source) and —
when exported with ``--platform tpu`` — can be produced on a CPU-only host
and shipped to TPU servers.

The exported signature takes the raw uint32 PRNG key data instead of a typed
key array so the calling convention is plain dense arrays only.

Run:  python tools/export_model.py --out disco_b8.shlo [--checkpt w.pkl]
          [--batch 8] [--size 256] [--n_clusters 8] [--platform cpu|tpu]
          [--check]
Load: exp = jax.export.deserialize(open('disco_b8.shlo','rb').read())
      pred_ab = exp.call(variables, grays, colors, key_data)
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jexport


def build(args):
    from disentangledcolorization_tpu.cli.infer import load_variables
    from disentangledcolorization_tpu.models import AnchorColorProb

    model = AnchorColorProb(
        sp_size=16,
        n_clusters=args.n_clusters,
        enhanced=True,
        sn_folded=bool(args.checkpt),
        compute_dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32,
    )
    grays = jnp.zeros((args.batch, args.size, args.size, 1), jnp.float32)
    colors = jnp.zeros((args.batch, args.size, args.size, 2), jnp.float32)
    example = (grays[:1], colors[:1], True, 0, False)
    variables, loaded = load_variables(args.checkpt, model, example, seed=0)
    if args.checkpt and not loaded:
        raise SystemExit(f"could not load checkpoint {args.checkpt!r}")

    def forward(variables, grays, colors, key_data):
        key = jax.random.wrap_key_data(key_data)
        out = model.apply(variables, grays, colors, True, 0, False, rngs={"anchor": key})
        return out["pred_colors"]

    key_data = jax.random.key_data(jax.random.key(130))
    return forward, (variables, grays, colors, key_data)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--checkpt", default="", help=".pkl / reference .pth.tar (blank: random init)")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--n_clusters", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    ap.add_argument("--platform", default="", help="lowering platform (default: current backend)")
    ap.add_argument("--check", action="store_true", help="deserialize + run + compare")
    args = ap.parse_args()

    forward, ex_args = build(args)
    platforms = [args.platform] if args.platform else None
    exp = jexport.export(jax.jit(forward), platforms=platforms)(*ex_args)
    blob = exp.serialize()
    with open(args.out, "wb") as f:
        f.write(blob)
    print(
        f"wrote {args.out}: {len(blob)/1e6:.1f} MB, platforms={exp.platforms}, "
        f"out={[str(a) for a in exp.out_avals]}"
    )
    if args.check:
        re_exp = jexport.deserialize(blob)
        got = np.asarray(re_exp.call(*ex_args))
        want = np.asarray(jax.jit(forward)(*ex_args))
        err = float(np.max(np.abs(got - want)))
        print(f"check: max |deserialized - direct| = {err:.2e}")
        assert err < 1e-5, "exported artifact diverges from direct execution"


if __name__ == "__main__":
    main()
