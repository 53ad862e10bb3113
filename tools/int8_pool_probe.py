"""Probe: do int8 pool/unpool OPERANDS beat bf16 at the batch-128 int8 config?

The last recorded unexplored perf lever (docs/STATUS.md "Deferred"): at the
int8 batch-128 knee the pool/unpool bucket costs ~48 ms of a 192 ms forward
(trace table, docs/STATUS.md), dominated by the 6-D blocked relayout copies
that the einsum's dot_general imposes on the full-resolution operands
(affinity prob N*256*256*9 and the 65-ch feature map). bf16 operands already
halved those bytes vs f32 (round 2: 331 -> 362 img/s); int8 operands would
halve them again AND engage the MXU's 394-TOPS int8 mode for the pool
contraction.

Scheme probed (static scales, same philosophy as the winning conv PTQ —
ops/quant.py):
  prob in [0,1] (softmax output):  q_p = round(prob * 127),  scale 1/127
  feat (bf16 activations):         q_f = round(feat / s * 127), s = amax
  pool einsum int8 x int8 -> int32, dequant by s/(127*127)/(sp*sp).
The quantize steps are elementwise (fusable into the producers); the probe
times the WHOLE op including them, since that requantize cost is exactly what
killed dynamic conv scales end-to-end (370 vs 381.8 img/s, STATUS).

Prove-or-retire protocol: op-level A/B at the production b128 shapes first;
only wire into the model if the isolated win is decisive (>20% of the op).

MEASURED (v5e, 2026-08-19, batch 128, 256x256, sp=16; chained-scan,
d2h-synced, per-op deltas vs a 1-iter chain):
  pool_and_sizes (65ch)  bf16-operand  23.846 ms   int8-operand  31.196 ms
  quality: max |pooled_int8 - pooled_f32| = 8.6e-3 (feat amax 4.0) -- fine,
  but 1.31x SLOWER. upfeat (64ch): int8 emitted the same relayout copies and
  regressed similarly (28.0 -> 33.5 ms in the first sweep; not re-run).
Verdict: RETIRED. XLA lowers the int8 einsum through the same 6-D relayout
copies (now with extra convert ops), and the pool contraction (256-deep p,q
per 9x65 tile) is too small to amortize MXU int8 throughput; the op is
layout-bound, not FLOP- or byte-bound at the dot_general boundary. The ~6%
"bounded upside" recorded in round 3 does not exist on this compiler/hw
combination. bf16 operands stay the production path.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from disentangledcolorization_tpu.ops import superpixel as sp

ITERS = 12
SP = 16


def _timed(fn, *args, repeat=3):
    best = float("inf")
    for _ in range(repeat):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def pool_int8(feat, prob, sp_h, sp_w, feat_scale):
    """int8-operand pool_and_sizes: static feat scale, prob scale 1/127."""
    n, h, w, c = feat.shape
    hc, wc = h // sp_h, w // sp_w
    ones = jnp.ones((n, h, w, 1), dtype=feat.dtype)
    f1 = jnp.concatenate([feat, ones], axis=-1)
    fq = jnp.clip(jnp.round(f1 * (127.0 / feat_scale)), -127, 127).astype(jnp.int8)
    pq = jnp.round(prob * 127.0).astype(jnp.int8)
    fb = sp._block(fq, sp_h, sp_w)
    pb = sp._block(pq, sp_h, sp_w)
    t = jnp.einsum("nhpwqd,nhpwqc->nhwdc", pb, fb, preferred_element_type=jnp.int32)
    t = t.astype(jnp.float32) * (feat_scale / (127.0 * 127.0) / (sp_h * sp_w))
    tp = jnp.pad(t, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
    acc = jnp.zeros((n, hc, wc, c + 1), dtype=t.dtype)
    for d, (dy, dx) in enumerate(sp._OFFSETS):
        acc = acc + jax.lax.dynamic_slice(
            tp[..., d, :], (0, 1 - dy, 1 - dx, 0), (n, hc, wc, c + 1)
        )
    feat_sum, prob_sum = acc[..., :c], acc[..., c:]
    pooled = (feat_sum / (prob_sum + 1e-8)).astype(feat.dtype)
    sizes = sp.get_spixel_size(prob, sp_h, sp_w)
    return pooled, prob_sum.astype(feat.dtype), sizes


def upfeat_int8(tokens, prob, up_h, up_w, tok_scale):
    n, hc, wc, c = tokens.shape
    tq = jnp.clip(jnp.round(tokens * (127.0 / tok_scale)), -127, 127).astype(jnp.int8)
    pq = jnp.round(prob * 127.0).astype(jnp.int8)
    tp = jnp.pad(tq, ((0, 0), (1, 1), (1, 1), (0, 0)))
    s = jnp.stack(
        [
            jax.lax.dynamic_slice(tp, (0, 1 + dy, 1 + dx, 0), (n, hc, wc, c))
            for (dy, dx) in sp._OFFSETS
        ],
        axis=3,
    )
    pb = sp._block(pq, up_h, up_w)
    out = jnp.einsum("nhpwqd,nhwdc->nhpwqc", pb, s, preferred_element_type=jnp.int32)
    out = out.astype(jnp.float32) * (tok_scale / (127.0 * 127.0))
    return out.reshape(n, hc * up_h, wc * up_w, c).astype(tokens.dtype)


def bench(label, fn, args_fn, n_out=1):
    """Chained-scan A/B: per-iteration input perturbation, d2h sync."""

    def chain(iters):
        @jax.jit
        def f(c0, *arrs):
            def body(carry, i):
                out = fn(*args_fn(carry, *arrs))
                first = out[0] if isinstance(out, tuple) else out
                return carry + first.mean(dtype=jnp.float32) * 1e-9, None

            acc, _ = jax.lax.scan(body, c0, jnp.arange(iters))
            return acc

        return f

    return chain


def run(label, fn, arrs, perturb):
    c = bench(label, fn, perturb)
    f1, fN = c(1), c(ITERS + 1)
    z = jnp.float32(0)
    f1(z, *arrs)
    fN(z, *arrs)
    d = max((_timed(fN, z, *arrs) - _timed(f1, z, *arrs)) / ITERS, 1e-9)
    print(f"{label:40s} {d * 1e3:8.3f} ms", flush=True)
    return d


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    N, H, W, C = 128, 256, 256, 64
    feat = jnp.asarray(rng.uniform(-2, 2, (N, H, W, C)).astype(np.float32), dtype=jnp.bfloat16)
    logits = rng.normal(size=(N, H, W, 9)).astype(np.float32)
    prob = jnp.asarray(
        np.exp(logits) / np.exp(logits).sum(-1, keepdims=True), dtype=jnp.bfloat16
    )
    tokens = jnp.asarray(rng.uniform(-2, 2, (N, H // SP, W // SP, C)).astype(np.float32), dtype=jnp.bfloat16)
    fscale = float(jnp.max(jnp.abs(feat)).astype(jnp.float32))

    # quality check first (one call, f32 reference)
    ref, _, _ = sp.pool_and_sizes(feat.astype(jnp.float32), prob.astype(jnp.float32), SP, SP)
    got, _, _ = jax.jit(pool_int8, static_argnums=(2, 3))(feat, prob, SP, SP, fscale)
    err = float(jnp.max(jnp.abs(ref - got.astype(jnp.float32))))
    print(f"pool int8 max|err| vs f32: {err:.4g} (feat amax {fscale:.3g})", flush=True)

    run(
        "pool_and_sizes bf16-operand (prod)",
        lambda f, p: sp.pool_and_sizes(f, p, SP, SP, precise=False),
        (feat, prob),
        lambda carry, f, p: (f + carry.astype(f.dtype), p),
    )
    run(
        "pool_and_sizes int8-operand",
        lambda f, p: pool_int8(f, p, SP, SP, fscale),
        (feat, prob),
        lambda carry, f, p: (f + carry.astype(f.dtype), p),
    )
    run(
        "upfeat bf16-operand (prod)",
        lambda t, p: sp.upfeat(t, p, SP, SP, precise=False),
        (tokens, prob),
        lambda carry, t, p: (t + carry.astype(t.dtype), p),
    )
    run(
        "upfeat int8-operand",
        lambda t, p: upfeat_int8(t, p, SP, SP, 2.0),
        (tokens, prob),
        lambda carry, t, p: (t + carry.astype(t.dtype), p),
    )


if __name__ == "__main__":
    main()
