"""Space-to-depth SpixelNet forward: the full-resolution stages at 128² x 4C.

Weight-exact transform of models/spixelnet.py::SpixelSeg for TPU inference.
The trace (tools/trace_forward.py, batch 16, v5e) shows the 256²-resolution
segnet stages are lane-starved: conv0b (16 ch = 16/128 lanes) costs 2.0 ms at
~1% MFU and the 9-channel softmax head ~6 ms. Packing 2x2 pixel blocks into
channels (space-to-depth) runs the same math at quarter resolution with 4x
the channels: conv0a/0b become 64-channel convs, the head's softmax operates
over 36-channel lanes, and only one depth-to-space transpose at the end
restores the (N, H, W, 9) affinity for the pool/unpool consumers.

The transform is exact (same parameters, reassociated arithmetic):
  * a 3x3 stride-1 conv on pixels == a 2x2 conv on 1-padded cells with the
    kernel scattered per (input-phase p,q / output-phase a,b): taps satisfy
    p = (a+dy) mod 2, cell offset s' = floor((a+dy)/2) + 1 - a; output phase
    (a,b) reads the window at cell (u+a, v+b) of the padded VALID conv.
  * a 3x3 stride-2 conv == the single output phase a=b=0 of the same.
  * the k=4 s=2 p=1 transposed conv (stored pre-flipped, layers.py::Deconv)
    == a 2x2 conv on 1-padded cells with taps K[2s'+a, 2t'+b] producing the
    s2d-packed output directly — no lhs dilation.

Used by AnchorColorProb(fast_seg=True); parity with the standard path is
asserted in tests/test_models.py. Reference capability: SpixelNet
(/root/reference/models/network.py:260-313) — this file changes layout, not
semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from flax import linen as nn


def s2d(x: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, C) -> (N, H/2, W/2, 4C), channel packing (p, q, c)."""
    n, h, w, c = x.shape
    y = x.reshape(n, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(n, h // 2, w // 2, 4 * c)


def d2s(y: jnp.ndarray) -> jnp.ndarray:
    """(N, H/2, W/2, 4C) -> (N, H, W, C), inverse of s2d."""
    n, h2, w2, c4 = y.shape
    c = c4 // 4
    x = y.reshape(n, h2, w2, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h2 * 2, w2 * 2, c)


def _expand_3x3(w: jnp.ndarray) -> jnp.ndarray:
    """(3,3,Ci,Co) stride-1 kernel -> (2,2,4Ci,4Co) s2d kernel."""
    ci, co = w.shape[2], w.shape[3]
    w2 = jnp.zeros((2, 2, 4 * ci, 4 * co), w.dtype)
    for a in range(2):
        for b in range(2):
            for dy in range(-1, 2):
                for dx in range(-1, 2):
                    p, sp = (a + dy) % 2, (a + dy) // 2 + 1 - a
                    q, tp = (b + dx) % 2, (b + dx) // 2 + 1 - b
                    w2 = w2.at[
                        sp,
                        tp,
                        (p * 2 + q) * ci : (p * 2 + q + 1) * ci,
                        (a * 2 + b) * co : (a * 2 + b + 1) * co,
                    ].set(w[dy + 1, dx + 1])
    return w2


def _expand_3x3_s2(w: jnp.ndarray) -> jnp.ndarray:
    """(3,3,Ci,Co) stride-2 kernel -> (2,2,4Ci,Co) s2d kernel (phase 0,0)."""
    ci = w.shape[2]
    w2 = jnp.zeros((2, 2, 4 * ci, w.shape[3]), w.dtype)
    for dy in range(-1, 2):
        for dx in range(-1, 2):
            p, sp = dy % 2, dy // 2 + 1
            q, tp = dx % 2, dx // 2 + 1
            w2 = w2.at[sp, tp, (p * 2 + q) * ci : (p * 2 + q + 1) * ci, :].set(w[dy + 1, dx + 1])
    return w2


def _expand_deconv(k: jnp.ndarray) -> jnp.ndarray:
    """(4,4,Ci,Co) pre-flipped deconv kernel -> (2,2,Ci,4Co) s2d kernel."""
    ci, co = k.shape[2], k.shape[3]
    w2 = jnp.zeros((2, 2, ci, 4 * co), k.dtype)
    for a in range(2):
        for b in range(2):
            for sp in range(2):
                for tp in range(2):
                    w2 = w2.at[sp, tp, :, (a * 2 + b) * co : (a * 2 + b + 1) * co].set(
                        k[2 * sp + a, 2 * tp + b]
                    )
    return w2


def _conv_cells(x: jnp.ndarray, w2: jnp.ndarray, phases: bool) -> jnp.ndarray:
    """2x2 VALID conv over 1-padded cells; gather per-phase windows.

    phases=True: w2 (2,2,Cin,4Co); output phase (a,b) = window at (u+a, v+b)
      -> (N, H2, W2, 4Co). phases=False (stride-2): (N, H2, W2, Co).
    """
    n, h2, w2_, _ = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    o = jax.lax.conv_general_dilated(
        xp, w2, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )  # (N, H2+1, W2+1, ...)
    if not phases:
        return o[:, :h2, :w2_, :]
    co = o.shape[-1] // 4
    parts = [
        o[:, a : a + h2, b : b + w2_, (a * 2 + b) * co : (a * 2 + b + 1) * co]
        for a in range(2)
        for b in range(2)
    ]
    return jnp.concatenate(parts, axis=-1)


def _bn_affine(p_bn, s_bn, tile: int = 4):
    scale, bias = p_bn["scale"], p_bn["bias"]
    mean, var = s_bn["mean"], s_bn["var"]
    a = scale * jax.lax.rsqrt(var + 1e-5)
    b = bias - mean * a
    if tile > 1:
        a, b = jnp.tile(a, tile), jnp.tile(b, tile)
    return a, b


def _unit_s2d(x, p, s, dt, stride1: bool):
    """_ConvUnit (conv+BN+leaky 0.1) with an s2d-expanded kernel."""
    w2 = (_expand_3x3 if stride1 else _expand_3x3_s2)(p["conv"]["kernel"]).astype(dt)
    y = _conv_cells(x, w2, phases=stride1)
    a, b = _bn_affine(p["norm"]["bn"], s["norm"]["bn"], tile=4 if stride1 else 1)
    return nn.leaky_relu(y * a.astype(dt) + b.astype(dt), 0.1)


def _unit(x, p, s, dt, stride: int):
    """Standard-resolution _ConvUnit in pure jnp (eval-mode BN)."""
    y = jax.lax.conv_general_dilated(
        x,
        p["conv"]["kernel"].astype(dt),
        (stride, stride),
        ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    a, b = _bn_affine(p["norm"]["bn"], s["norm"]["bn"], tile=1)
    return nn.leaky_relu(y * a.astype(dt) + b.astype(dt), 0.1)


def _deconv(x, p, dt):
    """layers.py::Deconv (lhs-dilated, pre-flipped kernel) in pure jnp."""
    y = jax.lax.conv_general_dilated(
        x,
        p["deconv"]["kernel"].astype(dt),
        (1, 1),
        ((2, 2), (2, 2)),
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return nn.leaky_relu(y + p["deconv"]["bias"].astype(dt), 0.1)


def apply_s2d(variables, grays: jnp.ndarray) -> jnp.ndarray:
    """SpixelSeg eval forward with s2d-packed full-resolution stages.

    variables: the bound SpixelSeg variable dict ({'params': {'net': ...},
    'batch_stats': {...}}). grays (N, H, W, 1) with H, W even. Returns the
    softmax affinity (N, H, W, 9) == SpixelSeg.apply to f32 round-off.
    """
    p, st = variables["params"]["net"], variables["batch_stats"]["net"]
    dt = grays.dtype
    x = s2d(grays)  # (N, H/2, W/2, 4)

    out1 = _unit_s2d(_unit_s2d(x, p["conv0a"], st["conv0a"], dt, True), p["conv0b"], st["conv0b"], dt, True)
    d1 = _unit_s2d(out1, p["conv1a"], st["conv1a"], dt, False)  # (N, H/2, W/2, 32)
    out2 = _unit(d1, p["conv1b"], st["conv1b"], dt, 1)
    out3 = _unit(_unit(out2, p["conv2a"], st["conv2a"], dt, 2), p["conv2b"], st["conv2b"], dt, 1)
    out4 = _unit(_unit(out3, p["conv3a"], st["conv3a"], dt, 2), p["conv3b"], st["conv3b"], dt, 1)
    out5 = _unit(_unit(out4, p["conv4a"], st["conv4a"], dt, 2), p["conv4b"], st["conv4b"], dt, 1)

    up3 = _deconv(out5, p["deconv3"], dt)
    c3 = _unit(jnp.concatenate([out4, up3], -1), p["conv3_1"], st["conv3_1"], dt, 1)
    up2 = _deconv(c3, p["deconv2"], dt)
    c2 = _unit(jnp.concatenate([out3, up2], -1), p["conv2_1"], st["conv2_1"], dt, 1)
    up1 = _deconv(c2, p["deconv1"], dt)
    c1 = _unit(jnp.concatenate([out2, up1], -1), p["conv1_1"], st["conv1_1"], dt, 1)

    # deconv0 produces its output s2d-packed directly (no lhs dilation)
    k0 = _expand_deconv(p["deconv0"]["deconv"]["kernel"]).astype(dt)
    up0 = _conv_cells(c1, k0, phases=True) + jnp.tile(p["deconv0"]["deconv"]["bias"], 4).astype(dt)
    up0 = nn.leaky_relu(up0, 0.1)

    # conv0_1 on concat(out1, up0): split the kernel instead of repacking
    # channels — conv(concat(x1, x2), W) == conv(x1, W[:, :, :16]) + conv(x2,
    # W[:, :, 16:]) — so each operand keeps its own clean (p, q, c) packing.
    w01 = p["conv0_1"]["conv"]["kernel"]
    y = _conv_cells(out1, _expand_3x3(w01[:, :, :16, :]).astype(dt), True) + _conv_cells(
        up0, _expand_3x3(w01[:, :, 16:, :]).astype(dt), True
    )
    a, b = _bn_affine(p["conv0_1"]["norm"]["bn"], st["conv0_1"]["norm"]["bn"], tile=4)
    c0 = nn.leaky_relu(y * a.astype(dt) + b.astype(dt), 0.1)

    wm = _expand_3x3(p["pred_mask0"]["kernel"]).astype(dt)
    mask = _conv_cells(c0, wm, True) + jnp.tile(p["pred_mask0"]["bias"], 4).astype(dt)
    # per-pixel softmax over each phase's 9 channels (36-lane elementwise vs
    # 9-lane at full resolution), then one depth-to-space restores NHWC
    n, h2, w2_, _ = mask.shape
    sm = jax.nn.softmax(mask.reshape(n, h2, w2_, 4, 9), axis=-1)
    return d2s(sm.reshape(n, h2, w2_, 36))
