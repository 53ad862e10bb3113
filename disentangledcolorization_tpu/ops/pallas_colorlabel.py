"""Pallas TPU kernel: fused gamut soft-encoding (distance + top-5 + Gaussian + scatter).

Fuses the whole ``encode_ab2ind`` pipeline (ops/colorlabel.py, reference
basic.py:177-194) into one VMEM pass per row-block: squared distances to the
313 bin centers, 5-round argmax selection, Gaussian weighting, renormalize,
and a compare-based scatter into the 313-way soft label — no intermediate HBM
round trips. Runs in interpret mode off-TPU; tests assert exact agreement with
the jnp implementation.

IN PRODUCTION: ``ops.colorlabel.encode_ab2ind(backend='auto')`` dispatches
here on TPU. Measured on v5e (tools/pallas_bench.py, scan-chain amortized):

    shape (16,16,16,2)  [GT token labels, one train step]:  XLA 404.3 us -> 121.6 us (3.3x)
    shape (4,256,256,2) [full-res encodes]:                 XLA 30.4 ms -> 10.0 ms (3.0x)
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils import cielab as _cielab

NUM_BINS = _cielab.NUM_BINS
_BLOCK = 256  # rows per program


def _encode_kernel(ab_ref, bins_ref, q_ref, *, neighbours: int, sigma: float):
    ab = ab_ref[:] * _cielab.AB_NORM  # (B, 2)
    bins = bins_ref[:]  # (313, 2)
    # exact f32 distances on the VPU: an MXU dot would run the ~1e2-magnitude
    # ab x bins products through bf16 and scramble the 5-NN selection
    bins_a = jnp.transpose(bins[:, 0:1])  # (1, 313): slice+transpose, no gather
    bins_b = jnp.transpose(bins[:, 1:2])
    da = ab[:, 0:1] - bins_a
    db = ab[:, 1:2] - bins_b
    d2 = da * da + db * db  # (B, 313)

    norm = 1.0 / (2.0 * math.pi * sigma)
    inv2s2 = 1.0 / (2.0 * sigma * sigma)
    col = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)

    q = jnp.zeros_like(d2)
    wsum = jnp.zeros((d2.shape[0], 1), jnp.float32)
    work = d2
    for _ in range(neighbours):
        dmin = jnp.min(work, axis=-1, keepdims=True)
        idx = jnp.argmin(work, axis=-1)[:, None]  # (B, 1)
        wgt = norm * jnp.exp(-dmin * inv2s2)  # (B, 1)
        hit = col == idx
        q = q + jnp.where(hit, wgt, 0.0)
        wsum = wsum + wgt
        work = jnp.where(hit, jnp.inf, work)
    q_ref[:] = q / wsum


@functools.partial(jax.jit, static_argnames=("neighbours", "sigma"))
def encode_ab2ind(batch_ab: jnp.ndarray, neighbours: int = 5, sigma: float = 5.0) -> jnp.ndarray:
    """Drop-in Pallas-backed replacement for ops.colorlabel.encode_ab2ind."""
    n, h, w, _ = batch_ab.shape
    m = n * h * w
    pad = (-m) % _BLOCK
    ab = batch_ab.reshape(m, 2).astype(jnp.float32)
    if pad:
        ab = jnp.pad(ab, ((0, pad), (0, 0)))
    bins = jnp.asarray(_cielab.default_cielab().q_to_ab, jnp.float32)
    kernel = functools.partial(_encode_kernel, neighbours=neighbours, sigma=sigma)
    q = pl.pallas_call(
        kernel,
        grid=((m + pad) // _BLOCK,),
        in_specs=[
            pl.BlockSpec((_BLOCK, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NUM_BINS, 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BLOCK, NUM_BINS), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m + pad, NUM_BINS), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(ab, bins)
    return q[:m].reshape(n, h, w, NUM_BINS)
