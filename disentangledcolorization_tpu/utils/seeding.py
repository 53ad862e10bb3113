"""Seeding: one CLI seed -> all randomness in the framework.

Capability parity with reference set_random_seed (utils_train.py:244-260),
re-designed for JAX: device-side randomness (k-means init, random hints,
dropout) is *functional* via jax.random keys derived from the seed, so runs
are reproducible by construction — there is no global device RNG to set, and
no cudnn-determinism toggle is needed (XLA is deterministic by default).
Host-side numpy/python RNGs (data shuffling, augmentation) are seeded here.
"""

from __future__ import annotations

import random

import jax
import numpy as np


def set_random_seed(seed: int) -> jax.Array:
    """Seed host RNGs and return the root jax key for device randomness."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.key(seed)


def key_for(root: jax.Array, *tags: int | str) -> jax.Array:
    """Derive a named subkey: fold string tags (hashed) and ints into the root."""
    k = root
    for t in tags:
        k = jax.random.fold_in(k, hash(t) & 0x7FFFFFFF if isinstance(t, str) else t)
    return k


def param_count(tree) -> int:
    """Total parameter count (reference getParamsAmount, basic.py:22-30)."""
    return sum(int(np.prod(np.shape(x))) for x in jax.tree_util.tree_leaves(tree))


def mean_abs_grad(grads) -> float:
    """Mean of per-leaf mean |grad| (reference checkAverageGradient, basic.py:33-39)."""
    leaves = jax.tree_util.tree_leaves(grads)
    if not leaves:
        return 0.0
    return float(sum(jnp_abs_mean(g) for g in leaves) / len(leaves))


def jnp_abs_mean(x) -> float:
    import jax.numpy as jnp

    return float(jnp.mean(jnp.abs(x)))
