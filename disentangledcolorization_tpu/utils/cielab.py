"""CIELAB ab-gamut quantization (313 bins) as pure numpy/JAX lookup tables.

Capability parity with the reference CIELAB machinery
(/root/reference/utils/cielab.py:5-71 and /root/reference/models/basic.py:149-218),
re-designed for XLA: the LUTs are built once in numpy at import time and exposed
as device-resident constants; all encode/decode logic lives in
``disentangledcolorization_tpu.ops.colorlabel`` as jittable functions.

Data assets (``gamut_pts.npy`` 313x2 ab bin centers, ``gamut_probs.npy`` 313-way
empirical color prior summing to 1.0) are loaded verbatim.
"""

from __future__ import annotations

import functools
import os

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))

# 10-wide ab bins spanning [-115, 115): 23 bins per axis, 23*23 grid, 313 in gamut.
AB_BINSIZE = 10
AB_LO = -110 - AB_BINSIZE // 2
AB_HI = 110 + AB_BINSIZE // 2
L_MEAN = 50.0
L_NORM = 50.0
AB_NORM = 110.0
NUM_BINS = 313


class ABGamut:
    """The 313 in-gamut ab bin centers and their empirical prior.

    Mirrors reference ABGamut (utils/cielab.py:5-14); shapes are asserted the
    same way so corrupt assets fail loudly.
    """

    EXPECTED_SIZE = NUM_BINS

    def __init__(self, points_path: str | None = None, prior_path: str | None = None):
        points_path = points_path or os.path.join(_HERE, "gamut_pts.npy")
        prior_path = prior_path or os.path.join(_HERE, "gamut_probs.npy")
        self.points = np.load(points_path).astype(np.float32)
        self.prior = np.load(prior_path).astype(np.float32)
        assert self.points.shape == (self.EXPECTED_SIZE, 2)
        assert self.prior.shape == (self.EXPECTED_SIZE,)


class CIELAB:
    """Quantized ab plane: grid, gamut mask, and ab<->bin-index LUTs.

    Mirrors reference CIELAB (utils/cielab.py:17-71). ``ab_to_q`` maps a
    (23, 23) discretized (a, b) cell to its bin index (-1 outside the gamut);
    ``q_to_ab`` maps bin index -> bin-center (a, b) in real ab units.
    """

    def __init__(self, gamut: ABGamut | None = None):
        self.gamut = gamut if gamut is not None else ABGamut()
        a = np.arange(AB_LO, AB_HI, AB_BINSIZE, dtype=np.float32)
        b = np.arange(AB_LO, AB_HI, AB_BINSIZE, dtype=np.float32)
        b_, a_ = np.meshgrid(a, b)
        self.ab = np.dstack((a_, b_))  # (23, 23, 2): ab[i, j] = (a[i], b[j])

        mask = np.zeros(self.ab.shape[:-1], dtype=bool)
        ia = np.digitize(self.gamut.points[:, 0], a) - 1
        ib = np.digitize(self.gamut.points[:, 1], b) - 1
        mask[ia, ib] = True
        self.ab_gamut_mask = mask

        ab_to_q = np.full(mask.shape, -1, dtype=np.int64)
        ab_to_q[mask] = np.arange(np.count_nonzero(mask))
        self.ab_to_q = ab_to_q
        # bin centers: grid corner + half a bin
        self.q_to_ab = (self.ab[mask] + AB_BINSIZE / 2).astype(np.float32)

    def bin_ab(self, ab: np.ndarray) -> np.ndarray:
        """Hard-binning of real-valued ab (..., 2) to bin indices (-1 = out of gamut)."""
        ab_discrete = ((ab + 110) / AB_BINSIZE).astype(int)
        a = ab_discrete[..., 0]
        b = ab_discrete[..., 1]
        return self.ab_to_q[a, b]


@functools.lru_cache(maxsize=1)
def default_cielab() -> CIELAB:
    """Process-wide singleton of the default LUTs."""
    return CIELAB()


@functools.lru_cache(maxsize=1)
def class_rebalance_weights(lambda_: float = 0.5) -> np.ndarray:
    """Per-bin rare-color rebalancing weights.

    weights = 1 / ((1-lambda) * prior + lambda * uniform), normalized so that
    E_prior[w] = 1 (reference models/basic.py:153-157).
    """
    prior = default_cielab().gamut.prior.astype(np.float64)
    uniform = np.zeros_like(prior)
    nz = prior > 0
    uniform[nz] = 1.0 / nz.sum()
    w = 1.0 / ((1.0 - lambda_) * prior + lambda_ * uniform)
    w = w / np.sum(prior * w)
    return w.astype(np.float32)
