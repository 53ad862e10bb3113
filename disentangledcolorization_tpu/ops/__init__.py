"""Differentiable ops library (L1): superpixel fusions, color vocabulary, k-means, hints.

Submodules are exposed as modules (``ops.kmeans``, ``ops.superpixel``, ...);
commonly-used functions are also re-exported at package level, except where a
function name would shadow its submodule (e.g. ``kmeans.kmeans``).
"""

from . import colorlabel, hints, kmeans, superpixel  # noqa: F401
from .colorlabel import (  # noqa: F401
    decode_ind2ab,
    encode_ab2ind,
    get_classweights,
    nearest_bin_index,
    rebalance_gradient,
)
from .hints import dilate_seeds, get_random_mask, mark_color_hints  # noqa: F401
from .kmeans import batch_kmeans_masks  # noqa: F401
from .superpixel import (  # noqa: F401
    get_spixel_size,
    hard_assignment,
    init_spixel_grid,
    poolfeat,
    split_spixels,
    upfeat,
)
