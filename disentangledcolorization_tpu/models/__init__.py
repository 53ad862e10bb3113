"""Networks & model composition (L2/L3): SpixelNet, ColorProbNet, HourGlass2,
transformer paths, anchor machinery, and the flagship AnchorColorProb."""

from . import anchor  # noqa: F401
from .colorprobnet import ColorProbNet  # noqa: F401
from .disco import AnchorColorProb, xavier_reinit_params  # noqa: F401
from .hourglass import HourGlass2  # noqa: F401
from .position import PositionEmbeddingLearned, sine_position_encoding  # noqa: F401
from .spixelnet import SpixelNet, SpixelSeg  # noqa: F401
from .transformer import (  # noqa: F401
    DecoderLayer,
    EncoderLayer,
    MultiheadAttention,
    TransformerDecoder,
    TransformerEncoder,
)
