from .ncsnv2 import (
    NCSNv2,
    NCSNv2Deeper,
    NCSNv2Deepest,
    NCSNLiDAR,
    NCSNLiDARSmall,
    get_model,
)
from .ncsn import NCSN, ncsn_from_config
from .ema import ema_init, ema_update
from .optimizers import get_optimizer

__all__ = [
    "NCSN",
    "ncsn_from_config",
    "NCSNv2",
    "NCSNv2Deeper",
    "NCSNv2Deepest",
    "NCSNLiDAR",
    "NCSNLiDARSmall",
    "get_model",
    "ema_init",
    "ema_update",
    "get_optimizer",
]
