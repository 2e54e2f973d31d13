from .geometry import (
    RangeGrid,
    kitti_host_grid,
    kitti_sampler_grid,
    log_compress,
    log_decompress,
    signed_log_decompress,
    MAX_RANGE,
)
from .scatter import zbuffer_min2, zbuffer_stats, ZBufferMin2, ZBufferStats

__all__ = [
    "RangeGrid",
    "kitti_host_grid",
    "kitti_sampler_grid",
    "log_compress",
    "log_decompress",
    "signed_log_decompress",
    "MAX_RANGE",
    "zbuffer_min2",
    "zbuffer_stats",
    "ZBufferMin2",
    "ZBufferStats",
]
