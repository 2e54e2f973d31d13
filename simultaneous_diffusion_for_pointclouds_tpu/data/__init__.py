from .host_projection import project_point_cloud, RangeImage
from .transforms import data_transform, inverse_data_transform, logit_transform
from .registry import get_dataset

__all__ = [
    "project_point_cloud",
    "RangeImage",
    "data_transform",
    "inverse_data_transform",
    "logit_transform",
    "get_dataset",
]
