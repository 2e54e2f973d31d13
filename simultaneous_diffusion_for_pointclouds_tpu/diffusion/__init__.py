from .sigmas import get_sigmas
from .dsm import (
    anneal_dsm_score_estimation,
    anneal_dsm_score_estimation_with_mask,
)

__all__ = [
    "get_sigmas",
    "anneal_dsm_score_estimation",
    "anneal_dsm_score_estimation_with_mask",
]
