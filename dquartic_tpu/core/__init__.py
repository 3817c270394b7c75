from .schedules import (
    linear_beta_schedule,
    cosine_beta_schedule,
    get_alphas,
    get_alpha_bars,
    make_schedule,
    DiffusionSchedule,
)
from .diffusion import DDIMProcess

__all__ = [
    "linear_beta_schedule",
    "cosine_beta_schedule",
    "get_alphas",
    "get_alpha_bars",
    "make_schedule",
    "DiffusionSchedule",
    "DDIMProcess",
]
