"""Diffusion noise schedules.

Pure-numpy schedule construction (float64 internally, cast to float32),
matching the formulas of the reference implementation
(/root/reference/dquartic/model/model.py:14-54, 57-84, 204-213).

Schedules are built once on the host as numpy arrays and closed over by
jitted functions, so they become XLA constants — there is no per-step
gather cost beyond a single `take` per batch.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np


def linear_beta_schedule(
    num_timesteps: int, beta_start: float = 1e-4, beta_end: float = 0.02
) -> np.ndarray:
    """Linearly interpolated betas (reference model.py:14-29)."""
    return np.linspace(beta_start, beta_end, num_timesteps, dtype=np.float64)


def cosine_beta_schedule(num_timesteps: int, s: float = 0.008) -> np.ndarray:
    """Nichol & Dhariwal cosine schedule (reference model.py:32-54).

    Computed in float64 and clipped to [0, 0.999], exactly as the reference.
    """
    steps = num_timesteps + 1
    x = np.linspace(0, num_timesteps, steps, dtype=np.float64)
    alphas_cumprod = np.cos(((x / num_timesteps) + s) / (1 + s) * math.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0.0, 0.999)


def get_alphas(betas: np.ndarray) -> np.ndarray:
    """alpha_t = 1 - beta_t (reference model.py:57-69)."""
    return 1.0 - betas


def get_alpha_bars(alphas: np.ndarray) -> np.ndarray:
    """Cumulative product of alphas (reference model.py:72-84)."""
    return np.cumprod(alphas, axis=0)


@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """Precomputed schedule tables (all float32 numpy arrays, shape (T,)).

    ``loss_weight`` follows the reference SNR weighting
    (model.py:204-213): ones for eps-prediction, snr for x0-prediction.
    """

    num_timesteps: int
    betas: np.ndarray
    alphas: np.ndarray
    alpha_bars: np.ndarray
    loss_weight: np.ndarray
    schedule_type: str
    pred_type: str

    def __post_init__(self):
        for name in ("betas", "alphas", "alpha_bars", "loss_weight"):
            arr = getattr(self, name)
            if arr.shape != (self.num_timesteps,):
                raise ValueError(f"{name} has shape {arr.shape}, expected ({self.num_timesteps},)")


def make_schedule(
    num_timesteps: int = 1000,
    schedule_type: str = "cosine",
    pred_type: str = "eps",
) -> DiffusionSchedule:
    """Build a :class:`DiffusionSchedule`.

    Mirrors DDIMDiffusionModel.__init__ (reference model.py:196-213): the
    f64 beta table is cast to f32 *before* alphas/alpha_bars are derived.
    """
    if schedule_type == "linear":
        betas = linear_beta_schedule(num_timesteps)
    elif schedule_type == "cosine":
        betas = cosine_beta_schedule(num_timesteps)
    else:
        raise ValueError(f"Unknown schedule_type: {schedule_type!r}")

    betas = betas.astype(np.float32)
    alphas = get_alphas(betas).astype(np.float32)
    alpha_bars = get_alpha_bars(alphas).astype(np.float32)

    snr = alpha_bars / (1.0 - alpha_bars)
    if pred_type == "eps":
        loss_weight = np.ones_like(snr)
    elif pred_type == "x0":
        loss_weight = snr
    else:
        raise ValueError(f"Unknown pred_type: {pred_type!r}")

    return DiffusionSchedule(
        num_timesteps=num_timesteps,
        betas=betas,
        alphas=alphas,
        alpha_bars=alpha_bars,
        loss_weight=loss_weight.astype(np.float32),
        schedule_type=schedule_type,
        pred_type=pred_type,
    )
