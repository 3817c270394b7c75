"""Prediction visualization + periodic logging hook.

Capability parity with the reference's wandb prediction tables
(/root/reference/dquartic/model/model_interface.py:669-976): every N
epochs, deconvolve one random window at several step counts and log the
six panels (target MS2, query MS1, noise, mixture input, predicted
noise, prediction). The reference requires pyopenms_viz + wandb; here
matplotlib renders peakmaps/chromatograms to PNG files and any logger
from utils.logging records the table.
"""

from __future__ import annotations

import os
from typing import List, Sequence

import numpy as np


def _peakmap(arr: np.ndarray, title: str, path: str) -> str:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 5))
    im = ax.imshow(
        np.asarray(arr).T,
        aspect="auto",
        origin="lower",
        interpolation="nearest",
        cmap="viridis",
    )
    ax.set_xlabel("RT Index")
    ax.set_ylabel("m/z Index")
    ax.set_title(title)
    fig.colorbar(im, ax=ax, label="intensity")
    fig.savefig(path, dpi=90, bbox_inches="tight")
    plt.close(fig)
    return path


def _chromatogram(arr: np.ndarray, title: str, path: str) -> str:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 3))
    ax.plot(np.asarray(arr))
    ax.set_xlabel("RT Index")
    ax.set_ylabel("Intensity")
    ax.set_title(title)
    fig.savefig(path, dpi=90, bbox_inches="tight")
    plt.close(fig)
    return path


def plot_single_prediction(
    x_0: np.ndarray,
    x_noise: np.ndarray,
    ms2_cond: np.ndarray,
    ms1_cond: np.ndarray,
    pred: np.ndarray,
    pred_noise: np.ndarray,
    out_dir: str = ".",
    prefix: str = "",
) -> List[str]:
    """Render the six reference panels to PNGs; returns file paths
    (model_interface.py:796-976)."""
    os.makedirs(out_dir, exist_ok=True)
    p = lambda name: os.path.join(out_dir, f"{prefix}{name}.png")  # noqa: E731
    paths = [
        _peakmap(x_0, "Target MS2", p("ms2_target")),
        (
            _chromatogram(ms1_cond, "Query MS1", p("ms1"))
            if np.asarray(ms1_cond).ndim == 1
            else _peakmap(ms1_cond, "Query MS1", p("ms1"))
        ),
        _peakmap(x_noise, "Noise MS2", p("ms2_noise")),
        _peakmap(ms2_cond, "Noised MS2 Input", p("ms2_input")),
        _peakmap(pred_noise, "Predicted Noise MS2", p("pred_noise")),
        _peakmap(pred, "Predicted MS2", p("pred")),
    ]
    return paths


class PredictionLoggingHook:
    """Trainer ``prediction_hook``: sample one window at several step
    counts and log panel paths + reconstruction metrics
    (model_interface.py:669-794)."""

    def __init__(
        self,
        sampler,
        dataset,
        logger,
        out_dir: str = ".",
        num_steps: Sequence[int] = (100, 500, 1000),
        mixture_weights=(0.5, 0.5),
        use_ema: bool = True,
        seed: int = 0,
    ):
        self.sampler = sampler
        self.dataset = dataset
        self.logger = logger
        self.out_dir = out_dir
        self.num_steps = tuple(num_steps)
        self.mixture_weights = mixture_weights
        self.use_ema = use_ema
        self.seed = seed

    def __call__(self, epoch: int, best_loss: float, state) -> None:
        import jax
        import jax.numpy as jnp

        params = (
            state.ema_params
            if self.use_ema and state.ema_params is not None
            else state.params
        )
        ms2_1, ms1_1, ms2_2, _ = self.dataset.sample_pair()
        w0, w1 = self.mixture_weights
        ms2_cond = w0 * ms2_1 + w1 * ms2_2
        x0 = jnp.asarray(ms2_1)[None]
        ms1 = jnp.asarray(ms1_1)[None]
        cond = jnp.asarray(ms2_cond)[None]

        rows = []
        for ns in self.num_steps:
            key = jax.random.fold_in(jax.random.PRNGKey(self.seed), epoch * 10000 + ns)
            noise = jax.random.normal(key, x0.shape, dtype=jnp.float32)
            pred, pred_noise = self.sampler.sample(params, noise, cond, ms1, num_steps=ns)
            pred_np = np.asarray(pred[0])
            cos = float(
                np.dot(pred_np.ravel(), ms2_1.ravel())
                / (np.linalg.norm(pred_np) * np.linalg.norm(ms2_1) + 1e-12)
            )
            paths = plot_single_prediction(
                ms2_1,
                ms2_2,
                ms2_cond,
                ms1_1,
                pred_np,
                np.asarray(pred_noise[0]),
                out_dir=self.out_dir,
                prefix=f"e{epoch}_s{ns}_",
            )
            rows.append([ns, epoch, best_loss, cos] + paths)
            if self.logger is not None:
                self.logger.log(
                    {f"predictions/cosine_{ns}steps": cos, "epoch": epoch}, commit=False
                )
        if self.logger is not None:
            self.logger.log_table(
                "predictions_table",
                [
                    "Num Steps",
                    "Epoch",
                    "Loss",
                    "Reconstruction Cosine",
                    "Target MS2",
                    "Target MS1",
                    "Noise MS2",
                    "Simulated Noise MS2 Input",
                    "Predicted MS2 Noise",
                    "Predicted MS2",
                ],
                rows,
            )
