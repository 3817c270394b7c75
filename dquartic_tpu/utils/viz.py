"""Prediction visualization + periodic logging hook.

Capability parity with the reference's wandb prediction tables
(/root/reference/dquartic/model/model_interface.py:669-976): every N
epochs, deconvolve one random window at several step counts and log the
six panels (target MS2, query MS1, noise, mixture input, predicted
noise, prediction). The reference renders through pyopenms_viz with
matplotlib/plotly backends and index axes (xlabel="RT Index",
model_interface.py:870-872); here matplotlib (default) or plotly render
peakmaps/chromatograms to files, and when the dataset carries the real
RT/m-z axis values (parquet SLICE_SCHEMA does) the panels use physical
axes instead of indices.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np


def _axis_extent(arr_2d, rt_axis, mz_axis):
    """(extent, xlabel, ylabel) for an (rt, mz) panel."""
    n_rt, n_mz = np.asarray(arr_2d).shape
    if (
        rt_axis is not None
        and mz_axis is not None
        and len(rt_axis) == n_rt
        and len(mz_axis) == n_mz
    ):
        return (
            [float(rt_axis[0]), float(rt_axis[-1]), float(mz_axis[0]), float(mz_axis[-1])],
            "Retention Time (s)",
            "m/z",
        )
    return [0, n_rt, 0, n_mz], "RT Index", "m/z Index"


def _peakmap(
    arr: np.ndarray,
    title: str,
    path: str,
    rt_axis: Optional[np.ndarray] = None,
    mz_axis: Optional[np.ndarray] = None,
    backend: str = "matplotlib",
) -> str:
    extent, xlabel, ylabel = _axis_extent(arr, rt_axis, mz_axis)
    if backend == "plotly":
        return _peakmap_plotly(arr, title, path, rt_axis, mz_axis, xlabel, ylabel)
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
        extent=extent,
    )
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    ax.set_title(title)
    fig.colorbar(im, ax=ax, label="intensity")
    fig.savefig(path, dpi=90, bbox_inches="tight")
    plt.close(fig)
    return path


def _peakmap_plotly(arr, title, path, rt_axis, mz_axis, xlabel, ylabel) -> str:
    """Plotly heatmap panel (reference backend="ms_plotly" parity,
    model_interface.py:805). Falls back to matplotlib when plotly is not
    installed. Writes HTML (interactive) since static plotly export needs
    kaleido."""
    try:
        import plotly.graph_objects as go
    except ImportError:
        return _peakmap(arr, title, path, rt_axis, mz_axis, backend="matplotlib")

    a = np.asarray(arr)
    x = rt_axis if rt_axis is not None and len(rt_axis) == a.shape[0] else np.arange(a.shape[0])
    y = mz_axis if mz_axis is not None and len(mz_axis) == a.shape[1] else np.arange(a.shape[1])
    fig = go.Figure(data=go.Heatmap(z=a.T, x=np.asarray(x), y=np.asarray(y), colorscale="Viridis"))
    fig.update_layout(title=title, xaxis_title=xlabel, yaxis_title=ylabel, width=800, height=500)
    html_path = os.path.splitext(path)[0] + ".html"
    fig.write_html(html_path, include_plotlyjs="cdn")
    return html_path


def _chromatogram(
    arr: np.ndarray,
    title: str,
    path: str,
    rt_axis: Optional[np.ndarray] = None,
    backend: str = "matplotlib",
) -> str:
    arr = np.asarray(arr)
    if rt_axis is not None and len(rt_axis) == len(arr):
        x, xlabel = np.asarray(rt_axis), "Retention Time (s)"
    else:
        x, xlabel = np.arange(len(arr)), "RT Index"
    if backend == "plotly":
        try:
            import plotly.graph_objects as go

            fig = go.Figure(data=go.Scatter(x=x, y=arr, mode="lines"))
            fig.update_layout(
                title=title, xaxis_title=xlabel, yaxis_title="Intensity", width=800, height=300
            )
            html_path = os.path.splitext(path)[0] + ".html"
            fig.write_html(html_path, include_plotlyjs="cdn")
            return html_path
        except ImportError:
            pass
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 3))
    ax.plot(x, arr)
    ax.set_xlabel(xlabel)
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
    rt_axis: Optional[np.ndarray] = None,
    mz_axis: Optional[np.ndarray] = None,
    backend: str = "matplotlib",
) -> List[str]:
    """Render the six reference panels (model_interface.py:796-976);
    returns file paths. ``rt_axis``/``mz_axis`` switch the panels to
    physical axes; ``backend`` in {"matplotlib", "plotly"}."""
    os.makedirs(out_dir, exist_ok=True)
    p = lambda name: os.path.join(out_dir, f"{prefix}{name}.png")  # noqa: E731
    pm = lambda arr, title, name: _peakmap(  # noqa: E731
        arr, title, p(name), rt_axis=rt_axis, mz_axis=mz_axis, backend=backend
    )
    paths = [
        pm(x_0, "Target MS2", "ms2_target"),
        (
            _chromatogram(ms1_cond, "Query MS1", p("ms1"), rt_axis=rt_axis, backend=backend)
            if np.asarray(ms1_cond).ndim == 1
            else pm(ms1_cond, "Query MS1", "ms1")
        ),
        pm(x_noise, "Noise MS2", "ms2_noise"),
        pm(ms2_cond, "Noised MS2 Input", "ms2_input"),
        pm(pred_noise, "Predicted Noise MS2", "pred_noise"),
        pm(pred, "Predicted MS2", "pred"),
    ]
    return paths


class PredictionLoggingHook:
    """Trainer ``prediction_hook``: sample one window at several step
    counts and log panel paths + reconstruction metrics
    (model_interface.py:669-794). Uses the dataset's real RT/m-z axes
    when available."""

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
        backend: str = "matplotlib",
    ):
        self.sampler = sampler
        self.dataset = dataset
        self.logger = logger
        self.out_dir = out_dir
        self.num_steps = tuple(num_steps)
        self.mixture_weights = mixture_weights
        self.use_ema = use_ema
        self.seed = seed
        self.backend = backend

    def _axes_for_drawn_row(self):
        """Axes of the window actually plotted: slices carry per-row
        rt/m-z bounds, so the drawn row's axes (dataset.last_indices)
        are fetched after each sample_pair(); index axes otherwise."""
        idx = getattr(self.dataset, "last_indices", None)
        if idx is not None and hasattr(self.dataset, "axes_for"):
            axes = self.dataset.axes_for(idx[0])
            if axes is not None:
                return axes
        return None, None

    def __call__(self, epoch: int, best_loss: float, state) -> None:
        import jax
        import jax.numpy as jnp

        params = (
            state.ema_params
            if self.use_ema and state.ema_params is not None
            else state.params
        )
        ms2_1, ms1_1, ms2_2, _ = self.dataset.sample_pair()
        rt_axis, mz_axis = self._axes_for_drawn_row()
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
                rt_axis=rt_axis,
                mz_axis=mz_axis,
                backend=self.backend,
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
