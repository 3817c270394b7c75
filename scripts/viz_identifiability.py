"""Render the deconvolution acceptance panels from an identifiability
checkpoint (the quantitative analogue of the reference's wandb panel
evidence, report.md:39-45 / model_interface.py:796-976).

Loads IDF_ROOT/state.ckpt (same env knobs as scripts/run_identifiability.py,
which must match the training leg's), rebuilds the held-out window pair,
runs the REAL 50-step DDIM `process.sample` path conditioned on (a) the
target's MS1 and (b) the interferer's MS1 (the swap control), and writes
one composite figure:

    mixture input | sample w/ target MS1 | true target
    MS1 traces    | sample w/ SWAP MS1   | true interferer

Peak maps are max-pooled along m/z for display only (5-bin fragment
clusters are sub-pixel at 2560 bins; max-pooling keeps them visible and
is stated on the axis label) — every number (sep50 etc.) is computed on
the raw maps via the same metrics as the training evals.

Run (after a training leg, e.g. the round-5 100k-step infinite-data run):
  IDF_ROOT=/tmp/idf/inf_x0 IDF_INFINITE=1 IDF_PRED=x0 \
  IDF_WEIGHTING=uniform IDF_EMA=0.999 \
  python scripts/viz_identifiability.py img/deconvolution_idf.png
"""

import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from run_identifiability import MZ, N_WINDOWS, RT, ROOT, make_window  # noqa: E402


def main():
    import flax.serialization as fser
    import jax
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from dquartic_tpu.train.checkpoint import load_checkpoint
    from dquartic_tpu.utils.builder import build_process, build_trainer
    from dquartic_tpu.utils.config import load_train_config

    out_path = sys.argv[1] if len(sys.argv) > 1 else "img/deconvolution_idf.png"
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)

    # identical window battery to the training script (seed 7; last 2 held out)
    rng = np.random.default_rng(7)
    ws, m1s = zip(*(make_window(rng) for _ in range(N_WINDOWS)))
    ms2, ms1 = np.stack(ws), np.stack(m1s)
    i, j = N_WINDOWS - 2, N_WINDOWS - 1  # the held-out pair

    config = load_train_config(f"{ROOT}/config.json")
    trainer = build_trainer(config)
    batch = int(config["model"]["batch_size"])
    example = {
        "ms2_1": ms2[:batch], "ms1_1": ms1[:batch],
        "ms2_2": ms2[:batch], "ms1_2": ms1[:batch],
    }
    state = trainer.init_state(example)
    template = {"global_step": np.int64(0), "state": jax.device_get(state)}
    restored = fser.from_state_dict(
        template, load_checkpoint(f"{ROOT}/state.ckpt")
    )
    step = int(restored["global_step"])
    state = jax.tree_util.tree_map(jnp.asarray, restored["state"])
    params = state.ema_params if state.ema_params is not None else state.params
    print(f"loaded {ROOT}/state.ckpt @ step {step}", flush=True)

    process = dataclasses.replace(
        build_process(config), parity_neighbor_stepping=False
    )

    # same normalization + sampling as run_identifiability's eval
    lo = min(ms2[i].min(), ms2[j].min())
    hi = max(ms2[i].max(), ms2[j].max())
    nm = lambda a: (a - lo) / max(hi - lo, 1e-12)  # noqa: E731
    target, other = nm(ms2[i]), nm(ms2[j])
    mix = 0.5 * target + 0.5 * other
    n1 = lambda k: (ms1[k] - ms1[k].min()) / max(np.ptp(ms1[k]), 1e-12)  # noqa: E731

    @jax.jit
    def sample50(p, m1):
        noise = jax.random.normal(jax.random.PRNGKey(99), (1, RT, MZ), jnp.float32)
        def denoise(x, t, ic, ac):
            return trainer.model.apply(p, x, t, ic, ac)
        return process.sample(
            denoise, noise, jnp.asarray(mix)[None], jnp.asarray(m1)[None],
            num_steps=50,
        )[0]

    pred = np.asarray(sample50(params, n1(i)))[0]
    pred_swap = np.asarray(sample50(params, n1(j)))[0]

    def separation(p, t, o, tau=0.05):
        t, o = t.ravel(), o.ravel()
        p = np.clip(p.ravel(), 0.0, None)
        tm = (t > tau * t.max()) & (o <= tau * o.max())
        om = (o > tau * o.max()) & (t <= tau * t.max())
        return float(p[tm].sum() / (p[tm].sum() + p[om].sum() + 1e-12))

    def cos(a, b):
        a, b = a.ravel(), b.ravel()
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))

    sep = separation(pred, target, other)
    sep_swap = separation(pred_swap, target, other)
    sep_mix = separation(mix, target, other)
    stats = {
        "step": step, "sep50": round(sep, 3), "sep50_swap": round(sep_swap, 3),
        "sep_mix_baseline": round(sep_mix, 3),
        "cos50": round(cos(pred, target), 3),
        "cos_mix_baseline": round(cos(mix, target), 3),
    }
    print(json.dumps(stats), flush=True)

    # display-only max-pool along m/z so 5-bin peaks stay visible
    POOL = 5
    def disp(a):
        return a[:, : (a.shape[1] // POOL) * POOL].reshape(RT, -1, POOL).max(2)

    panels = [
        (disp(mix), "Mixture input (2 co-eluting windows)"),
        (disp(np.clip(pred, 0, None)),
         f"50-step sample, TARGET MS1  (sep50 {sep:.2f})"),
        (disp(target), "True target window"),
        (None, "MS1 conditions"),
        (disp(np.clip(pred_swap, 0, None)),
         f"50-step sample, SWAPPED MS1  (sep50 {sep_swap:.2f})"),
        (disp(other), "True interferer window"),
    ]
    vmax = max(disp(mix).max(), disp(target).max(), disp(other).max())
    fig, axes = plt.subplots(2, 3, figsize=(16, 7))
    fig.suptitle(
        f"MS1-conditioned deconvolution on a held-out window pair — "
        f"step {step} (mixture-baseline sep50 {sep_mix:.2f})",
        fontsize=13,
    )
    for ax, (arr, title) in zip(axes.ravel(), panels):
        ax.set_title(title, fontsize=10)
        if arr is None:
            t = np.arange(RT)
            ax.plot(t, n1(i), lw=2, color="#4053d3", label="target MS1")
            ax.plot(t, n1(j), lw=2, color="#b51d14", label="interferer MS1")
            ax.set_xlabel("RT index")
            ax.set_ylabel("normalized intensity")
            ax.legend(frameon=False, fontsize=9)
            continue
        im = ax.imshow(
            arr.T, aspect="auto", origin="lower", interpolation="nearest",
            cmap="viridis",
            norm=matplotlib.colors.PowerNorm(0.45, vmin=0.0, vmax=vmax),
        )
        ax.set_xlabel("RT index")
        ax.set_ylabel(f"m/z bin (max-pooled x{POOL}, display only)")
        fig.colorbar(im, ax=ax, label="intensity (γ=0.45 display)", fraction=0.046)
    fig.tight_layout(rect=(0, 0, 1, 0.95))
    fig.savefig(out_path, dpi=110)
    print(f"wrote {out_path}", flush=True)
    with open(os.path.splitext(out_path)[0] + ".json", "w") as f:
        json.dump(stats, f, indent=1)


if __name__ == "__main__":
    main()
