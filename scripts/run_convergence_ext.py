"""Extended canonical-shape convergence leg: deconvolution-cosine trend.

Continuation of scripts/run_convergence_fullshape.py (VERDICT r3
next-round #3). The 60-epoch leg proved the loss curve (2.9 -> 0.03) but
its 2,880 steps are far below the scale where the model starts *using*
the MS1 condition to pick the target component out of the mixture —
measured: swapping the MS1 condition at epoch 59 changes the
teacher-forced x0 estimate by <1% (the model reconstructs a mixture-like
map; 50-step deconvolution cosine ~0.03). The reference's own
convergence evidence is 98k-511k steps of a much smaller model
(BASELINE.md). This script adds training scale efficiently and records
the metric TREND at checkpoints:

  * the whole 48-window dataset lives ON DEVICE (261 MB f32 — the
    host-feeding path was ~50% of epoch wall time through the tunnel);
  * pair sampling + the dataset's pairwise minmax normalization run as
    one jitted program per step (semantics of data/dataset.py:345-378:
    joint-pair MS2 range, MS1 scale from split 1);
  * the real shipping train step (build_trainer: bf16 + fused_resnet +
    remat mid blocks + factored second moment) resumed from the leg-1
    checkpoint through the standard auto-resume protocol;
  * every EVAL_EVERY steps: 50-step DDIM deconvolution cosine in data
    space ([0, 1] — where the sparse peaks carry the signal) on held
    pairs, plus the MS1-swap sensitivity of the teacher-forced x0-hat at
    t=500 (the leading indicator that conditioning is being learned).

Env knobs: CONV_ROOT, EXT_STEPS (default 12000), EXT_BATCH (8),
EXT_EVAL_EVERY (2000), EXT_LR (7e-5).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.environ.get("CONV_ROOT", "/tmp/conv_fullshape")
STEPS = int(os.environ.get("EXT_STEPS", "12000"))
BATCH = int(os.environ.get("EXT_BATCH", "8"))
EVAL_EVERY = int(os.environ.get("EXT_EVAL_EVERY", "2000"))
BASE_LR = float(os.environ.get("EXT_LR", "7e-5"))
EVAL_PAIRS = [(0, 1), (2, 3)]


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from dquartic_tpu.core.diffusion import sample_timesteps  # noqa: F401 (doc)
    from dquartic_tpu.train.checkpoint import latest_path_for, restore_or_init
    from dquartic_tpu.utils.builder import build_process, build_trainer
    from dquartic_tpu.utils.config import load_train_config

    config = load_train_config(f"{ROOT}/config.json")
    config["model"]["batch_size"] = BATCH
    config["wandb"]["use_wandb"] = False
    trainer = build_trainer(config)
    ckpt_path = config["model"]["checkpoint_path"]

    ms2 = np.load(f"{ROOT}/ms2.npy").astype(np.float32)  # (N, 34, 40000)
    ms1 = np.load(f"{ROOT}/ms1.npy").astype(np.float32)  # (N, 34)
    n_win = ms2.shape[0]

    example = {
        "ms2_1": ms2[:BATCH],
        "ms1_1": ms1[:BATCH],
        "ms2_2": ms2[:BATCH],
        "ms1_2": ms1[:BATCH],
    }
    state = trainer.init_state(example)
    payload = {
        "epoch": np.int64(0),
        "best_loss": np.float64("inf"),
        "state": jax.tree_util.tree_map(lambda x: x, state),
    }
    payload, start_epoch, best_loss, resumed = restore_or_init(ckpt_path, payload)
    if not resumed:
        print("WARNING: no leg-1 checkpoint found; training from scratch")
    state = jax.tree_util.tree_map(jnp.asarray, payload["state"])
    print(f"resumed epoch={start_epoch} best_loss={best_loss:.4f}", flush=True)

    d_ms2 = jax.device_put(jnp.asarray(ms2))
    d_ms1 = jax.device_put(jnp.asarray(ms1))

    @jax.jit
    def make_batch(dm2, dm1, key):
        """Random non-identical pair batch with the dataset's pairwise
        minmax semantics (data/dataset.py:355-371), entirely on device."""
        k1, k2 = jax.random.split(key)
        i = jax.random.randint(k1, (BATCH,), 0, n_win)
        j = jax.random.randint(k2, (BATCH,), 0, n_win - 1)
        j = jnp.where(j >= i, j + 1, j)  # j != i
        a2, b2 = dm2[i], dm2[j]
        a1, b1 = dm1[i], dm1[j]
        lo = jnp.minimum(a2.min(axis=(1, 2)), b2.min(axis=(1, 2)))[:, None, None]
        hi = jnp.maximum(a2.max(axis=(1, 2)), b2.max(axis=(1, 2)))[:, None, None]
        s = jnp.maximum(hi - lo, 1e-12)
        l1 = a1.min(axis=1, keepdims=True)  # MS1 scale from split 1 only
        s1 = jnp.maximum(a1.max(axis=1, keepdims=True) - l1, 1e-12)
        return {
            "ms2_1": (a2 - lo) / s,
            "ms1_1": (a1 - l1) / s1,
            "ms2_2": (b2 - lo) / s,
            "ms1_2": (b1 - l1) / s1,
        }

    # ---- eval: 50-step deconvolution cosine + MS1-swap sensitivity ------
    process_eval = dataclasses.replace(
        build_process(config), parity_neighbor_stepping=False
    )
    ab = jnp.asarray(process_eval.schedule.alpha_bars)

    def _pair_arrays(i, j):
        lo = min(ms2[i].min(), ms2[j].min())
        hi = max(ms2[i].max(), ms2[j].max())
        nm = lambda a: (a - lo) / max(hi - lo, 1e-12)  # noqa: E731
        target = jnp.asarray(nm(ms2[i]))[None]
        mix = jnp.asarray(0.5 * nm(ms2[i]) + 0.5 * nm(ms2[j]))[None]
        m1i = jnp.asarray(
            (ms1[i] - ms1[i].min()) / max(ms1[i].max() - ms1[i].min(), 1e-12)
        )[None]
        m1j = jnp.asarray(
            (ms1[j] - ms1[j].min()) / max(ms1[j].max() - ms1[j].min(), 1e-12)
        )[None]
        return target, mix, m1i, m1j

    @jax.jit
    def sample50(params, x_t, mix, m1):
        def denoise(x, t, ic, ac):
            return trainer.model.apply(params, x, t, ic, ac)

        return process_eval.sample(denoise, x_t, mix, m1, num_steps=50)[0]

    @jax.jit
    def x0hat500(params, eps, target_n, mix_n, m1_n):
        t = 500
        tv = jnp.full((1,), t, jnp.int32)
        xt = jnp.sqrt(ab[t]) * target_n + jnp.sqrt(1.0 - ab[t]) * eps
        pred = trainer.model.apply(params, xt, tv, mix_n, m1_n).astype(jnp.float32)
        return (xt - jnp.sqrt(1.0 - ab[t]) * pred) / jnp.sqrt(ab[t])

    def cosine(a, b):
        a = np.asarray(a, np.float64).ravel()
        b = np.asarray(b, np.float64).ravel()
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))

    eval_noise = jax.random.normal(
        jax.random.PRNGKey(1234), (1,) + ms2.shape[1:], jnp.float32
    )

    def run_eval(params, step):
        recs = []
        for i, j in EVAL_PAIRS:
            target, mix, m1i, m1j = _pair_arrays(i, j)
            pred = sample50(params, eval_noise, mix, m1i)
            cos = cosine(pred, target)
            base = cosine(mix, target)
            tn, mn = process_eval.normalize(target), process_eval.normalize(mix)
            x0i = x0hat500(params, eval_noise, tn, mn, process_eval.normalize(m1i))
            x0j = x0hat500(params, eval_noise, tn, mn, process_eval.normalize(m1j))
            swap = float(jnp.mean(jnp.abs(x0i - x0j)) / (jnp.mean(jnp.abs(x0i)) + 1e-12))
            # data-space ([0,1]) teacher-forced x0 cosines: does the map
            # lean toward the target or stay mixture-like?
            x0i01 = np.clip((np.asarray(x0i) + 1.0) * 0.5, 0.0, None)
            recs.append(
                {
                    "pair": [i, j],
                    "cos50": cos,
                    "mix_baseline": base,
                    "ms1_swap_rel": swap,
                    "x0hat500_cos_target": cosine(x0i01, target),
                    "x0hat500_cos_mix": cosine(x0i01, mix),
                }
            )
        print(f"[eval @ step {step}] " + json.dumps(recs), flush=True)
        return recs

    # ---- loop ------------------------------------------------------------
    log_path = f"{ROOT}/metrics_ext.jsonl"
    logf = open(log_path, "a")
    key0 = jax.random.PRNGKey(20260819)
    step_fn = trainer.train_step
    samples_seen = 0
    t_start = time.time()
    evals = run_eval(state.params, 0)
    logf.write(json.dumps({"step": 0, "evals": evals}) + "\n")
    logf.flush()

    losses = []
    for step in range(1, STEPS + 1):
        kb, kr = jax.random.split(jax.random.fold_in(key0, step))
        lr = jnp.float32(
            5e-6 + 0.5 * (BASE_LR - 5e-6) * (1.0 + np.cos(np.pi * step / STEPS))
        )
        batch = make_batch(d_ms2, d_ms1, kb)
        state, metrics = step_fn(state, batch, lr, kr)
        losses.append(metrics["loss"])
        samples_seen += BATCH

        if step % 200 == 0:
            vals = [float(x) for x in jax.device_get(losses)]
            losses = []
            rec = {
                "step": step,
                "loss_mean200": float(np.mean(vals)),
                "lr": float(lr),
                "wall_s": round(time.time() - t_start, 1),
            }
            print(json.dumps(rec), flush=True)
            logf.write(json.dumps(rec) + "\n")
            logf.flush()

        if step % EVAL_EVERY == 0 or step == STEPS:
            evals = run_eval(state.params, step)
            logf.write(json.dumps({"step": step, "evals": evals}) + "\n")
            logf.flush()

        if step == STEPS // 2 or step == STEPS:
            epoch_equiv = start_epoch + samples_seen // n_win
            trainer._save(
                latest_path_for(ckpt_path), epoch_equiv, float(np.mean(vals)), state
            )
            print(f"checkpoint saved at step {step} (epoch_equiv {epoch_equiv})", flush=True)

    print(f"done: {STEPS} steps ({samples_seen} samples) in {time.time()-t_start:.0f}s")


if __name__ == "__main__":
    main()
