"""Identifiability experiment: the same stack deconvolving, with the task
scaled to its training budget.

The canonical-shape convergence legs (scripts/run_convergence_fullshape
/ _ext) proved stable training at full width but hit the expected
small-budget plateau: the model reconstructs the mixture posterior and
barely uses the MS1 condition — the reference itself needed 98k-511k
steps on real data (BASELINE.md). This experiment answers the converse
question the round-3 verdict left open: does the SAME stack (canonical
7-level UNet1d arch, shipping bf16 + fused_resnet + remat + factored
training config, real 50-step DDIM `process.sample` path) actually
*deconvolve* — beat the mixture baseline cosine — when the task scale
matches a minutes-scale budget?

Task design (what "scaled to its budget" means):
  * m/z width 2560 (the 7-level divisibility contract's smallest
    realistic width; same arch, every kernel on its Pallas path);
  * each window holds 4 peptides whose RT profiles are narrow Gaussians
    and whose MS1 trace is EXACTLY the sum of those profiles — the MS1
    condition carries complete row-level information about which RT rows
    belong to the target (in real DIA this is the precursor elution
    profile, the signal dquartic conditions on: reference README.md:5);
  * pairs of windows therefore differ in RT occupancy with high
    probability, so the Bayes-optimal deconvolution is approximately
    "keep the mixture's rows where MY MS1 is active" — learnable at
    ~10^4 steps instead of ~10^5.

Eval: 50-step DDIM deconvolution cosine (data space) on pairs from two
HELD-OUT windows (never trained) and one training pair, vs the
cos(mixture, target) baseline; plus the MS1-swap sensitivity of the
teacher-forced x0-hat (the direct probe that the conditioning pathway is
used). Success = held-out cos50 > mixture baseline.

Env knobs: IDF_ROOT (/tmp/identifiability), IDF_STEPS (24000),
IDF_BATCH (8), IDF_EVAL_EVERY (3000), IDF_LR (1.5e-4), IDF_WINDOWS (18;
last 2 held out).
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.environ.get("IDF_ROOT", "/tmp/identifiability")
STEPS = int(os.environ.get("IDF_STEPS", "24000"))
BATCH = int(os.environ.get("IDF_BATCH", "8"))
EVAL_EVERY = int(os.environ.get("IDF_EVAL_EVERY", "3000"))
BASE_LR = float(os.environ.get("IDF_LR", "1.5e-4"))
N_WINDOWS = int(os.environ.get("IDF_WINDOWS", "18"))
RT, MZ = 34, 2560
N_HELD = 2


def make_window(rng, n_pep=4):
    """Sparse MS2 window + an MS1 trace that is exactly the summed RT
    profile of its peptides (fully informative conditioning)."""
    W = np.zeros((RT, MZ), np.float32)
    ms1 = np.zeros((RT,), np.float32)
    t = np.arange(RT)
    for _ in range(n_pep):
        c = rng.uniform(3, RT - 3)
        s = rng.uniform(1.2, 2.5)
        prof = np.exp(-0.5 * ((t - c) / s) ** 2).astype(np.float32)
        n_frag = int(rng.integers(5, 12))
        pos = rng.integers(20, MZ - 20, n_frag)
        inten = rng.lognormal(0.0, 0.8, n_frag).astype(np.float32)
        spec = np.zeros(MZ, np.float32)
        shape = np.array([0.1, 0.5, 1.0, 0.5, 0.1], np.float32)
        for p, a in zip(pos, inten):
            spec[p - 2 : p + 3] += a * shape
        amp = float(rng.lognormal(0.0, 0.4))
        W += amp * np.outer(prof, spec)
        ms1 += amp * prof
    return W, ms1


def main():
    import jax
    import jax.numpy as jnp

    from dquartic_tpu.utils.builder import build_process, build_trainer
    from dquartic_tpu.utils.config import generate_train_config, load_train_config

    os.makedirs(ROOT, exist_ok=True)
    rng = np.random.default_rng(7)
    ws, m1s = zip(*(make_window(rng) for _ in range(N_WINDOWS)))
    ms2 = np.stack(ws)
    ms1 = np.stack(m1s)
    n_train = N_WINDOWS - N_HELD

    cfg_path = f"{ROOT}/config.json"
    generate_train_config(cfg_path)
    config = json.load(open(cfg_path))
    config["model"]["UNet1d"]["downsample_dim"] = MZ
    config["model"]["UNet1d"]["remat_blocks"] = True
    config["model"]["batch_size"] = BATCH
    config["wandb"]["use_wandb"] = False
    config["tpu"].update(
        compute_dtype="bfloat16",
        optimizer="factored",
        fused_resnet=True,
        ema_decay=None,
    )
    json.dump(config, open(cfg_path, "w"), indent=1)
    config = load_train_config(cfg_path)
    trainer = build_trainer(config)

    example = {
        "ms2_1": ms2[:BATCH],
        "ms1_1": ms1[:BATCH],
        "ms2_2": ms2[:BATCH],
        "ms1_2": ms1[:BATCH],
    }
    state = trainer.init_state(example)
    ckpt = f"{ROOT}/state.ckpt"
    if os.environ.get("IDF_RESUME") == "1" and os.path.exists(ckpt):
        from dquartic_tpu.train.checkpoint import load_checkpoint

        state = jax.tree_util.tree_map(jnp.asarray, load_checkpoint(ckpt)["state"])
        print(f"resumed from {ckpt}", flush=True)
    print(f"params: {trainer.num_parameters(state)/1e6:.1f}M  windows: {n_train} train + {N_HELD} held", flush=True)

    d_ms2 = jax.device_put(jnp.asarray(ms2[:n_train]))
    d_ms1 = jax.device_put(jnp.asarray(ms1[:n_train]))

    @jax.jit
    def make_batch(dm2, dm1, key):
        """Pair batch with the dataset's pairwise-minmax semantics
        (data/dataset.py:345-378), entirely on device."""
        k1, k2 = jax.random.split(key)
        i = jax.random.randint(k1, (BATCH,), 0, n_train)
        j = jax.random.randint(k2, (BATCH,), 0, n_train - 1)
        j = jnp.where(j >= i, j + 1, j)
        a2, b2 = dm2[i], dm2[j]
        a1 = dm1[i]
        lo = jnp.minimum(a2.min(axis=(1, 2)), b2.min(axis=(1, 2)))[:, None, None]
        hi = jnp.maximum(a2.max(axis=(1, 2)), b2.max(axis=(1, 2)))[:, None, None]
        s = jnp.maximum(hi - lo, 1e-12)
        l1 = a1.min(axis=1, keepdims=True)
        s1 = jnp.maximum(a1.max(axis=1, keepdims=True) - l1, 1e-12)
        return {
            "ms2_1": (a2 - lo) / s,
            "ms1_1": (a1 - l1) / s1,
            "ms2_2": (b2 - lo) / s,
            "ms1_2": (dm1[j] - l1) / s1,  # reference scales ms1_2 off split 1
        }

    # ---- eval ------------------------------------------------------------
    process_eval = dataclasses.replace(
        build_process(config), parity_neighbor_stepping=False
    )
    ab = jnp.asarray(process_eval.schedule.alpha_bars)

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

    def separation(pred, target, other, tau=0.05):
        """Peak-energy separation: of the sample's energy on cells that
        belong to exactly one component's peaks, the fraction on the
        TARGET's. The deconvolution question ("keep my peaks, drop the
        interferer's") directly — immune to the dense low-level
        background that dominates a whole-map cosine on sparse maps.
        0.5 = mixture-like (no separation), 1.0 = perfect."""
        t = np.asarray(target, np.float64).ravel()
        o = np.asarray(other, np.float64).ravel()
        p = np.clip(np.asarray(pred, np.float64).ravel(), 0.0, None)
        t_mask = (t > tau * t.max()) & (o <= tau * o.max())
        o_mask = (o > tau * o.max()) & (t <= tau * t.max())
        et, eo = float(p[t_mask].sum()), float(p[o_mask].sum())
        return et / (et + eo + 1e-12)

    def _pair(i, j):
        lo = min(ms2[i].min(), ms2[j].min())
        hi = max(ms2[i].max(), ms2[j].max())
        nm = lambda a: (a - lo) / max(hi - lo, 1e-12)  # noqa: E731
        target = jnp.asarray(nm(ms2[i]))[None]
        other = jnp.asarray(nm(ms2[j]))[None]
        mix = 0.5 * target + 0.5 * other
        m1 = lambda k: jnp.asarray(  # noqa: E731
            (ms1[k] - ms1[k].min()) / max(ms1[k].max() - ms1[k].min(), 1e-12)
        )[None]
        return target, other, mix, m1(i), m1(j)

    # held-out pair, reversed held-out pair, one training pair
    EVAL = [
        ("held", n_train, n_train + 1),
        ("held_rev", n_train + 1, n_train),
        ("train", 0, 1),
    ]
    eval_noise = jax.random.normal(jax.random.PRNGKey(99), (1, RT, MZ), jnp.float32)

    def run_eval(params, step):
        recs = []
        for tag, i, j in EVAL:
            target, other, mix, m1i, m1j = _pair(i, j)
            pred = sample50(params, eval_noise, mix, m1i)
            pred_swap = sample50(params, eval_noise, mix, m1j)
            tn = process_eval.normalize(target)
            mn = process_eval.normalize(mix)
            x0i = x0hat500(params, eval_noise, tn, mn, process_eval.normalize(m1i))
            x0j = x0hat500(params, eval_noise, tn, mn, process_eval.normalize(m1j))
            swap = float(jnp.mean(jnp.abs(x0i - x0j)) / (jnp.mean(jnp.abs(x0i)) + 1e-12))
            recs.append(
                {
                    "pair": tag,
                    "cos50": round(cosine(pred, target), 4),
                    "mix_baseline": round(cosine(mix, target), 4),
                    # the identifiability readout: >0.5 = peaks steered
                    # toward the MS1-conditioned component; the same
                    # sample conditioned on the OTHER MS1 should steer
                    # the opposite way (sep50_swap < sep50)
                    "sep50": round(separation(pred, target, other), 4),
                    "sep50_swap": round(separation(pred_swap, target, other), 4),
                    "sep_mix_baseline": round(separation(mix, target, other), 4),
                    "ms1_swap_rel": round(swap, 4),
                }
            )
        print(f"[eval @ step {step}] " + json.dumps(recs), flush=True)
        return recs

    # ---- loop ------------------------------------------------------------
    logf = open(f"{ROOT}/metrics.jsonl", "a")
    key0 = jax.random.PRNGKey(20260820)
    step_fn = trainer.train_step
    t_start = time.time()
    logf.write(json.dumps({"step": 0, "evals": run_eval(state.params, 0)}) + "\n")
    losses = []
    for step in range(1, STEPS + 1):
        kb, kr = jax.random.split(jax.random.fold_in(key0, step))
        lr = jnp.float32(
            1e-5 + 0.5 * (BASE_LR - 1e-5) * (1.0 + np.cos(np.pi * step / STEPS))
        )
        state, metrics = step_fn(state, make_batch(d_ms2, d_ms1, kb), lr, kr)
        losses.append(metrics["loss"])
        if step % 500 == 0:
            vals = [float(x) for x in jax.device_get(losses)]
            losses = []
            rec = {
                "step": step,
                "loss_mean500": round(float(np.mean(vals)), 5),
                "wall_s": round(time.time() - t_start, 1),
            }
            print(json.dumps(rec), flush=True)
            logf.write(json.dumps(rec) + "\n")
            logf.flush()
        if step % EVAL_EVERY == 0 or step == STEPS:
            logf.write(json.dumps({"step": step, "evals": run_eval(state.params, step)}) + "\n")
            logf.flush()
    from dquartic_tpu.train.checkpoint import save_checkpoint

    save_checkpoint(ckpt, {"state": jax.device_get(state)})
    print(f"done: {STEPS} steps in {time.time()-t_start:.0f}s; state -> {ckpt}", flush=True)


if __name__ == "__main__":
    main()
