"""Identifiability experiment: the same stack deconvolving, with the task
scaled to its training budget.

The canonical-shape convergence legs (scripts/run_convergence_fullshape
/ _ext) proved stable training at full width but hit the expected
small-budget plateau: the model reconstructs the mixture posterior and
barely uses the MS1 condition — the reference itself needed 98k-511k
steps on real data (BASELINE.md). This experiment answers the converse
question: does the SAME stack (canonical 7-level UNet1d arch, shipping
bf16 + fused_resnet + remat + factored training config, real 50-step
DDIM `process.sample` path) actually *deconvolve* — steer peak energy
toward the MS1-conditioned component — when the task scale matches the
budget?

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
    "keep the mixture's rows where MY MS1 is active".

Primary readout: the peak-energy separation metric `sep50` (fraction of
the 50-step sample's energy on target-only vs interferer-only peak
cells; 0.5 = mixture-like, 1.0 = perfect — immune to the dense
background floor that swamps whole-map cosine on ~1%-sparse maps), its
swapped-conditioning control `sep50_swap` (same mixture, the OTHER
component's MS1 — must move the opposite way), and the
`sep_mix_baseline` (the mixture's own separation). Secondary: data-space
cos50 and the teacher-forced MS1-swap sensitivity.

Env knobs:
  IDF_ROOT (/tmp/identifiability)  per-leg output dir (ckpt + jsonl)
  IDF_STEPS (24000)                steps to run THIS invocation
  IDF_TOTAL (=IDF_STEPS)           LR-cosine horizon in global steps
                                   (resume legs continue the schedule)
  IDF_BATCH (8), IDF_EVAL_EVERY (3000), IDF_LR (1.5e-4)
  IDF_WINDOWS (18; last 2 held out)
  IDF_MZ (2560)                    m/z width (40000 = canonical shape)
  IDF_RESUME (0)                   1 = resume from IDF_ROOT/state.ckpt
  IDF_SAVE_EVERY (=IDF_EVAL_EVERY) checkpoint cadence (steps)
  -- ablation levers (VERDICT r4 next-round #2) --
  IDF_MS1W (0.0)    model.ms1_loss_weight — the reference's MS1
                    pseudo-chromatogram consistency loss
                    (reference model.py:364-404; core/diffusion.py)
  IDF_PRED (eps)    model.pred_type (reference model.py:204-213)
  IDF_WEIGHTING (reference)  tpu.loss_weighting: reference | uniform |
                    min_snr:<gamma> (core/schedules.py). "uniform" with
                    IDF_PRED=x0 weights every timestep's reconstruction
                    equally — mass shifts to high-t where only the MS1
                    condition can identify the target
  IDF_EMA ()        tpu.ema_decay (e.g. 0.999); when set, every eval
                    also runs with the EMA params (the predict CLI's
                    default sampling weights)
  IDF_OVERFIT (0)   1 = single-pair overfit control: ONE fixed window
                    pair, trained in BOTH directions (same mixture, two
                    MS1s -> two targets), so the conditional posterior
                    is deterministic and conditioning is the only way
                    to tell the targets apart. If sep50 cannot leave
                    0.5 here at a few-k steps, something structural is
                    wrong; if it can, the multi-window plateau is pure
                    training scale.
  IDF_INFINITE (0)  1 = fresh synthetic windows EVERY batch, generated
                    on-device inside the jitted batch fn (same
                    generative family as make_window). Closes the
                    memorization loophole the r5 16-window run exposed:
                    with a fixed window set the model learns
                    window-specific (MS1 -> target) associations (train
                    sep50 splits, held-out does not); with unlimited
                    windows the only strategy that reduces the loss is
                    the general rule "keep the mixture's rows where MY
                    MS1 is active" — held-out sep50 is the readout.
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
TOTAL = int(os.environ.get("IDF_TOTAL", str(STEPS)))
BATCH = int(os.environ.get("IDF_BATCH", "8"))
EVAL_EVERY = int(os.environ.get("IDF_EVAL_EVERY", "3000"))
BASE_LR = float(os.environ.get("IDF_LR", "1.5e-4"))
N_WINDOWS = int(os.environ.get("IDF_WINDOWS", "18"))
SAVE_EVERY = int(os.environ.get("IDF_SAVE_EVERY", str(EVAL_EVERY)))
MS1W = float(os.environ.get("IDF_MS1W", "0.0"))
PRED = os.environ.get("IDF_PRED", "eps")
WEIGHTING = os.environ.get("IDF_WEIGHTING", "reference")
EMA = os.environ.get("IDF_EMA", "")
OVERFIT = os.environ.get("IDF_OVERFIT") == "1"
INFINITE = os.environ.get("IDF_INFINITE") == "1"
# IDF_MZ: m/z width (default 2560 = the smallest realistic 7-level
# width; 40000 runs the task at the exact canonical shape)
RT, MZ = 34, int(os.environ.get("IDF_MZ", "2560"))
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
    import flax.serialization as fser
    import jax
    import jax.numpy as jnp

    from dquartic_tpu.train.checkpoint import load_checkpoint, save_checkpoint
    from dquartic_tpu.utils.builder import build_process, build_trainer
    from dquartic_tpu.utils.config import generate_train_config, load_train_config

    os.makedirs(ROOT, exist_ok=True)
    rng = np.random.default_rng(7)
    ws, m1s = zip(*(make_window(rng) for _ in range(N_WINDOWS)))
    ms2 = np.stack(ws)
    ms1 = np.stack(m1s)
    n_train = 2 if OVERFIT else N_WINDOWS - N_HELD

    cfg_path = f"{ROOT}/config.json"
    generate_train_config(cfg_path)
    config = json.load(open(cfg_path))
    config["model"]["UNet1d"]["downsample_dim"] = MZ
    config["model"]["UNet1d"]["remat_blocks"] = True
    config["model"]["batch_size"] = BATCH
    config["model"]["ms1_loss_weight"] = MS1W
    config["model"]["pred_type"] = PRED
    config["wandb"]["use_wandb"] = False
    config["tpu"].update(
        compute_dtype="bfloat16",
        optimizer="factored",
        fused_resnet=True,
        ema_decay=float(EMA) if EMA else None,
        loss_weighting=WEIGHTING,
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
    g_start = 0
    if os.environ.get("IDF_RESUME") == "1" and os.path.exists(ckpt):
        # restore THROUGH the freshly-initialized state as the structure
        # template (raw msgpack holds plain nested dicts, not a TrainState)
        template = {"global_step": np.int64(0), "state": jax.device_get(state)}
        restored = fser.from_state_dict(template, load_checkpoint(ckpt))
        g_start = int(restored["global_step"])
        state = jax.tree_util.tree_map(jnp.asarray, restored["state"])
        print(f"resumed from {ckpt} at global step {g_start}", flush=True)
    mode = "overfit" if OVERFIT else ("infinite" if INFINITE else "heldout")
    print(
        f"params: {trainer.num_parameters(state)/1e6:.1f}M  mode={mode} "
        f"windows: {n_train} train + {0 if OVERFIT else N_HELD} held "
        f"ms1w={MS1W} pred={PRED} weighting={WEIGHTING} ema={EMA or 'off'} "
        f"steps {g_start}+{STEPS} of {TOTAL}",
        flush=True,
    )

    d_ms2 = jax.device_put(jnp.asarray(ms2[:n_train]))
    d_ms1 = jax.device_put(jnp.asarray(ms1[:n_train]))

    def make_windows_jax(key, n, n_pep=4):
        """On-device analogue of make_window: fresh (n, RT, MZ) MS2 maps
        with their exact summed-profile MS1 traces, entirely inside jit
        (the IDF_INFINITE data stream — no fixed window set to memorize)."""
        kc, ks, kn, kp, ki, ka = jax.random.split(key, 6)
        t = jnp.arange(RT, dtype=jnp.float32)
        c = jax.random.uniform(kc, (n, n_pep), minval=3.0, maxval=RT - 3.0)
        s = jax.random.uniform(ks, (n, n_pep), minval=1.2, maxval=2.5)
        prof = jnp.exp(
            -0.5 * ((t[None, None, :] - c[..., None]) / s[..., None]) ** 2
        )  # (n, p, RT)
        MAXF = 12
        nf = jax.random.randint(kn, (n, n_pep), 5, 12)
        pos = jax.random.randint(kp, (n, n_pep, MAXF), 20, MZ - 20)
        inten = jnp.exp(0.8 * jax.random.normal(ki, (n, n_pep, MAXF)))
        inten = inten * (jnp.arange(MAXF)[None, None, :] < nf[..., None])
        rows = jnp.arange(n * n_pep)[:, None]
        posf = pos.reshape(n * n_pep, MAXF)
        intf = inten.reshape(n * n_pep, MAXF)
        spec = jnp.zeros((n * n_pep, MZ), jnp.float32)
        for off, w in zip(range(-2, 3), (0.1, 0.5, 1.0, 0.5, 0.1)):
            spec = spec.at[rows, posf + off].add(w * intf)
        spec = spec.reshape(n, n_pep, MZ)
        amp = jnp.exp(0.4 * jax.random.normal(ka, (n, n_pep)))
        aprof = amp[..., None] * prof
        return jnp.einsum("npr,npm->nrm", aprof, spec), jnp.sum(aprof, axis=1)

    @jax.jit
    def make_batch(dm2, dm1, key):
        """Pair batch with the dataset's pairwise-minmax semantics
        (data/dataset.py:345-378), entirely on device. Overfit mode uses
        the one fixed pair in both directions instead of random pairs."""
        if OVERFIT:
            i = jnp.tile(jnp.arange(2, dtype=jnp.int32), BATCH // 2 + 1)[:BATCH]
            j = 1 - i
        else:
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

    @jax.jit
    def make_batch_inf(key):
        """IDF_INFINITE: a fresh window pair per batch element, same
        pairwise-minmax semantics — the generator runs on device, so the
        data stream costs no host traffic."""
        W, M = make_windows_jax(key, 2 * BATCH)
        a2, b2 = W[:BATCH], W[BATCH:]
        a1 = M[:BATCH]
        lo = jnp.minimum(a2.min(axis=(1, 2)), b2.min(axis=(1, 2)))[:, None, None]
        hi = jnp.maximum(a2.max(axis=(1, 2)), b2.max(axis=(1, 2)))[:, None, None]
        s = jnp.maximum(hi - lo, 1e-12)
        l1 = a1.min(axis=1, keepdims=True)
        s1 = jnp.maximum(a1.max(axis=1, keepdims=True) - l1, 1e-12)
        return {
            "ms2_1": (a2 - lo) / s,
            "ms1_1": (a1 - l1) / s1,
            "ms2_2": (b2 - lo) / s,
            "ms1_2": (M[BATCH:] - l1) / s1,
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
        if PRED == "x0":
            return pred
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

    if OVERFIT:
        EVAL = [("train", 0, 1), ("train_rev", 1, 0)]
    else:
        # held-out pair, reversed held-out pair, one training pair
        EVAL = [
            ("held", n_train, n_train + 1),
            ("held_rev", n_train + 1, n_train),
            ("train", 0, 1),
        ]
    eval_noise = jax.random.normal(jax.random.PRNGKey(99), (1, RT, MZ), jnp.float32)

    def eval_params(params, suffix=""):
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
                    "pair": tag + suffix,
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
        return recs

    def run_eval(state, step):
        recs = eval_params(state.params)
        if state.ema_params is not None:
            recs += eval_params(state.ema_params, suffix="_ema")
        print(f"[eval @ step {step}] " + json.dumps(recs), flush=True)
        return recs

    def save(state, g_step, path=None):
        t0 = time.time()
        path = path or ckpt
        save_checkpoint(
            path, {"global_step": np.int64(g_step), "state": jax.device_get(state)}
        )
        print(f"saved {path} @ {g_step} ({time.time()-t0:.0f}s)", flush=True)

    # ---- loop ------------------------------------------------------------
    logf = open(f"{ROOT}/metrics.jsonl", "a")
    key0 = jax.random.PRNGKey(20260820)
    step_fn = trainer.train_step
    t_start = time.time()
    best_split = -1.0

    def track_best(recs, step, state):
        # keep the best-separating params in a SEPARATE file: the r5 hot
        # LR-restart collapse showed the conditioned solution can be lost
        # mid-run, and the rolling state.ckpt then overwrites it
        nonlocal best_split
        split = recs[0]["sep50"] - recs[0]["sep50_swap"]
        if split > best_split:
            best_split = split
            save(state, step, path=f"{ROOT}/state_best.ckpt")

    recs0 = run_eval(state, g_start)
    track_best(recs0, g_start, state)
    logf.write(json.dumps({"step": g_start, "evals": recs0}) + "\n")
    losses = []
    end = min(g_start + STEPS, TOTAL)
    for step in range(g_start + 1, end + 1):
        kb, kr = jax.random.split(jax.random.fold_in(key0, step))
        lr = jnp.float32(
            1e-5 + 0.5 * (BASE_LR - 1e-5) * (1.0 + np.cos(np.pi * step / TOTAL))
        )
        batch = make_batch_inf(kb) if INFINITE else make_batch(d_ms2, d_ms1, kb)
        state, metrics = step_fn(state, batch, lr, kr)
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
        if step % EVAL_EVERY == 0 or step == end:
            recs = run_eval(state, step)
            track_best(recs, step, state)
            logf.write(json.dumps({"step": step, "evals": recs}) + "\n")
            logf.flush()
        if step % SAVE_EVERY == 0 or step == end:
            save(state, step)
    print(f"done: steps {g_start}->{end} in {time.time()-t_start:.0f}s", flush=True)


if __name__ == "__main__":
    main()
