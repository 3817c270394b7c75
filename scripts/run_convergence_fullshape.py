"""Full-shape convergence proof: canonical (34, 40000) windows, shipping
training config, on-chip (VERDICT r3 next-round #3).

The reference's convergence evidence is a wandb loss curve from real
HeLa-2018 training (reference report.md:39-45, img/train_los.png). No
real data exists in this environment, so the counterpart is *structured
synthetic* windows — chromatographic RT Gaussians x isotope-like m/z
fragment clusters, the same signal family — at the exact canonical shape
the production configs train, through the real CLI path (builder ->
trainer -> checkpoints -> auto-resume).

Phases (select with argv[1]):
  data     — generate structured windows + config
  train    — run `cli train` (resumable; kill + rerun exercises
             auto-resume through the latest-checkpoint protocol)
  eval     — 50-step DDIM deconvolution cosine of a checkpoint against
             the held-out target (the metric the prediction hook logs)

Typical session (~15 min on one v5e):
  python scripts/run_convergence_fullshape.py data
  timeout 420 python scripts/run_convergence_fullshape.py train   # killed mid-run
  python scripts/run_convergence_fullshape.py train               # auto-resumes
  python scripts/run_convergence_fullshape.py eval

Shipping training config = bf16 + fused_resnet + remat mid blocks +
factored second moment (tpu.optimizer="factored"), batch 1 — the exact
recipe bench.py's flagship train figure measures.
"""

import json
import os
import sys

ROOT = "/tmp/conv_fullshape"
RT, MZ = 34, 40000
N_WINDOWS = 48


def make_window(rng, n_pep=14):
    """One clean MS2 window + its MS1 RT trace: sums of (RT Gaussian) x
    (m/z fragment cluster) outer products — the structure the diffusion
    model exploits (reference data fabrication: model_interface.py:1070)."""
    import numpy as np

    W = np.zeros((RT, MZ), np.float32)
    ms1 = np.zeros((RT,), np.float32)
    t = np.arange(RT)
    for _ in range(n_pep):
        c = rng.uniform(4, RT - 4)
        s = rng.uniform(1.5, 4.0)
        prof = np.exp(-0.5 * ((t - c) / s) ** 2).astype(np.float32)
        n_frag = int(rng.integers(6, 18))
        pos = rng.integers(50, MZ - 50, n_frag)
        inten = rng.lognormal(0.0, 1.0, n_frag).astype(np.float32)
        spec = np.zeros(MZ, np.float32)
        shape = np.array([0.1, 0.5, 1.0, 0.5, 0.1], np.float32)
        for p, a in zip(pos, inten):
            spec[p - 2 : p + 3] += a * shape
        amp = float(rng.lognormal(0.0, 0.5))
        W += amp * np.outer(prof, spec)
        ms1 += amp * prof * float(inten.sum()) * 0.1
    return W, ms1


def cmd_data():
    import numpy as np

    os.makedirs(ROOT, exist_ok=True)
    rng = np.random.default_rng(0)
    ws, m1s = [], []
    for i in range(N_WINDOWS):
        W, m1 = make_window(rng)
        ws.append(W)
        m1s.append(m1)
    np.save(f"{ROOT}/ms2.npy", np.stack(ws))
    np.save(f"{ROOT}/ms1.npy", np.stack(m1s))

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from dquartic_tpu.utils.config import generate_train_config

    cfg_path = f"{ROOT}/config.json"
    generate_train_config(cfg_path)
    c = json.load(open(cfg_path))
    c["data"].update(
        ms2_data_path=f"{ROOT}/ms2.npy",
        ms1_data_path=f"{ROOT}/ms1.npy",
        parquet_directory=None,
    )
    c["model"].update(
        num_epochs=int(os.environ.get("CONV_EPOCHS", "140")),
        warmup_epochs=4,
        batch_size=1,
        learning_rate=1e-4,
        checkpoint_path=f"{ROOT}/ckpt/best.ckpt",
    )
    # canonical model + shipping training recipe
    c["model"]["UNet1d"]["remat_blocks"] = True
    c["wandb"]["use_wandb"] = False
    c["tpu"].update(
        compute_dtype="bfloat16",
        optimizer="factored",
        fused_resnet=True,
        ema_decay=None,  # EMA doubles resident params (2.4 GB) — off, as benched
        # checkpoints ride the slow host relay (~60 s per 2.4 GB pull) —
        # a sparse cadence is the auto-resume exercise, not a safety net;
        # best_every_n_epochs gates the reference's best-on-improvement
        # write, which otherwise fires EVERY epoch early in training
        checkpoint_every_n_epochs=int(os.environ.get("CONV_CKPT_EVERY", "50")),
        # best defaults to a final-epoch flush only: a second 2.4 GB pull
        # per cadence point doubles the save wall for no extra safety
        # (latest already carries the resume state)
        best_every_n_epochs=int(
            os.environ.get("CONV_BEST_EVERY", os.environ.get("CONV_EPOCHS", "120"))
        ),
        log_every_n_epochs=10,
    )
    json.dump(c, open(cfg_path, "w"), indent=1)
    print(f"data + config ready under {ROOT} ({N_WINDOWS} windows of ({RT}, {MZ}))")


def cmd_train():
    os.chdir(ROOT)
    os.execvp(
        sys.executable,
        [sys.executable, "-m", "dquartic_tpu.cli", "train", f"{ROOT}/config.json"],
    )


def cmd_eval(ckpt=None):
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax
    import jax.numpy as jnp

    from dquartic_tpu.infer import DDIMSampler
    from dquartic_tpu.train.checkpoint import load_checkpoint
    from dquartic_tpu.utils.builder import build_model, build_process
    from dquartic_tpu.utils.config import load_train_config

    config = load_train_config(f"{ROOT}/config.json")
    ckpt = ckpt or f"{ROOT}/ckpt/dquartic_latest_checkpoint.ckpt"
    model = build_model(config).clone(fused_resnet=True)
    process = build_process(config)
    payload = load_checkpoint(ckpt)
    params = payload["state"]["params"]
    print(f"checkpoint: {ckpt} (epoch {payload.get('epoch')})")

    ms2 = np.load(f"{ROOT}/ms2.npy")
    ms1 = np.load(f"{ROOT}/ms1.npy")
    # deconvolution task exactly as trained: recover window i from the
    # 0.5/0.5 mixture of windows (i, j), conditioned on i's MS1 — with
    # the dataset's pairwise minmax normalization (data/dataset.py:355)
    i, j = 0, 1
    lo = min(ms2[i].min(), ms2[j].min())
    hi = max(ms2[i].max(), ms2[j].max())
    norm = lambda a: (a - lo) / max(hi - lo, 1e-12)  # noqa: E731
    target = jnp.asarray(norm(ms2[i]))[None]
    mix = jnp.asarray(0.5 * norm(ms2[i]) + 0.5 * norm(ms2[j]))[None]
    m1lo, m1hi = float(ms1[i].min()), float(ms1[i].max())
    m1 = jnp.asarray((ms1[i] - m1lo) / max(m1hi - m1lo, 1e-12))[None]

    sampler = DDIMSampler(model, process)
    x_t = jax.random.normal(jax.random.PRNGKey(0), target.shape)
    pred, _ = sampler.sample(params, x_t, mix, m1, num_steps=50)
    a = np.asarray(pred, np.float32).ravel()
    b = np.asarray(target, np.float32).ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
    base = float(
        np.asarray(mix).ravel() @ b / (np.linalg.norm(np.asarray(mix).ravel()) * np.linalg.norm(b) + 1e-12)
    )
    print(f"deconvolution cosine(pred, target) = {cos:.4f}  (mixture baseline {base:.4f})")


if __name__ == "__main__":
    {"data": cmd_data, "train": cmd_train, "eval": cmd_eval}[sys.argv[1]]()
