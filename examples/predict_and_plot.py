"""Deconvolve windows with a trained model and render the panel plots.

Script-form of /root/reference/nbs/dquartic_prediction.ipynb: load a
checkpoint (native msgpack or converted PyTorch), build mixtures from a
dataset pair, run the 50-step DDIM reverse pass, save peakmap PNGs and
reconstruction metrics.

Usage:
  python examples/predict_and_plot.py CONFIG.json CHECKPOINT.ckpt OUT_DIR \
      [--num-steps 50] [--num-windows 2]
"""

import argparse
import json
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("checkpoint")
    ap.add_argument("out_dir")
    ap.add_argument("--num-steps", type=int, default=50)
    ap.add_argument("--num-windows", type=int, default=2)
    ap.add_argument("--use-ema", action="store_true", default=True)
    args = ap.parse_args()

    from dquartic_tpu.data import DIAMSDataset
    from dquartic_tpu.infer import DDIMSampler
    from dquartic_tpu.train.checkpoint import load_checkpoint
    from dquartic_tpu.utils.builder import build_model, build_process
    from dquartic_tpu.utils.config import load_train_config
    from dquartic_tpu.utils.viz import plot_single_prediction

    config = load_train_config(args.config)
    model = build_model(config)
    process = build_process(config)
    ckpt = load_checkpoint(args.checkpoint)
    state = ckpt["state"]
    params = state.get("ema_params") or state["params"]

    d = config["data"]
    ds = DIAMSDataset(
        parquet_directory=d["parquet_directory"],
        ms2_file=d["ms2_data_path"],
        ms1_file=d["ms1_data_path"],
        normalize=d["normalize"],
    )
    sampler = DDIMSampler(model, process)

    import jax
    import jax.numpy as jnp

    os.makedirs(args.out_dir, exist_ok=True)
    metrics = []
    for i in range(args.num_windows):
        ms2_1, ms1_1, ms2_2, _ = ds.sample_pair()
        mixture = 0.5 * ms2_1 + 0.5 * ms2_2
        noise = jax.random.normal(jax.random.PRNGKey(i), (1, *ms2_1.shape))
        pred, pred_noise = sampler.sample(
            params, noise, jnp.asarray(mixture)[None], jnp.asarray(ms1_1)[None],
            num_steps=args.num_steps,
        )
        pred_np = np.asarray(pred[0])
        cos = float(
            np.dot(pred_np.ravel(), ms2_1.ravel())
            / (np.linalg.norm(pred_np) * np.linalg.norm(ms2_1) + 1e-12)
        )
        metrics.append({"window": i, "cosine_vs_target": cos})
        plot_single_prediction(
            ms2_1, ms2_2, mixture, ms1_1, pred_np, np.asarray(pred_noise[0]),
            out_dir=args.out_dir, prefix=f"w{i}_",
        )
        print(f"window {i}: reconstruction cosine vs target = {cos:.4f}")

    with open(os.path.join(args.out_dir, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=2)


if __name__ == "__main__":
    main()
