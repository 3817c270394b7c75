"""Reconstruction-parity harness for migrated reference checkpoints.

The migration acceptance test from BASELINE.json: convert a trained
reference PyTorch checkpoint, deconvolve dataset windows with the
compiled 50-step sampler, and report reconstruction cosine similarity of
each prediction against (a) its clean target and (b) optionally a
reference-produced prediction NPZ for direct numerical parity.

Usage:
  python scripts/parity_check.py CONFIG.json TORCH_CKPT [--windows 5]
      [--num-steps 50] [--reference-npz ref_preds.npz]
"""

import argparse
import json

import numpy as np


def cosine(a: np.ndarray, b: np.ndarray) -> float:
    a, b = a.ravel(), b.ravel()
    return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("torch_ckpt")
    ap.add_argument("--windows", type=int, default=5)
    ap.add_argument("--num-steps", type=int, default=50)
    ap.add_argument("--reference-npz", default=None,
                    help="NPZ of reference predictions keyed pred_<i> for direct parity")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dquartic_tpu.compat.torch_ckpt import (
        convert_custom_transformer_state_dict,
        convert_unet1d_state_dict,
        load_torch_state_dict,
    )
    from dquartic_tpu.data import DIAMSDataset
    from dquartic_tpu.infer import DDIMSampler
    from dquartic_tpu.utils.builder import build_model, build_process
    from dquartic_tpu.utils.config import load_train_config

    config = load_train_config(args.config)
    loaded = load_torch_state_dict(args.torch_ckpt)
    m = config["model"]
    if m["use_model"] == "UNet1d":
        params = convert_unet1d_state_dict(
            loaded["state_dict"], dim_mults=m["UNet1d"]["dim_mults"],
            conditional=m["UNet1d"]["conditional"], simple=m["UNet1d"]["simple"],
        )
    else:
        params = convert_custom_transformer_state_dict(
            loaded["state_dict"],
            num_layers=m["CustomTransformer"]["num_layers"],
            hidden_dim=m["CustomTransformer"]["hidden_dim"],
        )
    print(f"converted checkpoint from epoch {loaded['epoch']} (loss {loaded['best_loss']:.4f})")

    d = config["data"]
    ds = DIAMSDataset(
        parquet_directory=d["parquet_directory"],
        ms2_file=d["ms2_data_path"],
        ms1_file=d["ms1_data_path"],
        normalize=d["normalize"],
        seed=args.seed,
    )
    model = build_model(config)
    process = build_process(config)
    sampler = DDIMSampler(model, process)

    ref = np.load(args.reference_npz) if args.reference_npz else None
    results = []
    for i in range(args.windows):
        ms2_1, ms1_1, ms2_2, _ = ds.sample_pair()
        mixture = 0.5 * ms2_1 + 0.5 * ms2_2
        noise = jax.random.normal(jax.random.PRNGKey(args.seed + i), (1, *ms2_1.shape))
        pred, _ = sampler.sample(
            params, noise, jnp.asarray(mixture)[None], jnp.asarray(ms1_1)[None],
            num_steps=args.num_steps,
        )
        pred_np = np.asarray(pred[0])
        row = {"window": i, "cosine_vs_target": cosine(pred_np, ms2_1)}
        if ref is not None and f"pred_{i}" in ref:
            row["cosine_vs_reference_pred"] = cosine(pred_np, np.asarray(ref[f"pred_{i}"]))
        results.append(row)
        print(json.dumps(row))

    mean_t = float(np.mean([r["cosine_vs_target"] for r in results]))
    print(f"\nmean cosine vs target over {len(results)} windows: {mean_t:.4f}")
    if ref is not None:
        pr = [r.get("cosine_vs_reference_pred") for r in results if "cosine_vs_reference_pred" in r]
        if pr:
            print(f"mean cosine vs reference predictions: {float(np.mean(pr)):.4f}")


if __name__ == "__main__":
    main()
