"""Int8 post-training quantization of a trained checkpoint.

Script-form of /root/reference/nbs/quantization_experiment.ipynb (which
shrank a 14 GB torch checkpoint to 10 GB with partial eager-mode int8).
Per-channel symmetric int8 on every large weight typically shrinks this
framework's checkpoints ~3.5-4x, and reports the output drift on a real
window.

Usage:
  python examples/quantize_checkpoint.py CONFIG.json IN.ckpt OUT.ckpt
"""

import argparse
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("input_ckpt")
    ap.add_argument("output_ckpt")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dquartic_tpu.ops.quantization import (
        dequantize_params,
        quantize_params,
        quantized_nbytes,
    )
    from dquartic_tpu.train.checkpoint import load_checkpoint, save_checkpoint
    from dquartic_tpu.utils.builder import build_model
    from dquartic_tpu.utils.config import load_train_config

    config = load_train_config(args.config)
    ckpt = load_checkpoint(args.input_ckpt)
    state = ckpt["state"]
    params = state.get("ema_params") or state["params"]

    q = quantize_params(params)
    raw_mb = quantized_nbytes(params) / 1e6
    q_mb = quantized_nbytes(q) / 1e6
    print(f"params: {raw_mb:.1f} MB -> {q_mb:.1f} MB ({raw_mb / q_mb:.2f}x)")

    save_checkpoint(
        args.output_ckpt,
        {"epoch": ckpt["epoch"], "best_loss": ckpt["best_loss"], "qparams": q},
    )
    print(
        f"checkpoint file: {os.path.getsize(args.input_ckpt) / 1e6:.1f} MB -> "
        f"{os.path.getsize(args.output_ckpt) / 1e6:.1f} MB"
    )

    # drift check on a synthetic window
    model = build_model(config)
    deq = dequantize_params(q)
    rng = np.random.default_rng(0)
    mz = config["model"]["UNet1d"]["downsample_dim"]
    x = jnp.asarray(rng.uniform(0, 1, (1, 8, mz)).astype(np.float32))
    t = jnp.zeros((1,), jnp.int32)
    ac = jnp.asarray(rng.uniform(0, 1, (1, 8)).astype(np.float32))
    out_ref = np.asarray(model.apply(params, x, t, x, ac))
    out_q = np.asarray(model.apply(deq, x, t, x, ac))
    rel = np.abs(out_q - out_ref).max() / (np.abs(out_ref).max() + 1e-9)
    print(f"max relative output drift: {rel * 100:.3f}%")


if __name__ == "__main__":
    main()
