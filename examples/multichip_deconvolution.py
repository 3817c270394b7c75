"""Multi-chip batch deconvolution: one DIA window per chip.

The production data-gen workload (reference run_data_gen.sh:8-14) is
thousands of independent (rt, m/z) windows pushed through the 50-step
DDIM reverse pass — embarrassingly parallel over windows. This script
shows the dp recipe: a dp-only `jax.sharding.Mesh`, the shipping
inference config (int8 mid convs + fused transposed ResnetBlocks +
pallas_t linear attention), and `UNet1d.kernel_dp_axis` so every Pallas
kernel runs per-shard at single-chip speed instead of being all-gathered
by jit-SPMD (see BENCH_NOTES.md round-3 dp section).

Off-TPU it runs on a virtual CPU mesh so the flow is testable anywhere:

  XLA_FLAGS=--xla_force_host_platform_device_count=4 JAX_PLATFORMS=cpu \
    python examples/multichip_deconvolution.py config.json ckpt.ckpt out.parquet

On a TPU pod slice, drop the env vars — every local chip deconvolves its
own window each batch. The same flow is reachable without code through
the CLI: set ``tpu.mesh = {"dp": N}`` in the config and run
``dquartic-tpu predict``.
"""

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("checkpoint")
    ap.add_argument("output", help=".parquet or .npz")
    ap.add_argument("--num-steps", type=int, default=50)
    ap.add_argument("--num-batches", type=int, default=None)
    args = ap.parse_args()

    import jax

    from dquartic_tpu.infer import DDIMSampler
    from dquartic_tpu.infer.sampler import save_predictions_parquet
    from dquartic_tpu.ops.quantization import quantize_mid_block_params
    from dquartic_tpu.train.checkpoint import load_checkpoint
    from dquartic_tpu.utils.builder import (
        apply_mesh_model_flags,
        build_dataset,
        build_mesh,
        build_model,
        build_process,
    )
    from dquartic_tpu.utils.config import load_train_config

    config = load_train_config(args.config)
    n = len(jax.devices())
    # one window per chip: dp over every device, batch matching it
    config["tpu"]["mesh"] = {"dp": n, "sp": 1, "tp": 1}
    config["model"]["batch_size"] = n

    mesh = build_mesh(config, batch_size=n)
    model = build_model(config)
    process = build_process(config)

    ckpt = load_checkpoint(args.checkpoint)
    state = ckpt["state"]
    params = state.get("ema_params") or state["params"]

    # shipping inference config: int8 mid-block weight streaming + fused
    # transposed-resident ResnetBlocks (both test-pinned vs the bf16 path)
    model = model.clone(quantize_mid=True, fused_resnet=True)
    params = quantize_mid_block_params(params)
    model = apply_mesh_model_flags(model, mesh)  # kernel_dp_axis="dp"

    dataset = build_dataset(config, mesh=mesh)
    sampler = DDIMSampler(model, process, mesh=mesh)

    records = []
    for i, batch in enumerate(iter(dataset)):
        if args.num_batches is not None and i >= args.num_batches:
            break
        records.extend(sampler.predict(params, [batch], num_steps=args.num_steps))
        print(f"batch {i}: {records[-1]['pred'].shape} deconvolved on {n} chips")

    if args.output.endswith(".parquet"):
        save_predictions_parquet(records, args.output)
    else:
        import numpy as np

        np.savez_compressed(
            args.output,
            **{f"{k}_{i}": v for i, r in enumerate(records) for k, v in r.items()},
        )
    print(f"saved {len(records)} batches to {args.output}")


if __name__ == "__main__":
    main()
