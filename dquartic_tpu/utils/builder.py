"""Construct framework objects from a training config dict.

Shared by the CLI, the benchmark harness and the compile-check entry
points. Mirrors the wiring in the reference CLI
(/root/reference/dquartic/cli.py:85-139).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp

from ..core import DDIMProcess, make_schedule
from ..data import DIAMSDataset, PairBatches, prefetch_iterator
from ..models import CustomTransformer, UNet1d
from ..parallel import make_mesh
from ..train import Trainer, make_optimizer
from .logging import make_logger

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16}


def build_model(config: Dict[str, Any]):
    m = config["model"]
    dtype = _DTYPES[config["tpu"]["compute_dtype"]]
    attn_impl = config["tpu"]["attn_impl"]
    if m["use_model"] == "UNet1d":
        u = dict(m["UNet1d"])
        if "dim_mults" in u:
            u["dim_mults"] = tuple(u["dim_mults"])
        # Optional fields beyond the reference config subset (dropout,
        # attn_heads, remat_blocks, pos_output_only, ...) pass through.
        valid = set(UNet1d.__dataclass_fields__)
        unknown = set(u) - valid
        if unknown:
            raise ValueError(f"Unknown UNet1d config keys: {sorted(unknown)}")
        u.setdefault(
            "linear_attn_impl", config["tpu"].get("linear_attn_impl", "auto")
        )
        return UNet1d(**u, dtype=dtype, attn_impl=attn_impl)
    if m["use_model"] == "CustomTransformer":
        c = dict(m["CustomTransformer"])
        valid = set(CustomTransformer.__dataclass_fields__)
        unknown = set(c) - valid
        if unknown:
            raise ValueError(f"Unknown CustomTransformer config keys: {sorted(unknown)}")
        return CustomTransformer(**c, dtype=dtype)
    raise ValueError(f"Invalid model class: {m['use_model']}")


def build_process(config: Dict[str, Any]) -> DDIMProcess:
    m = config["model"]
    schedule = make_schedule(
        num_timesteps=m["num_timesteps"],
        schedule_type=m["beta_schedule_type"],
        pred_type=m["pred_type"],
        # tpu.loss_weighting: "reference" (default, model.py:204-213),
        # "uniform", or "min_snr:<gamma>" (see core/schedules.py).
        weighting=config["tpu"].get("loss_weighting", "reference"),
    )
    return DDIMProcess(
        schedule=schedule,
        auto_normalize=m["auto_normalize"],
        ms1_loss_weight=m["ms1_loss_weight"],
        # reference quirk flag: alpha_bars[t-1] neighbor stepping
        # (core/diffusion.py); set tpu.ddim_proper_stepping for the
        # textbook sub-sampled DDIM update.
        parity_neighbor_stepping=not config["tpu"].get("ddim_proper_stepping", False),
        # standard clip_denoised, on by default (the reference's unclipped
        # reverse pass is numerically explosive — core/diffusion.py);
        # tpu.clip_denoised=false restores exact reference behavior. The
        # [-1, 1] clamp band is only meaningful under auto_normalize, so
        # with auto_normalize=false (unnormalized data) the default flips
        # off rather than silently truncating valid values.
        clip_denoised=config["tpu"].get("clip_denoised", bool(m["auto_normalize"])),
    )


def build_mesh(config: Dict[str, Any], batch_size: Optional[int] = None):
    """Mesh from config; a None dp defaults to the largest data-parallel
    degree that divides the batch size (idle devices are left out rather
    than producing an invalid batch sharding)."""
    mesh_cfg = config["tpu"]["mesh"]
    dp = mesh_cfg.get("dp")
    sp = mesh_cfg.get("sp", 1) or 1
    tp = mesh_cfg.get("tp", 1) or 1
    import jax

    n = len(jax.devices())
    if dp is None:
        avail = max(1, n // (sp * tp))
        if batch_size is None:
            dp = avail
        else:
            dp = 1
            for d in range(avail, 0, -1):
                if batch_size % d == 0:
                    dp = d
                    break
    if dp * sp * tp == 1:
        return None  # single device: plain jit, no mesh overhead
    if dp * sp * tp > n:
        raise ValueError(f"mesh dp*sp*tp={dp * sp * tp} exceeds {n} devices")
    return make_mesh(dp=dp, sp=sp, tp=tp, devices=jax.devices()[: dp * sp * tp])


def build_dataset(config: Dict[str, Any], seed: int = 0, mesh=None):
    """Dataset pipeline; pass the trainer's ``mesh`` so prefetched batches
    commit directly into the dp sharding (otherwise the trainer's
    ``shard_batch`` would have to reshard every batch)."""
    d = config["data"]
    dataset = DIAMSDataset(
        parquet_directory=d["parquet_directory"],
        ms2_file=d["ms2_data_path"],
        ms1_file=d["ms1_data_path"],
        normalize=d["normalize"],
        seed=seed,
    )
    batches = PairBatches(dataset, batch_size=config["model"]["batch_size"])
    return prefetch_iterator(batches, size=config["tpu"]["prefetch"], mesh=mesh)


def apply_mesh_model_flags(model, mesh):
    """Clone the mesh-dependent UNet1d flags onto ``model`` (shared by
    the trainer builder and the predict CLI).

    * sp > 1: the m/z axis shards over the mesh — activation sharding
      constraints + the XLA impl own it (the Pallas kernels have no sp
      partitioning rule).
    * dp > 1, sp == 1: keep the Pallas fast path — ``kernel_dp_axis``
      makes every kernel call site run its shard_map row-sharded variant
      instead of letting jit-SPMD all-gather around the custom calls
      (numerically identical to single-device; see the dp section in
      ops/linear_attention.py).
    """
    mesh_shape = dict(getattr(mesh, "shape", {})) if mesh is not None else {}
    if (
        mesh_shape.get("sp", 1) > 1
        and hasattr(model, "activation_sharding")
        and model.activation_sharding is None
    ):
        model = model.clone(activation_sharding=("dp", "sp"))
    if (
        mesh_shape.get("dp", 1) > 1
        and mesh_shape.get("sp", 1) == 1
        and hasattr(model, "kernel_dp_axis")
        and model.kernel_dp_axis is None
    ):
        model = model.clone(kernel_dp_axis="dp")
    return model


def build_trainer(
    config: Dict[str, Any], mesh=None, logger=None, seed: int = 0
) -> Trainer:
    # int8 mid-block weights are inference-only (frozen, no gradient):
    # reject them up front instead of failing mid-trace (see
    # ops.int8_matmul._inference_only for the in-graph guard).
    if config["tpu"].get("quantize_mid") or (
        config["model"]["use_model"] == "UNet1d"
        and config["model"]["UNet1d"].get("quantize_mid")
    ):
        raise ValueError(
            "tpu.quantize_mid / UNet1d.quantize_mid is inference-only and "
            "cannot appear in a training config: int8 weights are frozen "
            "post-training artifacts with no gradient. Train with bf16 "
            "master weights, then quantize the checkpoint for `predict` "
            "(`cli predict --quantize-mid` or "
            "ops.quantization.quantize_mid_block_params)."
        )
    model = build_model(config)
    process = build_process(config)
    if mesh is None:
        mesh = build_mesh(config, batch_size=config["model"]["batch_size"])
    model = apply_mesh_model_flags(model, mesh)
    # tpu.fused_resnet: transposed-resident down/up path (trainable — the
    # fused kernel has a recompute-based custom vjp). Incompatible with
    # activation (sp) sharding; the UNet1d constructor enforces dropout==0.
    if (
        config["tpu"].get("fused_resnet")
        and hasattr(model, "fused_resnet")
        and not model.fused_resnet
        and getattr(model, "activation_sharding", None) is None
    ):
        model = model.clone(fused_resnet=True)
    if logger is None:
        import os

        w = config.get("wandb", {})
        log_dir = os.path.dirname(config["model"].get("checkpoint_path", "")) or "."
        logger = make_logger(
            use_wandb=bool(w.get("use_wandb")),
            log_dir=log_dir,
            wandb_kwargs=dict(
                project=w.get("wandb_project"),
                name=w.get("wandb_name"),
                id=w.get("wandb_id"),
                resume=w.get("wandb_resume"),
                mode=w.get("wandb_mode", "offline"),
                config={
                    "architecture": w.get("wandb_architecture"),
                    "dataset": w.get("wandb_dataset"),
                    **config["model"],
                },
            ),
            run_name=w.get("wandb_name"),
        )
    return Trainer(
        model,
        process,
        # tpu.optimizer: "adamw" (reference parity, default) or "factored"
        # (Adafactor-style second moment — required to fit the canonical
        # 1.2B model's optimizer state on a single 16 GB chip).
        optimizer=make_optimizer(kind=config["tpu"].get("optimizer", "adamw")),
        ema_decay=config["tpu"]["ema_decay"],
        mesh=mesh,
        logger=logger,
        seed=seed,
        checkpoint_backend=config["tpu"]["checkpoint_backend"],
    )
