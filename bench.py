"""Benchmark harness. Prints ONE JSON line to stdout:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline (default mode ``flagship``): the canonical 1.2B-param UNet1d —
the model the reference's production configs train — measured on the two
BASELINE.md headline metrics: 50-step DDIM deconvolution ms/window and
train-step ms/sample on one (34, 40000) MS2 window. The reference
publishes no number for either (BASELINE.md `published` is {}), so
``vs_baseline`` is the speedup over this repo's round-2 driver-era
figures (1112 ms/window, 122.6 ms/step at bs1 — BENCH_NOTES.md), i.e.
round-over-round progress; higher is better. The train figure rides
along in the ``extra`` field.

Secondary modes:
  * ``transformer_train``    — CustomTransformer (hidden 1024, 8 heads,
    8 layers) train-step latency, comparable to the reference's only
    wall-clock anchor: "driven-shadow-22", 98,087 steps in 1h40m on one
    SLURM GPU = ~61.2 ms/step (BASELINE.md); vs_baseline is the speedup.
  * ``unet_sample``          — canonical 1.2B-param UNet1d, 50-step DDIM
    reverse pass, ms per (34, 40000) MS2 window (BASELINE.json headline;
    the reference publishes no number, vs_baseline=1.0 by definition).
  * ``unet_sample_xla``      — same, linear attention forced to XLA.
  * ``unet_sample_batched``  — same at batch 8 (best per-window amortization).
  * ``unet_train``           — canonical UNet1d train step (bf16 + remat
    + factored second moment + Pallas linattn fwd/bwd).
  * ``unet_train_batched``   — same at batch 8 (best ms/sample).

Select with BENCH_MODE env var; BENCH_STEPS overrides timing iterations.
Measured results + chip calibration live in BENCH_NOTES.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REFERENCE_TRAIN_MS = 6000_000.0 / 98_087.0  # 1h40m / 98,087 steps = 61.17 ms


def _log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _env_flag(name: str, default: bool = False) -> bool:
    """Explicit truthy/falsy values win; unset returns ``default``."""
    raw = os.environ.get(name, "").strip().lower()
    if not raw:
        return default
    return raw in {"1", "true", "yes", "on"}


def _make_batch(b, rt, mz, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "ms2_1": rng.uniform(0, 1, (b, rt, mz)).astype(np.float32),
        "ms1_1": rng.uniform(0, 1, (b, rt)).astype(np.float32),
        "ms2_2": rng.uniform(0, 1, (b, rt, mz)).astype(np.float32),
        "ms1_2": rng.uniform(0, 1, (b, rt)).astype(np.float32),
    }


def _sync(out):
    """Force completion with a 4-byte readback.

    ``block_until_ready`` alone is not trusted on experimental PJRT
    platforms, and a full ``device_get`` would drag the whole tensor
    through the (slow) relay link — so reduce on device and fetch one
    scalar, which depends on every element."""
    import jax
    import jax.numpy as jnp

    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf))


def _time_fn(fn, warmup=3, iters=None):
    """Time ``fn(i)`` over iters calls; only the final result is synced so
    steps pipeline like a real training loop."""
    iters = iters or int(os.environ.get("BENCH_STEPS", "20"))
    for i in range(warmup):
        out = fn(i)
    _sync(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(i)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1000.0  # ms


def bench_transformer_train():
    import jax
    import jax.numpy as jnp

    from dquartic_tpu.core import DDIMProcess, make_schedule
    from dquartic_tpu.models import CustomTransformer
    from dquartic_tpu.train import Trainer

    model = CustomTransformer(
        input_dim=40000, hidden_dim=1024, num_heads=8, num_layers=8,
        dtype=jnp.bfloat16,
    )
    process = DDIMProcess(schedule=make_schedule(1000, "cosine", "eps"))
    trainer = Trainer(model, process, seed=0)
    batch = _make_batch(1, 34, 40000)
    state = trainer.init_state(batch)
    _log(f"transformer params: {trainer.num_parameters(state)/1e6:.1f}M")
    dev_batch = jax.tree_util.tree_map(jnp.asarray, batch)
    lr = jnp.float32(1e-5)

    holder = {"state": state}
    keys = jax.random.split(jax.random.PRNGKey(0), 4096)

    def step(i):
        holder["state"], metrics = trainer.train_step(
            holder["state"], dev_batch, lr, keys[i]
        )
        return metrics["loss"]

    ms = _time_fn(step)
    return {
        "metric": "train step ms (CustomTransformer h1024/8h/8L, 34x40000 window, bs1)",
        "value": round(ms, 3),
        "unit": "ms/step",
        "vs_baseline": round(REFERENCE_TRAIN_MS / ms, 2),
    }


def _canonical_unet(dtype, linear_attn_impl="auto", mz=40000):
    from dquartic_tpu.models import UNet1d

    return UNet1d(
        dim=4,
        channels=1,
        dim_mults=(1, 2, 2, 3, 3, 4, 4),
        conditional=True,
        init_cond_channels=1,
        attn_cond_channels=1,
        tfer_dim_mult=620,
        downsample_dim=mz,
        simple=True,
        dtype=dtype,
        linear_attn_impl=linear_attn_impl,
    )


def bench_unet_sample(
    num_steps=50, batch=1, linear_attn_impl="auto", tag="", quantize_mid=False,
    fused_resnet=False, rt=34, mz=40000,
):
    import jax
    import jax.numpy as jnp

    from dquartic_tpu.core import DDIMProcess, make_schedule
    from dquartic_tpu.infer import DDIMSampler

    model = _canonical_unet(jnp.bfloat16, linear_attn_impl, mz=mz)
    process = DDIMProcess(schedule=make_schedule(1000, "cosine", "eps"))

    b = batch
    x = jnp.zeros((b, rt, mz))
    t0 = jnp.zeros((b,), jnp.int32)
    ac = jnp.zeros((b, rt))
    # jitted init: eager init of 1.2B params is >10 min of per-op
    # dispatches on the tunneled platform; compiled it is seconds.
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, t0, x, ac)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
    _log(f"unet params: {n_params/1e6:.1f}M")
    if quantize_mid:
        # int8 mid-block weight streaming (ops/int8_matmul.py): the model's
        # dominant HBM stream at half width; drift vs bf16 is quantified in
        # tests/test_int8_matmul.py.
        from dquartic_tpu.ops.quantization import quantize_mid_block_params

        model = model.clone(quantize_mid=True)
        params = jax.jit(quantize_mid_block_params)(params)
        tag = (tag + ", " if tag else "") + "int8 mid convs"
    if fused_resnet:
        # transposed-resident conv stack (ops/fused_resnet.py): kills the
        # rows-minor <-> mz-minor relayout copies at every kernel boundary.
        model = model.clone(fused_resnet=True)
        tag = (tag + ", " if tag else "") + "fused resnet"

    sampler = DDIMSampler(model, process)
    data = _make_batch(b, rt, mz)
    ms2 = jnp.asarray(data["ms2_1"])
    ms1 = jnp.asarray(data["ms1_1"])
    x_t = jax.random.normal(jax.random.PRNGKey(1), ms2.shape)

    def run(i):
        out, _ = sampler.sample(params, x_t, ms2, ms1, num_steps=num_steps)
        return out

    ms = _time_fn(run, warmup=1, iters=int(os.environ.get("BENCH_STEPS", "5")))
    per_window = ms / batch
    desc = f"batch {batch}" + (f", {tag}" if tag else "")
    return {
        "metric": f"{num_steps}-step DDIM sampling ms per MS2 window (UNet1d canonical, {rt}x{mz}, bf16, {desc})",
        "value": round(per_window, 1),
        "unit": "ms/window",
        "vs_baseline": 1.0,  # no published reference number exists (BASELINE.md)
    }


def bench_unet_forward(
    batch=1, quantize_mid=False, fused_resnet=False, rt=34, mz=40000
):
    """Single denoiser forward (the 50-step sampler's unit cost)."""
    import jax
    import jax.numpy as jnp

    model = _canonical_unet(jnp.bfloat16, mz=mz)
    if fused_resnet:
        model = model.clone(fused_resnet=True)
    data = _make_batch(batch, rt, mz)
    x = jnp.asarray(data["ms2_1"])
    t0 = jnp.zeros((batch,), jnp.int32)
    ms1 = jnp.asarray(data["ms1_1"])
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, t0, x, ms1)
    if quantize_mid:
        from dquartic_tpu.ops.quantization import quantize_mid_block_params

        model = model.clone(quantize_mid=True)
        params = jax.jit(quantize_mid_block_params)(params)
    fwd = jax.jit(model.apply)
    ms = _time_fn(
        lambda i: fwd(params, x, t0, x, ms1),
        warmup=2,
        iters=int(os.environ.get("BENCH_STEPS", "10")),
    )
    cfg = ("int8+" if quantize_mid else "") + ("fused" if fused_resnet else "bf16")
    return {
        "metric": f"UNet1d forward ms ({rt}x{mz}, bs{batch}, {cfg})",
        "value": round(ms, 2),
        "unit": "ms",
        "vs_baseline": 1.0,
    }


def bench_unet_train(batch_size=1, fused_resnet=False, rt=34, mz=40000):
    import jax
    import jax.numpy as jnp
    import optax

    from dquartic_tpu.core import DDIMProcess, make_schedule
    from dquartic_tpu.train import Trainer

    # Single-chip training of the 1.2B-param canonical model needs the
    # TPU-idiomatic memory recipe: rematerialized blocks (activations) and
    # a factored second moment (optimizer state) — f32 AdamW + full
    # activations needs 22.5 GB and OOMs a 16 GB chip. Linear attention
    # runs the transposed Pallas kernel in BOTH directions (the streamed
    # custom backward saves only x + weights, so the qkv expansions never
    # exist in HBM and batch 8 fits where the XLA path OOMed at batch 2).
    # fused_resnet: the down/up ResnetBlocks run as single Pallas launches
    # in the transposed (C, N) layout, forward AND backward (custom_vjp
    # recomputes from (x, params) — remat-equivalent); remat_blocks still
    # covers the mid blocks.
    model = _canonical_unet(jnp.bfloat16, mz=mz).clone(
        remat_blocks=True, fused_resnet=fused_resnet
    )
    process = DDIMProcess(schedule=make_schedule(1000, "cosine", "eps"))
    tx = optax.chain(
        optax.clip_by_global_norm(10.0),
        optax.scale_by_factored_rms(),
    )
    trainer = Trainer(model, process, optimizer=tx, ema_decay=None, seed=0)
    batch = _make_batch(batch_size, rt, mz)
    state = trainer.init_state(batch)
    _log(f"unet params: {trainer.num_parameters(state)/1e6:.1f}M")
    dev_batch = jax.tree_util.tree_map(jnp.asarray, batch)
    lr = jnp.float32(1e-5)
    holder = {"state": state}
    keys = jax.random.split(jax.random.PRNGKey(0), 4096)

    def step(i):
        holder["state"], metrics = trainer.train_step(
            holder["state"], dev_batch, lr, keys[i]
        )
        return metrics["loss"]

    ms = _time_fn(step, warmup=2, iters=int(os.environ.get("BENCH_STEPS", "10")))
    recipe = "bf16+remat+factored-rms+pallas-linattn"
    if fused_resnet:
        recipe += "+fused-resnet"
    return {
        "metric": (
            f"train step ms per sample (UNet1d canonical arch, "
            f"{rt}x{mz} window, bs{batch_size}, {recipe})"
        ),
        "value": round(ms / batch_size, 1),
        "unit": "ms/sample",
        "vs_baseline": 1.0,
    }


ROUND2_SAMPLE_MS = 1112.0  # 50-step ms/window, bs1 (BENCH_NOTES.md round 2)
ROUND2_TRAIN_MS = 122.6  # train ms/step, bs1 (BENCH_NOTES.md round 2)


def bench_flagship():
    """Default driver metric: canonical UNet1d sampling in the shipping
    inference config — int8 mid-block weight streaming + the fused
    transposed-resident ResnetBlock path (both test-pinned for drift /
    parity vs the bf16 reference path) — plus the shipping training
    config. vs_baseline = round-over-round speedup vs the round-2 figure
    (which was bf16, unfused).

    BENCH_FULL (default ON; =0 disables) adds the bf16 bs1 and shipping
    bs8 sampling points plus the production-shape (340, 30016) forward /
    sample / train legs, so the driver artifact carries the whole matrix
    measured in one session. Each 1.2B sub-benchmark costs ~3 min of cold
    compile on the tunneled platform; the persistent compile cache makes
    repeat runs measurement-only."""
    sample_ship = bench_unet_sample(batch=1, quantize_mid=True, fused_resnet=True)
    # Training uses the shipping training config too: the fused-resnet
    # custom_vjp path (remat-equivalent by construction, grad-parity
    # test-pinned) — same kernels the inference config ships.
    train = bench_unet_train(batch_size=1, fused_resnet=True)
    extra = {
        "config": (
            "UNet1d canonical 1.2B, (34, 40000), 50-step DDIM, bs1, "
            "int8 mid-conv weight streaming + fused transposed-resident "
            "ResnetBlock + Pallas linattn"
        ),
        # vs_baseline lineage: the reference publishes NO sampling
        # wall-clock (BASELINE.md published == {}), so the baseline is
        # this repo's own round-2 driver-captured figure. The absolute
        # reference anchor (61.2 ms/step CustomTransformer training)
        # lives in BENCH_MODE=transformer_train.
        "baseline_source": (
            "round-2 BENCH_r02.json (same metric, bf16 unfused): "
            f"{ROUND2_SAMPLE_MS} ms/window; reference publishes no "
            "sampling number (BASELINE.md)"
        ),
        "train_ms_per_sample_bs1": train["value"],
        "train_vs_round2": round(ROUND2_TRAIN_MS / train["value"], 2),
        "round2_sample_ms": ROUND2_SAMPLE_MS,
        "round2_train_ms": ROUND2_TRAIN_MS,
    }
    # Default ON (BENCH_FULL=0 disables): the driver artifact should carry
    # every leg measured in ONE session (VERDICT r4 weak #5). With a warm
    # persistent compile cache the extra legs cost <2 min of measurement.
    if _env_flag("BENCH_FULL", default=True):
        sample_bf16 = bench_unet_sample(batch=1)
        sample_bs8 = bench_unet_sample(batch=8, quantize_mid=True, fused_resnet=True)
        extra.update(
            sample_ms_bf16_bs1=sample_bf16["value"],
            sample_bf16_vs_round2=round(ROUND2_SAMPLE_MS / sample_bf16["value"], 2),
            sample_ms_per_window_bs8=sample_bs8["value"],
        )
        # Production shape (340, 30016) — the reference data-gen window
        # (run_data_gen.sh:8-14, padded to the 7-level stride) — measured
        # in the same session as the canonical-shape legs (VERDICT r4
        # weak #5: no mixed-session README rows). Same shipping configs
        # as scripts/bench_fullres.py.
        prod = dict(rt=340, mz=30016)
        fwd_prod = bench_unet_forward(quantize_mid=True, fused_resnet=True, **prod)
        sample_prod = bench_unet_sample(quantize_mid=True, fused_resnet=True, **prod)
        train_prod = bench_unet_train(fused_resnet=True, **prod)
        extra.update(
            prod_shape="340x30016",
            prod_fwd_ms_int8_fused_bs1=fwd_prod["value"],
            prod_sample_ms_per_window_bs1=sample_prod["value"],
            prod_train_ms_per_sample_bs1=train_prod["value"],
        )
    return {
        "metric": sample_ship["metric"],
        "value": sample_ship["value"],
        "unit": sample_ship["unit"],
        "vs_baseline": round(ROUND2_SAMPLE_MS / sample_ship["value"], 2),
        "extra": extra,
    }


MODES = {
    "flagship": bench_flagship,
    "unet_forward": bench_unet_forward,
    "unet_forward_prod": lambda: bench_unet_forward(
        quantize_mid=True, fused_resnet=True, rt=340, mz=30016
    ),
    "unet_sample_int8": lambda: bench_unet_sample(quantize_mid=True),
    "unet_sample_fused": lambda: bench_unet_sample(quantize_mid=True, fused_resnet=True),
    "unet_sample_fused_batched": lambda: bench_unet_sample(batch=8, quantize_mid=True, fused_resnet=True),
    "unet_sample_int8_batched": lambda: bench_unet_sample(batch=8, quantize_mid=True),
    "transformer_train": bench_transformer_train,
    "unet_sample": bench_unet_sample,
    "unet_sample_xla": lambda: bench_unet_sample(linear_attn_impl="xla", tag="xla linear-attn"),
    # With the transposed Pallas linear attention (round 2) the 3*hidden
    # qkv expansion never reaches HBM, so batch 8 fits the 16 GB chip
    # (round 1's XLA path OOMed at batch 4) and gives the best per-window
    # amortization: 973 ms/window vs 985 at batch 2 (BENCH_NOTES.md).
    "unet_sample_batched": lambda: bench_unet_sample(batch=8),
    "unet_train": bench_unet_train,
    # batch 8: best measured per-sample train step with the kernel
    # backward (65.8 ms/sample vs 122.6 at bs1 and 215 in round 1).
    "unet_train_batched": lambda: bench_unet_train(batch_size=8),
    # trainable fused-resnet path: one Pallas launch per down/up block in
    # both directions (ops/fused_resnet.py custom_vjp)
    "unet_train_fused": lambda: bench_unet_train(batch_size=1, fused_resnet=True),
    "unet_train_fused_batched": lambda: bench_unet_train(batch_size=8, fused_resnet=True),
}


def main():
    mode = os.environ.get("BENCH_MODE", "flagship")
    import jax

    # persistent compile cache: repeat bench runs skip multi-minute compiles
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_CACHE_DIR", "/tmp/dquartic_jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    _log(f"backend={jax.default_backend()} devices={jax.devices()}")
    result = MODES[mode]()
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
