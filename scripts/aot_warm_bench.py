"""AOT-precompile every program `bench.py` (flagship, BENCH_FULL) runs,
into the persistent compile cache — WITHOUT executing anything on the
device, so it can safely overlap a training run on the chip (compiles go
through the remote-compile helper; `.lower(...).compile()` never touches
device memory). A later `python bench.py` then starts measuring within
seconds instead of ~40-60 min of cold compiles.

Programs mirrored 1:1 from bench.py (same constructors, shapes, dtypes,
donation — identical jaxprs => identical cache keys):
  * jax.jit(model.init) for the canonical (34, 40000) and production
    (340, 30016) UNet1d in bf16, bs1 + bs8
  * jax.jit(quantize_mid_block_params)
  * DDIMSampler 50-step programs: shipping int8+fused bs1/bs8, bf16 bs1,
    production int8+fused bs1
  * Trainer.train_step (donated, remat + factored + fused_resnet) bs1
    canonical + production, incl. the jitted init_state program

Run: PYTHONPATH=/root/repo:/root/.axon_site JAX_CACHE_DIR=/tmp/dquartic_jax_cache \
  python scripts/aot_warm_bench.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_CACHE_DIR", "/tmp/dquartic_jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import _canonical_unet
    from dquartic_tpu.core import DDIMProcess, make_schedule
    from dquartic_tpu.infer import DDIMSampler
    from dquartic_tpu.ops.quantization import quantize_mid_block_params
    from dquartic_tpu.train import Trainer

    SDS = jax.ShapeDtypeStruct
    process = DDIMProcess(schedule=make_schedule(1000, "cosine", "eps"))
    key_sds = SDS((2,), jnp.uint32)

    def warm(tag, lowerable, *args):
        t0 = time.perf_counter()
        jax.jit(lowerable).lower(*args).compile()
        print(f"warm {tag}: {time.perf_counter()-t0:.0f}s", flush=True)

    def sample_shapes(b, rt, mz):
        return (
            SDS((b, rt, mz), jnp.float32),
            SDS((b,), jnp.int32),
            SDS((b, rt), jnp.float32),
        )

    for rt, mz, batches in ((34, 40000, (1, 8)), (340, 30016, (1,))):
        model = _canonical_unet(jnp.bfloat16, mz=mz)
        for b in batches:
            x, t0_, ms1 = sample_shapes(b, rt, mz)
            # bench_unet_sample/forward: jax.jit(model.init)(key, x, t, x, ms1)
            warm(f"init ({rt},{mz}) bs{b}", model.init, key_sds, x, t0_, x, ms1)
            params = jax.eval_shape(model.init, key_sds, x, t0_, x, ms1)
            if b == 1:
                warm(f"quantize ({rt},{mz})", quantize_mid_block_params, params)
            params_q = jax.eval_shape(quantize_mid_block_params, params)

            ship = model.clone(quantize_mid=True, fused_resnet=True)
            sampler = DDIMSampler(ship, process)
            t0 = time.perf_counter()
            sampler._sample_fn(50).lower(params_q, x, x, ms1).compile()
            print(
                f"warm sample50 int8+fused ({rt},{mz}) bs{b}: "
                f"{time.perf_counter()-t0:.0f}s",
                flush=True,
            )
            if b == 1 and mz == 40000:
                # BENCH_FULL bf16 comparison leg
                t0 = time.perf_counter()
                DDIMSampler(model, process)._sample_fn(50).lower(
                    params, x, x, ms1
                ).compile()
                print(f"warm sample50 bf16 bs1: {time.perf_counter()-t0:.0f}s", flush=True)
            if b == 1 and mz == 30016:
                # BENCH_FULL production forward leg (int8+fused apply)
                warm(f"fwd int8+fused ({rt},{mz})", ship.apply, params_q, x, t0_, x, ms1)

        # bench_unet_train bs1: remat + factored + fused_resnet, donated step
        tmodel = _canonical_unet(jnp.bfloat16, mz=mz).clone(
            remat_blocks=True, fused_resnet=True
        )
        tx = optax.chain(
            optax.clip_by_global_norm(10.0),
            optax.scale_by_factored_rms(),
        )
        trainer = Trainer(tmodel, process, optimizer=tx, ema_decay=None, seed=0)
        x, t0_, ms1 = sample_shapes(1, rt, mz)

        # the init_state jitted program (closes over base_key + zeros t)
        tt = jnp.zeros((1,), jnp.int32)
        init_fn = lambda a, b_: trainer._fresh_state(  # noqa: E731
            tmodel.init(trainer.base_key, a, tt, a, b_)
        )
        warm(f"train init_state ({rt},{mz})", init_fn, x, ms1)

        state_sds = jax.eval_shape(init_fn, x, ms1)
        batch_sds = {
            "ms2_1": x, "ms1_1": ms1, "ms2_2": x, "ms1_2": ms1,
        }
        t0 = time.perf_counter()
        trainer.train_step.lower(
            state_sds, batch_sds, SDS((), jnp.float32), key_sds
        ).compile()
        print(f"warm train_step ({rt},{mz}) bs1: {time.perf_counter()-t0:.0f}s", flush=True)

    print("aot warm done", flush=True)


if __name__ == "__main__":
    main()
