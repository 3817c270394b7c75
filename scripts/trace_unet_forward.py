"""Capture a device trace of the canonical UNet1d forward (int8 mid path
by default) for the per-phase roofline table in BENCH_NOTES.md.

Run: PYTHONPATH=/root/repo:/root/.axon_site JAX_CACHE_DIR=/tmp/dquartic_jax_cache \
  python scripts/trace_unet_forward.py [trace_dir] [bf16|int8|fused]

(``fused`` = int8 mid convs + transposed-resident fused ResnetBlock path,
the shipping inference configuration after round 3.)
Then: python scripts/parse_xplane.py <trace_dir>
"""

import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/dquartic_jax_cache")
    from dquartic_tpu.models import UNet1d
    from dquartic_tpu.ops.quantization import quantize_mid_block_params

    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/unet_trace_r3"
    variant = sys.argv[2] if len(sys.argv) > 2 else "int8"
    b, rt, mz = 1, 34, 40000
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, rt, mz)).astype(np.float32))
    t = jnp.zeros((b,), jnp.int32)
    ms2 = jnp.asarray(rng.uniform(0, 1, (b, rt, mz)).astype(np.float32))
    ms1 = jnp.asarray(rng.uniform(0, 1, (b, rt)).astype(np.float32))

    m = UNet1d(
        dim=4, channels=1, dim_mults=(1, 2, 2, 3, 3, 4, 4), conditional=True,
        init_cond_channels=1, attn_cond_channels=1, tfer_dim_mult=620,
        downsample_dim=40000, simple=True, dtype=jnp.bfloat16,
        linear_attn_impl="pallas_t",
    )
    params = jax.jit(m.init)(jax.random.PRNGKey(0), x, t, ms2, ms1)
    if variant in ("int8", "fused"):
        m = m.clone(quantize_mid=True, fused_resnet=(variant == "fused"))
        params = jax.jit(quantize_mid_block_params)(params)
    fwd = jax.jit(lambda p, a, b_, c, d: m.apply(p, a, b_, c, d))

    out = fwd(params, x, t, ms2, ms1)
    float(jnp.sum(out))  # warm + sync
    for _ in range(3):
        out = fwd(params, x, t, ms2, ms1)
    float(jnp.sum(out))

    with jax.profiler.trace(trace_dir):
        for _ in range(5):
            out = fwd(params, x, t, ms2, ms1)
        float(jnp.sum(out))
    print(f"trace written to {trace_dir}", flush=True)


if __name__ == "__main__":
    main()
