"""Round-3 canonical forward bench: fused norm+attn+residual sandwich and
int8 mid-block convs, vs the round-2 25.9 ms pallas_t baseline.

Run: PYTHONPATH=/root/repo:/root/.axon_site JAX_CACHE_DIR=/tmp/dquartic_jax_cache \
  python scripts/bench_unet_forward_r3.py [batch]
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/dquartic_jax_cache")
    from dquartic_tpu.models import UNet1d
    from dquartic_tpu.ops.quantization import quantize_mid_block_params

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    rt, mz = 34, 40000
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, rt, mz)).astype(np.float32))
    t = jnp.zeros((b,), jnp.int32)
    ms2 = jnp.asarray(rng.uniform(0, 1, (b, rt, mz)).astype(np.float32))
    ms1 = jnp.asarray(rng.uniform(0, 1, (b, rt)).astype(np.float32))

    def timeit(fn, n=15):
        out = fn()
        float(jnp.sum(out))
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        float(jnp.sum(out))
        return (time.perf_counter() - t0) / n * 1000

    def build(impl, quantize_mid, fused=False):
        m = UNet1d(
            dim=4, channels=1, dim_mults=(1, 2, 2, 3, 3, 4, 4), conditional=True,
            init_cond_channels=1, attn_cond_channels=1, tfer_dim_mult=620,
            downsample_dim=40000, simple=True, dtype=jnp.bfloat16,
            linear_attn_impl=impl, fused_resnet=fused,
        )
        params = m.init(jax.random.PRNGKey(0), x, t, ms2, ms1)
        if quantize_mid:
            m = m.clone(quantize_mid=True)
            params = jax.jit(quantize_mid_block_params)(params)
        fwd = jax.jit(lambda p, a, b_, c, d: m.apply(p, a, b_, c, d))
        return m, params, fwd

    ref_out = None
    for label, impl, qm, fused in (
        ("xla", "xla", False, False),
        ("pallas_t fused-sandwich", "pallas_t", False, False),
        ("pallas_t + int8 mid", "pallas_t", True, False),
        ("+ fused transposed resnet", "pallas_t", True, True),
    ):
        _, params, fwd = build(impl, qm, fused)
        out = np.asarray(fwd(params, x, t, ms2, ms1), np.float32)
        if ref_out is None:
            ref_out, err = out, 0.0
        else:
            err = float(np.max(np.abs(out - ref_out)) / (np.max(np.abs(ref_out)) + 1e-9))
        ms = timeit(lambda: fwd(params, x, t, ms2, ms1))
        print(f"{label:26s}: {ms:7.2f} ms/forward (bs{b})  relerr={err:.1e}", flush=True)


if __name__ == "__main__":
    main()
