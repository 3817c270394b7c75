"""Time + trace the shipping inference forward (pallas_t + int8 mid +
fused transposed-resident resnet). Default canonical (34, 40000);
TRACE_RT / TRACE_MZ select other windows (production: 340 x 30016).

Run: PYTHONPATH=/root/repo:/root/.axon_site JAX_CACHE_DIR=/tmp/dquartic_jax_cache \
  python scripts/trace_shipping_forward.py [batch] [--trace DIR]
Per-phase table: python scripts/parse_xplane.py DIR --families 5
"""

import os

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/dquartic_jax_cache")
    from dquartic_tpu.models import UNet1d
    from dquartic_tpu.ops.quantization import quantize_mid_block_params

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    b = int(args[0]) if args else 1
    trace_dir = None
    if "--trace" in sys.argv:
        trace_dir = sys.argv[sys.argv.index("--trace") + 1]
    rt = int(os.environ.get("TRACE_RT", "34"))
    mz = int(os.environ.get("TRACE_MZ", "40000"))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, rt, mz)).astype(np.float32))
    t = jnp.zeros((b,), jnp.int32)
    ms2 = jnp.asarray(rng.uniform(0, 1, (b, rt, mz)).astype(np.float32))
    ms1 = jnp.asarray(rng.uniform(0, 1, (b, rt)).astype(np.float32))

    m = UNet1d(
        dim=4, channels=1, dim_mults=(1, 2, 2, 3, 3, 4, 4), conditional=True,
        init_cond_channels=1, attn_cond_channels=1, tfer_dim_mult=620,
        downsample_dim=mz, simple=True, dtype=jnp.bfloat16,
        linear_attn_impl="pallas_t", fused_resnet=True, quantize_mid=True,
    )
    params = jax.jit(m.clone(quantize_mid=False, fused_resnet=False).init)(
        jax.random.PRNGKey(0), x, t, ms2, ms1
    )
    params = jax.jit(quantize_mid_block_params)(params)
    fwd = jax.jit(lambda p, a, b_, c, d: m.apply(p, a, b_, c, d))

    out = fwd(params, x, t, ms2, ms1)
    print("compiled; sum =", float(jnp.sum(out)), flush=True)
    n = 15
    t0 = time.perf_counter()
    for _ in range(n):
        out = fwd(params, x, t, ms2, ms1)
    float(jnp.sum(out))
    ms = (time.perf_counter() - t0) / n * 1000
    print(f"shipping forward: {ms:7.2f} ms/forward (bs{b})", flush=True)

    if trace_dir:
        with jax.profiler.trace(trace_dir):
            for _ in range(5):
                out = fwd(params, x, t, ms2, ms1)
            float(jnp.sum(out))
        print("trace written to", trace_dir, flush=True)


if __name__ == "__main__":
    main()
