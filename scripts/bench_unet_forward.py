"""Canonical UNet1d forward-latency sweep over linear-attention impls and
pallas thresholds, on the real TPU. Informs the `auto` dispatch defaults.

Run: PYTHONPATH=. python scripts/bench_unet_forward.py
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

    b, rt, mz = 1, 34, 40000
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

    configs = [
        ("xla", None),
        ("pallas_t", 40000),
        ("pallas_t", 10000),
        ("pallas_t", 5000),
        ("pallas_t", 2500),
        ("pallas_t", 625),
        ("pallas", 5000),
    ]
    ref_out = None
    for impl, min_seq in configs:
        if min_seq is not None:
            os.environ["DQUARTIC_LINATTN_MIN_SEQ"] = str(min_seq)
        model = UNet1d(
            dim=4, channels=1, dim_mults=(1, 2, 2, 3, 3, 4, 4), conditional=True,
            init_cond_channels=1, attn_cond_channels=1, tfer_dim_mult=620,
            downsample_dim=40000, simple=True, dtype=jnp.bfloat16,
            linear_attn_impl=impl,
        )
        params = model.init(jax.random.PRNGKey(0), x, t, ms2, ms1)
        fwd = jax.jit(lambda p, a, b_, c, d: model.apply(p, a, b_, c, d))
        out = np.asarray(fwd(params, x, t, ms2, ms1), np.float32)
        if ref_out is None:
            ref_out = out
            err = 0.0
        else:
            err = float(np.max(np.abs(out - ref_out)) / (np.max(np.abs(ref_out)) + 1e-9))
        ms = timeit(lambda: fwd(params, x, t, ms2, ms1))
        print(f"impl={impl:9s} min_seq={min_seq!s:6s}: {ms:7.2f} ms/forward  relerr={err:.1e}",
              flush=True)


if __name__ == "__main__":
    main()
