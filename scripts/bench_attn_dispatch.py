"""Measure the pallas-vs-XLA crossover for the bottleneck full attention.

The reference's ``Attend`` picked CUDA kernels per GPU generation
(unet1d.py:327-411); the TPU analogue needs a measured ``_PALLAS_MIN_SEQ``
in ops/attention_dispatch.py. The bottleneck attention runs over the RT
axis (34-340 points for canonical data-gen settings, up to ~1-2k for long
windows), with (b, heads=4, rt, dim_head=32) tensors.

Run on TPU: python scripts/bench_attn_dispatch.py
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/dquartic_jax_cache")
    from dquartic_tpu.ops.attention_dispatch import _xla_attention
    from dquartic_tpu.ops.flash_attention import flash_attention

    def timeit(fn, *args, n=50):
        out = fn(*args)
        float(jnp.sum(out))
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        float(jnp.sum(out))
        return (time.perf_counter() - t0) / n * 1000

    rng = np.random.default_rng(0)
    b, h, d = 1, 4, 32
    print(f"{'seq':>6} | {'xla':>9} | {'pallas':>9} | winner")
    for seq in (34, 128, 340, 1024, 2048, 4096, 8192):
        q = jnp.asarray(rng.normal(size=(b, h, seq, d)).astype(np.float32)).astype(jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(b, h, seq, d)).astype(np.float32)).astype(jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(b, h, seq, d)).astype(np.float32)).astype(jnp.bfloat16)
        fx = jax.jit(lambda q, k, v: _xla_attention(q, k, v, None))
        fp = jax.jit(lambda q, k, v: flash_attention(q, k, v))
        ox = np.asarray(fx(q, k, v), np.float32)
        op = np.asarray(fp(q, k, v), np.float32)
        err = np.max(np.abs(ox - op)) / (np.max(np.abs(ox)) + 1e-9)
        tx = timeit(fx, q, k, v)
        tp = timeit(fp, q, k, v)
        print(f"{seq:>6} | {tx:7.3f}ms | {tp:7.3f}ms | {'pallas' if tp < tx else 'xla'} (e{err:.0e})")


if __name__ == "__main__":
    main()
