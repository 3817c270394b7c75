"""Round-4 linattn kernel iteration bench.

Measures the shipping fused prenorm+residual kernel (`_fused_t_nr`) per
level shape of the canonical UNet1d (the 14-mixer family is 7.77 ms of
the 15.08 ms device forward at 52% MXU — VERDICT r3 next-round #1), plus
the summed family cost. Each level appears twice in the net (down + up
path at the same (N, C)).

Run: PYTHONPATH=/root/repo:/root/.axon_site JAX_CACHE_DIR=/tmp/dquartic_jax_cache \
  python scripts/bench_linattn_r4.py
"""

import time

import numpy as np

# (N, C) per level of the canonical net (dim=4, mults 1,2,2,3,3,4,4 at mz 40000)
LEVELS = [
    (40000, 4),
    (20000, 4),
    (10000, 8),
    (5000, 8),
    (2500, 12),
    (1250, 12),
    (625, 16),
]
ROWS = 34


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/dquartic_jax_cache")
    from dquartic_tpu.ops.linear_attention import (
        fused_linear_attention_t,
        linear_attention_nr_reference,
    )

    heads, dim_head = 4, 32
    H = heads * dim_head
    dtype = jnp.bfloat16

    def timeit(fn, *args, n=30):
        out = fn(*args)
        float(jnp.sum(out.astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        float(jnp.sum(out.astype(jnp.float32)))
        return (time.perf_counter() - t0) / n * 1000

    rng = np.random.default_rng(0)
    total = 0.0
    print(f"{'(N, C)':>14} | {'ms/call':>8} | {'max_err':>9}")
    for N, C in LEVELS:
        x = jnp.asarray(rng.normal(size=(ROWS, N, C)), dtype)
        w_qkv = jnp.asarray(rng.normal(size=(C, 3 * H)) * C**-0.5, dtype)
        w_out = jnp.asarray(rng.normal(size=(H, C)) * H**-0.5, dtype)
        b_out = jnp.zeros((C,), dtype)
        g = jnp.ones((C,), dtype)
        g_pre = jnp.ones((C,), dtype)

        CHAIN = 10  # amortize the ~1.4 ms tunnel dispatch floor

        @jax.jit
        def fn(x, w_qkv, w_out, b_out, g, g_pre):
            for _ in range(CHAIN):
                x = fused_linear_attention_t(
                    x, w_qkv, w_out, b_out, g, heads, dim_head,
                    g_pre=g_pre, residual=True,
                )
            return x
        ref = jax.jit(
            lambda x, w_qkv, w_out, b_out, g, g_pre: linear_attention_nr_reference(
                x, w_qkv, w_out, b_out, g, g_pre, heads, dim_head, residual=True
            )
        )
        one = jax.jit(
            lambda x, w_qkv, w_out, b_out, g, g_pre: fused_linear_attention_t(
                x, w_qkv, w_out, b_out, g, heads, dim_head,
                g_pre=g_pre, residual=True,
            )
        )
        y = one(x, w_qkv, w_out, b_out, g, g_pre)
        yr = ref(x, w_qkv, w_out, b_out, g, g_pre)
        err = float(jnp.max(jnp.abs(y.astype(jnp.float32) - yr.astype(jnp.float32))))
        ms = timeit(fn, x, w_qkv, w_out, b_out, g, g_pre) / CHAIN
        total += 2 * ms  # each level shape appears twice in the net
        print(f"({N:>6}, {C:>2}) | {ms:8.3f} | {err:9.2e}")
    print(f"{'family sum':>14} | {total:8.2f} ms  (14 mixers)")


if __name__ == "__main__":
    main()
