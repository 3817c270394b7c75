"""Micro-benchmark: fused Pallas linear attention vs XLA, sweeping block
sizes. Run on TPU: python scripts/bench_linear_attention.py"""

import functools
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/dquartic_jax_cache")
    from dquartic_tpu.ops import linear_attention as la

    B, N, C = 34, 40000, 8
    heads, dim_head = 4, 32
    H = heads * dim_head
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32)).astype(jnp.bfloat16)
    w_qkv = jnp.asarray(rng.normal(size=(C, 3 * H)).astype(np.float32) * 0.1)
    w_out = jnp.asarray(rng.normal(size=(H, C)).astype(np.float32) * 0.1)
    b_out = jnp.zeros((C,), jnp.float32)
    g = jnp.ones((C,), jnp.float32)

    def timeit(fn, n=20):
        sync = lambda o: float(jnp.sum(jax.tree_util.tree_leaves(o)[0]))
        out = fn()
        sync(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        sync(out)
        return (time.perf_counter() - t0) / n * 1000

    ref = jax.jit(
        lambda x: la.linear_attention_reference(x, w_qkv, w_out, b_out, g, heads, dim_head)
    )
    t_ref = timeit(lambda: ref(x))
    print(f"xla reference: {t_ref:.3f} ms")

    for block_n in (512, 1024, 2048, 4096, 8192):
        fwd = jax.jit(
            functools.partial(
                la._fused_forward,
                w_qkv=w_qkv, w_out=w_out, b_out=b_out, g=g,
                heads=heads, dim_head=dim_head, block_n=block_n, interpret=None,
            )
        )
        try:
            t = timeit(lambda: fwd(x))
            print(f"pallas block_n={block_n}: {t:.3f} ms  ({t_ref / t:.2f}x vs xla)")
        except Exception as e:
            print(f"pallas block_n={block_n}: FAILED {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
