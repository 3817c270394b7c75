"""Layout experiment: feature-last (rows, N, C) vs channel-first
(rows, C, N) for the small-channel m/z conv stack.

TPU tiles put the minor axis on 128 lanes: C=4 feature-last pads 32x;
channel-first puts N (40000) on lanes with C on sublanes (pads 4->8, 2x).
Measures one conv3 + norm + silu chain both ways at level-0 shape.
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/dquartic_jax_cache")

    def timeit(fn, *args, n=20):
        sync = lambda o: float(jnp.sum(jax.tree_util.tree_leaves(o)[0]))
        out = fn(*args)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        sync(out)
        return (time.perf_counter() - t0) / n * 1000

    rows, N, C = 1156, 40000, 4
    rng = np.random.default_rng(0)
    kernel = jnp.asarray(rng.normal(size=(3, C, C)).astype(np.float32) * 0.1)  # (k, in, out)
    g = jnp.ones((C,), jnp.float32)

    # feature-last: (rows, N, C), conv via lax with NHC
    x_fl = jnp.asarray(rng.normal(size=(rows, N, C)).astype(np.float32)).astype(jnp.bfloat16)

    def block_fl(x):
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(jnp.bfloat16), (1,), [(1, 1)],
            dimension_numbers=("NHC", "HIO", "NHC"),
        )
        y32 = y.astype(jnp.float32)
        norm = jnp.sqrt(jnp.sum(y32 * y32, axis=-1, keepdims=True))
        y = (y32 / jnp.maximum(norm, 1e-12) * g * 2.0).astype(jnp.bfloat16)
        return jax.nn.silu(y)

    t_fl = timeit(jax.jit(block_fl), x_fl)
    print(f"feature-last (rows,N,C): {t_fl:.2f} ms")

    # channel-first: (rows, C, N), conv with NCH
    x_cf = jnp.transpose(x_fl, (0, 2, 1))

    def block_cf(x):
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(jnp.bfloat16), (1,), [(1, 1)],
            dimension_numbers=("NCH", "HIO", "NCH"),
        )
        y32 = y.astype(jnp.float32)
        norm = jnp.sqrt(jnp.sum(y32 * y32, axis=1, keepdims=True))
        y = (y32 / jnp.maximum(norm, 1e-12) * g[None, :, None] * 2.0).astype(jnp.bfloat16)
        return jax.nn.silu(y)

    t_cf = timeit(jax.jit(block_cf), x_cf)
    print(f"channel-first (rows,C,N): {t_cf:.2f} ms  ({t_fl / t_cf:.2f}x)")

    # 3-op chain (conv->conv->conv) to amortize dispatch
    def chain_fl(x):
        for _ in range(3):
            x = block_fl(x)
        return x

    def chain_cf(x):
        for _ in range(3):
            x = block_cf(x)
        return x

    t3_fl = timeit(jax.jit(chain_fl), x_fl)
    t3_cf = timeit(jax.jit(chain_cf), x_cf)
    print(f"3-chain feature-last: {t3_fl:.2f} ms   channel-first: {t3_cf:.2f} ms  ({t3_fl / t3_cf:.2f}x)")


if __name__ == "__main__":
    main()
