"""Small-channel conv1d alternatives: lax.conv vs shifted matmuls.

XLA's conv op relayouts small-channel inputs internally (~5 ms per call
at (1156, 40000, 4)); a k-tap conv is just k shifted (N, C) @ (C, C')
matmuls, which XLA fuses into a single bandwidth-bound pass.
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

    rng = np.random.default_rng(0)

    for rows, N, C, CO, K in [(1156, 40000, 4, 4, 3), (1156, 40000, 2, 4, 7), (1156, 20000, 8, 8, 3)]:
        x = jnp.asarray(rng.normal(size=(rows, N, C)).astype(np.float32)).astype(jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(K, C, CO)).astype(np.float32) * 0.1)
        b = jnp.zeros((CO,), jnp.float32)
        pad = K // 2

        def conv_lax(x):
            y = jax.lax.conv_general_dilated(
                x, w.astype(jnp.bfloat16), (1,), [(pad, pad)],
                dimension_numbers=("NHC", "HIO", "NHC"),
            )
            return y + b.astype(jnp.bfloat16)

        def conv_shift(x):
            xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
            y = None
            for k in range(K):
                t = jax.lax.dynamic_slice_in_dim(xp, k, N, axis=1) @ w[k].astype(jnp.bfloat16)
                y = t if y is None else y + t
            return y + b.astype(jnp.bfloat16)

        t_lax = timeit(jax.jit(conv_lax), x)
        t_shift = timeit(jax.jit(conv_shift), x)
        out_a = jax.jit(conv_lax)(x)
        out_b = jax.jit(conv_shift)(x)
        err = float(jnp.max(jnp.abs(out_a.astype(jnp.float32) - out_b.astype(jnp.float32))))
        print(
            f"({rows},{N},{C}->{CO}) k{K}: lax.conv {t_lax:6.2f} ms | shifted-matmul "
            f"{t_shift:6.2f} ms ({t_lax / t_shift:.2f}x)  maxerr {err:.2e}"
        )


if __name__ == "__main__":
    main()
