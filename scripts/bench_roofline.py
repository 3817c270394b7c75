"""Chip calibration: HBM bandwidth (copy/add), MXU matmul rate, and a
40000-point conv/elementwise chain — establishes the realistic roofline
the model kernels should be judged against."""

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
        return (time.perf_counter() - t0)

    # HBM bandwidth: big f32 add (read 2N, write N)
    for size_mb in (256, 1024):
        n = size_mb * 1024 * 1024 // 4
        a = jnp.ones((n,), jnp.float32)
        b = jnp.ones((n,), jnp.float32)
        add = jax.jit(lambda a, b: a + b)
        dt = timeit(add, a, b)
        gbps = 3 * n * 4 / dt / 1e9
        print(f"f32 add {size_mb}MB: {dt*1e3:.2f} ms -> {gbps:.0f} GB/s effective")

    # MXU: bf16 matmul
    for m, k, n in ((4096, 4096, 4096), (8192, 8192, 8192)):
        a = jnp.ones((m, k), jnp.bfloat16)
        b = jnp.ones((k, n), jnp.bfloat16)
        mm = jax.jit(lambda a, b: a @ b)
        dt = timeit(mm, a, b)
        tflops = 2 * m * k * n / dt / 1e12
        print(f"bf16 matmul {m}x{k}x{n}: {dt*1e3:.2f} ms -> {tflops:.1f} TFLOP/s")

    # The model's row-conv shape: (1156 rows, 40000, 8) conv k=3
    import flax.linen as nn

    conv = nn.Conv(8, (3,), padding=1, dtype=jnp.bfloat16)
    x = jnp.ones((1156, 40000, 8), jnp.bfloat16)
    params = conv.init(jax.random.PRNGKey(0), x)
    f = jax.jit(lambda p, x: conv.apply(p, x))
    dt = timeit(f, params, x)
    traffic = 2 * x.size * 2
    print(f"conv1d(8ch,k3) on (1156,40000,8): {dt*1e3:.2f} ms -> {traffic/dt/1e9:.0f} GB/s")

    # qkv-style matmul: (1.36M, 8) @ (8, 384) bf16
    xm = jnp.ones((34 * 40000, 8), jnp.bfloat16)
    w = jnp.ones((8, 384), jnp.bfloat16)
    mm2 = jax.jit(lambda x, w: x @ w)
    dt = timeit(mm2, xm, w)
    out_bytes = 34 * 40000 * 384 * 2
    print(f"qkv matmul (1.36M,8)@(8,384): {dt*1e3:.2f} ms -> write {out_bytes/1e9:.2f} GB -> {out_bytes/dt/1e9:.0f} GB/s")


if __name__ == "__main__":
    main()
