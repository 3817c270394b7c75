"""Diagnose the axon relay's execution model: what streams per call?

Times chained vs unchained execution with tiny-slice syncs (4-byte
readback) vs full-tensor readback, to separate on-chip compute from
host<->device transfer. Informs how bench.py must be structured to
measure real chip performance.
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/dquartic_jax_cache")

    def tiny_sync(x):
        # 4-byte readback: forces completion without pulling the tensor
        return float(jnp.sum(x[..., :1][:1]))

    def timeit(fn, n=10):
        out = fn()
        tiny_sync(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        tiny_sync(out)
        return (time.perf_counter() - t0) / n * 1000

    n_elem = 64 * 1024 * 1024  # 256 MB f32
    x0 = jnp.ones((n_elem,), jnp.float32)

    # 1. chained + donated: buffer stays device-resident
    f_chain = jax.jit(lambda x: x * 1.0001, donate_argnums=(0,))
    holder = {"x": x0}

    def chained():
        holder["x"] = f_chain(holder["x"])
        return holder["x"]

    t = timeit(chained)
    print(f"chained+donated 256MB elementwise: {t:.2f} ms -> {2 * 256 / t:.0f} GB/s")

    # 2. unchained, same input handle each call, no donation
    x1 = jnp.ones((n_elem,), jnp.float32)
    f_plain = jax.jit(lambda x: x * 1.0001)
    t = timeit(lambda: f_plain(x1))
    print(f"unchained 256MB elementwise: {t:.2f} ms")

    # 3. full output readback cost
    y = f_plain(x1)
    t0 = time.perf_counter()
    np.asarray(jax.device_get(y))
    t = (time.perf_counter() - t0) * 1000
    print(f"full 256MB device_get: {t:.2f} ms -> {256 / t:.1f} GB/s transfer")

    # 4. matmul with tiny sync, unchained inputs
    m = 8192
    a = jnp.ones((m, m), jnp.bfloat16)
    b = jnp.ones((m, m), jnp.bfloat16)
    mm = jax.jit(lambda a, b: a @ b)
    t = timeit(lambda: mm(a, b))
    print(f"bf16 matmul 8192^3 (tiny sync): {t:.2f} ms -> {2 * m**3 / (t / 1e3) / 1e12:.0f} TFLOP/s")

    # 5. chained matmul (a stays resident as chained output)
    f_mm_chain = jax.jit(lambda a, b: (a @ b).astype(jnp.bfloat16), donate_argnums=())
    holder2 = {"a": a}

    def chained_mm():
        holder2["a"] = f_mm_chain(holder2["a"], b)
        return holder2["a"]

    t = timeit(chained_mm)
    print(f"bf16 matmul 8192^3 chained: {t:.2f} ms -> {2 * m**3 / (t / 1e3) / 1e12:.0f} TFLOP/s")


if __name__ == "__main__":
    main()
