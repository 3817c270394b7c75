"""Measured-ceiling calibration for the roofline table (BENCH_NOTES.md).

Each probe states its byte accounting explicitly (reads + writes), so the
achieved-GB/s numbers are comparable across probes and against the per-op
trace budgets. Run on an idle host — the 1-core CPU host makes any
concurrent process poison host-side timing (round-2 measurement pitfalls).

Run: PYTHONPATH=/root/repo:/root/.axon_site JAX_CACHE_DIR=/tmp/dquartic_jax_cache \
  python scripts/bench_roofline.py
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/dquartic_jax_cache")

    def sync(x):
        return float(jnp.sum(x[..., :1, :1].astype(jnp.float32)))

    def timeit(fn, *args, iters=10, warmup=3, donate=None):
        f = jax.jit(fn, donate_argnums=donate) if donate is not None else jax.jit(fn)
        out = f(*args)
        for _ in range(warmup):
            out = f(*args) if donate is None else f(out)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args) if donate is None else f(out)
        sync(out)
        return (time.perf_counter() - t0) / iters * 1000.0

    rng = np.random.default_rng(0)

    # 1. read-dominated: 1 GB bf16 row-sum (reads 1 GB, writes 256 KB)
    a = jnp.asarray(rng.normal(size=(8192, 65536)).astype(np.float32), jnp.bfloat16)
    ms = timeit(lambda x: jnp.sum(x, axis=1, keepdims=True), a)
    gb = a.size * 2 / 1e9
    print(f"read-only reduce   : {ms:7.2f} ms  {gb/(ms/1e3):6.0f} GB/s read ({gb:.2f} GB)", flush=True)

    # 2. copy: 512 MB bf16 x -> x*c donated (reads 512 MB, writes 512 MB)
    b = jnp.asarray(rng.normal(size=(4096, 65536)).astype(np.float32), jnp.bfloat16)
    ms = timeit(lambda x: x * jnp.bfloat16(1.0000152587890625), b, donate=(0,))
    gb = b.size * 2 / 1e9
    print(f"scaled copy (r+w)  : {ms:7.2f} ms  {2*gb/(ms/1e3):6.0f} GB/s total ({gb:.2f} GB each way)", flush=True)

    # 3. 3-stream elementwise: y = x1 + x2 (reads 2x256 MB, writes 256 MB)
    c1 = jnp.asarray(rng.normal(size=(2048, 65536)).astype(np.float32), jnp.bfloat16)
    c2 = jnp.asarray(rng.normal(size=(2048, 65536)).astype(np.float32), jnp.bfloat16)
    ms = timeit(lambda x, y: x + y, c1, c2)
    gb = c1.size * 2 / 1e9
    print(f"add (2r+1w)        : {ms:7.2f} ms  {3*gb/(ms/1e3):6.0f} GB/s total ({gb:.2f} GB/stream)", flush=True)

    # 4. MXU: 8192^3 bf16 matmul = 1.1 TFLOP (v5e spec 197 TFLOP/s bf16)
    m1 = jnp.asarray(rng.normal(size=(8192, 8192)).astype(np.float32), jnp.bfloat16)
    m2 = jnp.asarray(rng.normal(size=(8192, 8192)).astype(np.float32), jnp.bfloat16)
    ms = timeit(lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.float32), m1, m2, iters=5)
    fl = 2 * 8192**3 / 1e12
    print(f"bf16 matmul 8192^3 : {ms:7.2f} ms  {fl/(ms/1e3):6.1f} TFLOP/s", flush=True)

    # 5. weight-stream shape: (9920, 9920) bf16 matvec-ish (reads 197 MB
    #    weights + tiny activations) — the mid-conv streaming pattern
    w = jnp.asarray(rng.normal(size=(9920, 9920)).astype(np.float32), jnp.bfloat16)
    act = jnp.asarray(rng.normal(size=(9920, 256)).astype(np.float32), jnp.bfloat16)
    ms = timeit(lambda ww, aa: jnp.dot(ww, aa, preferred_element_type=jnp.float32), w, act)
    gb = w.size * 2 / 1e9
    print(f"weight-stream matmul: {ms:6.2f} ms  {gb/(ms/1e3):6.0f} GB/s weights ({gb:.2f} GB)", flush=True)


if __name__ == "__main__":
    main()
