"""Does HBM->VMEM streaming rate depend on element width?

Streams the same ~300 MB as int8 / bfloat16(150M elems=300MB) / int32 and
reports GB/s. If int32 streams at ~2-4x the int8 byte rate, the int8
weight kernel should read bytes through an int32 view and unpack in VMEM.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def sync(x):
    return float(jnp.sum(x))


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters * 1000.0


def kernel(w_ref, out_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += jnp.sum(w_ref[:].astype(jnp.float32), axis=0, keepdims=True)


def bench(w, block_k, block_n):
    K, N = w.shape
    f = pl.pallas_call(
        kernel,
        grid=(N // block_n, K // block_k),
        in_specs=[pl.BlockSpec((block_k, block_n), lambda i, j: (j, i), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, block_n), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
    )
    jf = jax.jit(lambda x: f(x))
    ms = timeit(jf, w)
    nbytes = w.size * w.dtype.itemsize
    print(
        f"{w.dtype!s:9s} {K}x{N} bk={block_k} bn={block_n}: {ms:7.3f} ms  "
        f"{nbytes/(ms/1e3)/1e9:6.0f} GB/s  ({w.size/(ms/1e3)/1e9:.0f} Gelem/s)",
        flush=True,
    )


def main():
    rng = np.random.default_rng(0)
    total = 30720 * 10240  # ~315M elements

    w8 = jnp.asarray(rng.integers(-127, 127, (30720, 10240), dtype=np.int8))
    bench(w8, 1024, 2048)

    w16 = jnp.asarray(rng.normal(size=(30720, 5120)).astype(np.float32), jnp.bfloat16)
    bench(w16, 1024, 1024)  # same 315 MB

    w32 = jnp.asarray(rng.integers(0, 2**30, (30720, 2560), dtype=np.int32))
    bench(w32, 1024, 512)  # same 315 MB
    bench(w32, 1024, 1280)


if __name__ == "__main__":
    main()
