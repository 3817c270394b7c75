"""Pre-blocked (tile-contiguous) weight storage vs flat 2-D layout.

Flat (K, N) storage makes each (bk, bn) tile DMA a strided 2-D copy with
bn*itemsize-byte bursts (~2 KB) — measured ~165-190 GB/s on v5e for every
dtype. Storing tiles contiguously ((nk, nn, bk, bn)) turns each tile into
one ~1-2 MB linear burst.
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


def kernel_blocked(w_ref, out_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += jnp.sum(
        w_ref[0, 0].astype(jnp.bfloat16).astype(jnp.float32), axis=0, keepdims=True
    )


def bench_blocked(w4, block_k, block_n):
    nk, nn = w4.shape[0], w4.shape[1]
    f = pl.pallas_call(
        kernel_blocked,
        grid=(nn, nk),
        in_specs=[
            pl.BlockSpec((1, 1, block_k, block_n), lambda i, j: (j, i, 0, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((1, block_n), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, nn * block_n), jnp.float32),
    )
    jf = jax.jit(lambda x: f(x))
    ms = timeit(jf, w4)
    nbytes = w4.size * w4.dtype.itemsize
    print(
        f"blocked {w4.dtype!s:9s} bk={block_k} bn={block_n}: {ms:7.3f} ms  "
        f"{nbytes/(ms/1e3)/1e9:6.0f} GB/s", flush=True,
    )


def main():
    rng = np.random.default_rng(0)
    for bk, bn in ((1024, 1024), (512, 1024), (1024, 2048)):
        nk, nn = 30720 // bk, 10240 // bn
        w4 = jnp.asarray(rng.integers(-127, 127, (nk, nn, bk, bn), dtype=np.int8))
        bench_blocked(w4, bk, bn)
    # bf16 comparison at same bytes
    bk, bn = 1024, 1024
    nk, nn = 30720 // bk, 5120 // bn
    wb = jnp.asarray(rng.normal(size=(nk, nn, bk, bn)).astype(np.float32), jnp.bfloat16)
    bench_blocked(wb, bk, bn)


if __name__ == "__main__":
    main()
