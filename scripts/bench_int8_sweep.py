"""Diagnose the int8 weight-streaming kernel: DMA vs convert vs dot.

Variants, all over the padded mid-conv weight (30720, 10240) int8:
  * stream+sum      — DMA the int8 blocks, reduce-add them (no convert,
                      no dot): the pure streaming ceiling.
  * stream+convert  — DMA + int8->bf16 astype + reduce: conversion cost.
  * matmul bk,bn    — the real kernel at several block shapes.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dquartic_tpu.ops import int8_matmul as m8


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


K_PAD, N_PAD = 30720, 10240


def stream_kernel(w_ref, out_ref, *, convert):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    w = w_ref[:]
    if convert:  # the kernel's actual dequant path: int8 -> bf16 -> f32 sum
        out_ref[:] += jnp.sum(w.astype(jnp.bfloat16).astype(jnp.float32), axis=0, keepdims=True)
    else:  # integer widen + sum: DMA + cheapest possible touch
        out_ref[:] += jnp.sum(w.astype(jnp.int32), axis=0, keepdims=True).astype(jnp.float32)


def bench_stream(w_q, block_k, block_n, convert):
    f = pl.pallas_call(
        functools.partial(stream_kernel, convert=convert),
        grid=(N_PAD // block_n, K_PAD // block_k),
        in_specs=[pl.BlockSpec((block_k, block_n), lambda i, j: (j, i), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, block_n), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, N_PAD), jnp.float32),
    )
    jf = jax.jit(lambda w: f(w))
    ms = timeit(jf, w_q)
    print(
        f"stream{'+convert' if convert else '     '} bk={block_k:5d} bn={block_n:5d}: "
        f"{ms:7.3f} ms  {w_q.size/(ms/1e3)/1e9:6.0f} GB/s", flush=True,
    )


def bench_matmul(x, w_q, scale, block_k, block_n):
    m8.BLOCK_K, m8.BLOCK_N = block_k, block_n
    jf = jax.jit(lambda xx, qq, ss: m8.int8_matmul(xx, qq, ss))
    ms = timeit(jf, x, w_q, scale)
    print(
        f"matmul bk={block_k:5d} bn={block_n:5d}: {ms:7.3f} ms  "
        f"{w_q.size/(ms/1e3)/1e9:6.0f} GB/s", flush=True,
    )


def main():
    rng = np.random.default_rng(0)
    w_q = jnp.asarray(rng.integers(-127, 127, (K_PAD, N_PAD), dtype=np.int8))
    scale = jnp.asarray(rng.uniform(0.001, 0.02, (N_PAD,)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(34, K_PAD)).astype(np.float32), jnp.bfloat16)

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "stream"):
        for bk, bn in ((512, 1024), (1024, 1024), (512, 2048)):
            bench_stream(w_q, bk, bn, convert=False)
            bench_stream(w_q, bk, bn, convert=True)
    if which in ("all", "matmul"):
        for bk, bn in ((512, 1024), (1024, 1024), (512, 2048), (1024, 2048), (2048, 1024)):
            try:
                bench_matmul(x, w_q, scale, bk, bn)
            except Exception as e:
                print(f"matmul bk={bk} bn={bn}: FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
