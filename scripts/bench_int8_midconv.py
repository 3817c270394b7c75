"""Microbench: int8 weight-streaming conv vs the bf16 in-model floor.

The canonical mid-block conv is (3, 10000, 10000) over (b, 34, 10000)
activations — 600 MB bf16 weight stream at ~375 GB/s = 1.61 ms measured
in-model (BENCH_NOTES.md). Target: ~0.8-1.0 ms from halving the bytes.

Run on the TPU host:
  PYTHONPATH=/root/repo:/root/.axon_site JAX_CACHE_DIR=/tmp/dquartic_jax_cache \
    python scripts/bench_int8_midconv.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from dquartic_tpu.ops.int8_matmul import (
    int8_conv1d,
    int8_matmul,
    quantize_conv_kernel,
    quantize_weight_matrix,
)


def sync(x):
    return float(jnp.sum(x))


def timeit(fn, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters * 1000.0


def main():
    rng = np.random.default_rng(0)
    b, rt, c = 1, 34, 10000
    kernel = 3

    x = jnp.asarray(rng.normal(size=(b, rt, c)).astype(np.float32), jnp.bfloat16)
    w = rng.normal(size=(kernel, c, c)).astype(np.float32) * 0.02
    bias = rng.normal(size=(c,)).astype(np.float32)

    q, scale = jax.jit(quantize_conv_kernel)(jnp.asarray(w))
    q.block_until_ready()
    int8_bytes = q.size + scale.size * 4
    print(f"int8 weights: {int8_bytes/1e6:.0f} MB (bf16 was {w.size*2/1e6:.0f} MB)")

    # NOTE: weights must be jit *arguments* — closing over them would bake
    # 300 MB constants into the HLO (the remote compiler rejects >~100 MB
    # request bodies with HTTP 413). The model path passes them as params.
    bias_j = jnp.asarray(bias)
    conv_j = jax.jit(
        lambda xx, qq, ss, bb: int8_conv1d(xx, qq, ss, bb, kernel, c)
    )
    ms = timeit(lambda: conv_j(x, q, scale, bias_j))
    gbps = int8_bytes / (ms / 1e3) / 1e9
    print(f"int8_conv1d: {ms:.3f} ms  ({gbps:.0f} GB/s weight stream)")

    # bf16 XLA conv oracle (the in-model path this replaces)
    wb = jnp.asarray(w, jnp.bfloat16)
    conv_ref = jax.jit(
        lambda xx, ww: jax.lax.conv_general_dilated(
            xx, ww, (1,), [(1, 1)], dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=jnp.float32,
        )
    )
    ms_ref = timeit(lambda: conv_ref(x, wb))
    print(f"bf16 XLA conv: {ms_ref:.3f} ms  ({w.size*2/(ms_ref/1e3)/1e9:.0f} GB/s)")

    # raw matmul at the padded shape, to separate im2col cost
    xf = jnp.asarray(rng.normal(size=(b * rt, kernel * c)).astype(np.float32), jnp.bfloat16)
    q2, s2 = jax.jit(quantize_weight_matrix)(jnp.asarray(w.reshape(kernel * c, c)))
    mm_j = jax.jit(lambda xx, qq, ss: int8_matmul(xx, qq, ss))
    ms_mm = timeit(lambda: mm_j(xf, q2, s2))
    print(f"int8_matmul only: {ms_mm:.3f} ms")


if __name__ == "__main__":
    main()
