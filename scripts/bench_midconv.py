"""Standalone probe: can a Pallas weight-streaming matmul beat XLA's
mid-block conv lowering?

The canonical model's four mid-block convs (kernel-3 over rt=34, channels
10000 -> 10000, 600 MB bf16 weights each) dominate the weight-bound share
of the forward: 1.61 ms each in-model = 373 GB/s, 46% of v5e HBM peak.
As a matmul this is (34, 30000) @ (30000, 10000) with a 2 MB activation —
a pure sequential weight stream that should run near peak.

Run on TPU: python scripts/bench_midconv.py
"""

import functools
import time

import numpy as np


def make_kernel():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def _kernel(x_ref, w_ref, o_ref, acc_ref, *, k_blocks: int):
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        acc_ref[...] += jnp.dot(
            x_ref[...], w_ref[...], preferred_element_type=jnp.float32
        )

        @pl.when(k == k_blocks - 1)
        def _():
            o_ref[...] = acc_ref[...].astype(o_ref.dtype)

    def matmul(x, w, block_k=2048, block_n=2048):
        M, K = x.shape
        K2, N = w.shape
        k_blocks = K // block_k
        n_blocks = N // block_n
        kern = functools.partial(_kernel, k_blocks=k_blocks)
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
            grid=(n_blocks, k_blocks),
            in_specs=[
                pl.BlockSpec((M, block_k), lambda n, k: (0, k), memory_space=pltpu.VMEM),
                pl.BlockSpec((block_k, block_n), lambda n, k: (k, n), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((M, block_n), lambda n, k: (0, n), memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((M, block_n), jnp.float32)],
        )(x, w)

    return matmul


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/dquartic_jax_cache")

    def timeit(fn, *args, n=30):
        out = fn(*args)
        float(jnp.sum(out))
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        float(jnp.sum(out))
        return (time.perf_counter() - t0) / n * 1000

    M, K, N = 40, 30000, 10000  # rows padded 34 -> 40
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray((rng.normal(size=(K, N)) * 0.02).astype(np.float32)).astype(jnp.bfloat16)
    gb = (M * K + K * N + M * N) * 2 / 1e9

    fx = jax.jit(lambda x, w: jnp.dot(x, w, preferred_element_type=jnp.float32).astype(jnp.bfloat16))
    tx = timeit(fx, x, w)
    print(f"xla matmul: {tx:.3f} ms = {gb / tx * 1000:.0f} GB/s")

    matmul = make_kernel()
    ox = np.asarray(fx(x, w), np.float32)
    # pad K/N to tileable multiples (zeros don't change the product)
    Kp, Np = 30720, 10240
    xp = jnp.pad(x, ((0, 0), (0, Kp - K)))
    wp = jnp.pad(w, ((0, Kp - K), (0, Np - N)))
    for bk, bn in ((2048, 2048), (1024, 2048), (2048, 5120), (512, 1024), (3072, 2048)):
        if Kp % bk or Np % bn:
            continue
        try:
            fp = jax.jit(
                lambda x, w, _bk=bk, _bn=bn: matmul(x, w, block_k=_bk, block_n=_bn)[:, :N]
            )
            op = np.asarray(fp(xp, wp), np.float32)
            err = np.max(np.abs(op - ox)) / (np.max(np.abs(ox)) + 1e-9)
            tp = timeit(fp, xp, wp)
            print(f"pallas bk={bk} bn={bn}: {tp:.3f} ms = {gb / tp * 1000:.0f} GB/s  e{err:.0e}")
        except Exception as e:
            print(f"pallas bk={bk} bn={bn}: FAILED {type(e).__name__}: {str(e)[:140]}")


if __name__ == "__main__":
    main()
