"""Round-5: does software-pipelining the linattn stream recover the
~0.8 ms of VPU work serialized with the MXU? (VERDICT r4 next-round #4)

Measures the SHIPPING kernel (ops/linear_attention.py `_kernel_ab_t`,
prenorm + residual + static_shift — exactly what the fused UNet1d mixers
run) with `pipeline` off vs on, per mixer level of the canonical model,
plus the family sum. The pipeline variant computes the same dots in the
same order (numerics identical); the only change is that each grid step
projects block j on the MXU while finishing block j-1's exp2/sums on the
VPU, so the units can overlap instead of serializing
MXU(k) -> VPU(exp2) -> MXU(A) inside every block.

Levels = the 14 mixer calls of the canonical 7-level UNet1d at
(34, 40000): down path N = 40000/2^l at C = 4*mult, up path mirrors.
Numerical agreement pipe-vs-plain is asserted on-device before timing.

Run: PYTHONPATH=/root/repo:/root/.axon_site JAX_CACHE_DIR=/tmp/dquartic_jax_cache \
  python scripts/bench_linattn_pipeline.py

AOT=1 compiles every program into the persistent cache WITHOUT running
anything on device (axon compiles take ~60 s each x 28 programs; the
precompile can overlap other device work, then the timed run hits the
cache and starts measuring immediately).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = 34
# (N, C) of every LinearAttention mixer in the canonical forward:
# down levels 0-6, and the up path revisits the same shapes (skip concat
# doubles C at the block input but the mixer runs at the level's dim) —
# so each distinct shape is measured once and counted twice in the
# family sum. PIPEBENCH_LEVELS selects a subset (comma list of level
# indices) — e.g. "1,2,3" when a shape's compile is pathological on the
# tunneled platform and its effect is measured in-model instead.
DIMS = (4, 8, 8, 12, 12, 16, 16)
_SEL = os.environ.get("PIPEBENCH_LEVELS", "")
_IDX = [int(s) for s in _SEL.split(",") if s.strip()] if _SEL else list(range(7))
LEVELS = [(40000 >> l, DIMS[l]) for l in _IDX]
MULTIPLICITY = 2


def main():
    import jax
    import jax.numpy as jnp

    from dquartic_tpu.ops.linear_attention import _fused_forward_single_t

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_CACHE_DIR", "/tmp/dquartic_jax_cache"),
    )
    heads, dim_head = 4, 32
    H = heads * dim_head
    rng = np.random.default_rng(0)
    chain = int(os.environ.get("CHAIN", "4"))
    reps = int(os.environ.get("REPS", "30"))
    aot = os.environ.get("AOT") == "1"

    def make_chained(fn):
        @jax.jit
        def chained(x, *rest):
            for _ in range(chain):
                x = fn(x, *rest).astype(x.dtype)
            return x

        return chained

    def timeit(fn, *args):
        chained = make_chained(fn)
        out = chained(*args)
        float(jnp.sum(out.astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(reps):
            out = chained(*args)
        float(jnp.sum(out.astype(jnp.float32)))
        return (time.perf_counter() - t0) / reps / chain * 1000

    totals = {False: 0.0, True: 0.0}
    print(f"{'(N, C)':>14} | {'plain ms':>9} | {'pipe ms':>9} | speedup")
    for N, C in LEVELS:
        x = jnp.asarray(rng.normal(size=(ROWS, N, C)), jnp.bfloat16)
        w_qkv = jnp.asarray(rng.normal(size=(C, 3 * H)) * C**-0.5, jnp.bfloat16)
        w_out = jnp.asarray(rng.normal(size=(H, C)) * H**-0.5, jnp.bfloat16)
        b_out = jnp.asarray(rng.normal(size=(C,)), jnp.float32)
        g = jnp.asarray(rng.normal(size=(C,)), jnp.float32)
        g_pre = jnp.asarray(rng.normal(size=(C,)), jnp.float32)

        def run(x, pipeline):
            return _fused_forward_single_t(
                x, w_qkv, w_out, b_out, g, heads, dim_head, 4096, None,
                g_pre=g_pre, residual=True, pipeline=pipeline,
            )

        if aot:
            # populate the persistent compile cache only — no device data,
            # no execution (safe to overlap a training run on the chip)
            xs = jax.ShapeDtypeStruct(x.shape, x.dtype)
            for pipe in (False, True):
                for prog in (jax.jit(lambda x, p=pipe: run(x, p)),
                             make_chained(lambda x, p=pipe: run(x, p))):
                    t0 = time.perf_counter()
                    prog.lower(xs).compile()
                    print(
                        f"aot ({N}, {C}) pipe={pipe} "
                        f"{time.perf_counter()-t0:.0f}s",
                        flush=True,
                    )
            continue

        # on-device numerical agreement before timing
        print(f"compiling ({N}, {C})...", file=sys.stderr, flush=True)
        y0 = jax.jit(lambda x: run(x, False))(x)
        y1 = jax.jit(lambda x: run(x, True))(x)
        d = float(
            jnp.max(jnp.abs(y0.astype(jnp.float32) - y1.astype(jnp.float32)))
        )
        scale = float(jnp.max(jnp.abs(y0.astype(jnp.float32)))) or 1.0
        assert d / scale < 1e-2, f"pipe mismatch at (N={N}, C={C}): {d} / {scale}"

        ms = {}
        for pipe in (False, True):
            ms[pipe] = timeit(lambda x: run(x, pipe), x)
            totals[pipe] += ms[pipe]
        print(
            f"({N:>6}, {C:>2}) | {ms[False]:9.3f} | {ms[True]:9.3f} | "
            f"{ms[False] / ms[True]:.3f}x   (maxdiff {d:.2e})",
            flush=True,
        )
    if aot:
        print("aot precompile done (no timing)")
        return
    print(
        f"{'family sum':>14} | {MULTIPLICITY * totals[False]:9.3f} | "
        f"{MULTIPLICITY * totals[True]:9.3f} | "
        f"{totals[False] / totals[True]:.3f}x   (x{MULTIPLICITY} multiplicity)"
    )


if __name__ == "__main__":
    main()
