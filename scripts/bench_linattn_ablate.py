"""Round-4 linattn kernel ablation: where do the non-MXU cycles go?

Parameterized copy of `_kernel_ab_t` (ops/linear_attention.py) with
individually removable cost components. Ablated variants are numerically
WRONG — this measures timing only, to locate the 52%-MXU gap
(VERDICT r3 next-round #1) before rewriting the shipping kernel.

Run: PYTHONPATH=/root/repo:/root/.axon_site JAX_CACHE_DIR=/tmp/dquartic_jax_cache \
  python scripts/bench_linattn_ablate.py
"""

import functools
import time

import numpy as np

ROWS = 34
LEVELS = [(40000, 4), (10000, 8)]
_NEG_INF = -1e30


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/tmp/dquartic_jax_cache")
    heads, dim_head = 4, 32
    H = heads * dim_head

    def _vmem(shape, index_map=None):
        return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)

    def _head_mask():
        i = jax.lax.broadcasted_iota(jnp.int32, (H, H), 0)
        j = jax.lax.broadcasted_iota(jnp.int32, (H, H), 1)
        return ((i // dim_head) == (j // dim_head)).astype(jnp.float32)

    def _prenorm(x, gpre, channels):
        rr = jnp.maximum(
            jnp.sqrt(jnp.sum(jnp.square(x), axis=0, keepdims=True)), 1e-12
        )
        return x / rr * (gpre * (channels**0.5))

    def kernel(
        x_ref, wq_ref, wk_ref, wv_ref, woutT_ref, bout_ref, g_ref, gpre_ref,
        o_ref, m_ref, s_ref, acc_ref, cw_ref,
        *, block_n, seq_len, channels,
        no_exp, no_max, narrow_mask, pin_out, no_ssum, no_slabsm,
        bf16_proj,
    ):
        phase = pl.program_id(1)
        j = pl.program_id(2)
        num_blocks = pl.num_programs(2)
        cd = jnp.bfloat16

        @pl.when((phase == 0) & (j == 0))
        def _():
            m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
            s_ref[...] = jnp.zeros_like(s_ref)
            acc_ref[...] = jnp.zeros_like(acc_ref)

        x_raw = x_ref[0].astype(jnp.float32)
        x = _prenorm(x_raw, gpre_ref[...], channels)

        pd = jnp.bfloat16 if bf16_proj else jnp.float32

        @pl.when(phase == 0)
        def _():
            k = jnp.dot(wk_ref[...].astype(pd), x.astype(pd),
                        preferred_element_type=jnp.float32)
            if narrow_mask:
                col = j * block_n + jax.lax.broadcasted_iota(
                    jnp.int32, (1, block_n), 1)
                k = jnp.where(col < seq_len, k, _NEG_INF)
            else:
                col = j * block_n + jax.lax.broadcasted_iota(
                    jnp.int32, (H, block_n), 1)
                k = jnp.where(col < seq_len, k, _NEG_INF)

            m_old, s_old, acc_old = m_ref[...], s_ref[...], acc_ref[...]
            if no_max:
                m_new = m_old
                alpha = 1.0
                shifted = k
            else:
                m_new = jnp.maximum(m_old, jnp.max(k, axis=1, keepdims=True))
                alpha = jnp.exp(m_old - m_new)
                shifted = k - m_new
            p = shifted if no_exp else jnp.exp(shifted)
            if no_ssum:
                s_new = s_old
            else:
                s_new = s_old * alpha + jnp.sum(p, axis=1, keepdims=True)
            a = jax.lax.dot_general(
                p.astype(cd), x.astype(cd), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m_ref[...] = m_new
            s_ref[...] = s_new
            acc_ref[...] = acc_old * alpha + a
            if not pin_out:
                o_ref[0] = jnp.zeros_like(o_ref[0])

            @pl.when(j == num_blocks - 1)
            def _():
                mask = _head_mask()
                ctx = jax.lax.dot_general(
                    acc_ref[...], wv_ref[...].astype(jnp.float32),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                ctx = ctx * mask / jnp.maximum(s_ref[...], 1e-30)
                cw_ref[...] = jax.lax.dot_general(
                    woutT_ref[...].astype(jnp.float32), ctx,
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

        @pl.when(phase == 1)
        def _():
            q = jnp.dot(wq_ref[...].astype(pd), x.astype(pd),
                        preferred_element_type=jnp.float32)
            if no_slabsm:
                qn = q * (dim_head**-0.5)
            else:
                gmax = jnp.max(q, axis=0, keepdims=True)
                eq = q if no_exp else jnp.exp(q - gmax)
                slabs = []
                for h in range(heads):
                    slab = eq[h * dim_head : (h + 1) * dim_head]
                    ssum = jnp.sum(slab, axis=0, keepdims=True)
                    slabs.append(slab / jnp.maximum(ssum, 1e-30))
                qn = jnp.concatenate(slabs, axis=0) * (dim_head**-0.5)
            y = jnp.dot(cw_ref[...].astype(cd), qn.astype(cd),
                        preferred_element_type=jnp.float32)
            y = y + bout_ref[...]
            norm = jnp.sqrt(jnp.sum(jnp.square(y), axis=0, keepdims=True))
            y = y / jnp.maximum(norm, 1e-12) * g_ref[...] * (channels**0.5)
            y = y + x_raw
            o_ref[0] = y.astype(o_ref.dtype)

    def build(N, C, block_n=4096, **flags):
        for f in ("no_exp", "no_max", "narrow_mask", "pin_out", "no_ssum",
                  "no_slabsm", "bf16_proj"):
            flags.setdefault(f, False)
        np_ = -(-max(N, block_n) // block_n) * block_n
        nb = np_ // block_n
        pin_out = flags.get("pin_out", False)

        def run(xt, wq, wk, wv, woutT, b2, g2, gp2):
            kern = functools.partial(
                kernel, block_n=block_n, seq_len=N, channels=C, **flags)
            if pin_out:
                out_map = lambda i, p, j: (i, 0, j * p)
            else:
                out_map = lambda i, p, j: (i, 0, j)
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((ROWS, C, np_), jnp.bfloat16),
                grid=(ROWS, 2, nb),
                in_specs=[
                    _vmem((1, C, block_n), lambda i, p, j: (i, 0, j)),
                    _vmem((H, C), lambda i, p, j: (0, 0)),
                    _vmem((H, C), lambda i, p, j: (0, 0)),
                    _vmem((H, C), lambda i, p, j: (0, 0)),
                    _vmem((C, H), lambda i, p, j: (0, 0)),
                    _vmem((C, 1), lambda i, p, j: (0, 0)),
                    _vmem((C, 1), lambda i, p, j: (0, 0)),
                    _vmem((C, 1), lambda i, p, j: (0, 0)),
                ],
                out_specs=_vmem((1, C, block_n), out_map),
                scratch_shapes=[
                    pltpu.VMEM((H, 1), jnp.float32),
                    pltpu.VMEM((H, 1), jnp.float32),
                    pltpu.VMEM((H, C), jnp.float32),
                    pltpu.VMEM((C, H), jnp.float32),
                ],
            )(xt, wq, wk, wv, woutT, b2, g2, gp2)

        return run

    def timeit(fn, *args, n=30, chain=10):
        @jax.jit
        def chained(xt, *rest):
            for _ in range(chain):
                xt = fn(xt, *rest).astype(xt.dtype)
            return xt

        out = chained(*args)
        float(jnp.sum(out.astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(n):
            out = chained(*args)
        float(jnp.sum(out.astype(jnp.float32)))
        return (time.perf_counter() - t0) / n / chain * 1000

    rng = np.random.default_rng(0)
    CASES = [
        ("baseline", {}),
        ("pin_out", dict(pin_out=True)),
        ("narrow_mask", dict(narrow_mask=True)),
        ("no_max", dict(no_max=True)),
        ("no_exp", dict(no_exp=True)),
        ("no_ssum", dict(no_ssum=True)),
        ("no_slabsm", dict(no_slabsm=True)),
        ("all_vpu_off", dict(no_max=True, no_exp=True, no_ssum=True,
                             no_slabsm=True, narrow_mask=True, pin_out=True)),
        ("pin+narrow", dict(pin_out=True, narrow_mask=True)),
        ("ship-r4", dict(pin_out=True, narrow_mask=True, no_max=True)),
        ("bf16_proj", dict(bf16_proj=True)),
        ("ship+bf16p", dict(pin_out=True, narrow_mask=True, no_max=True,
                            bf16_proj=True)),
        ("mxu-only", dict(no_max=True, no_exp=True, no_ssum=True,
                          no_slabsm=True, narrow_mask=True, pin_out=True,
                          bf16_proj=True)),
        ("block8192", dict(block_n=8192)),
        ("block2048", dict(block_n=2048)),
    ]
    for N, C in LEVELS:
        xt = jnp.asarray(rng.normal(size=(ROWS, C, N)), jnp.bfloat16)
        block = 4096
        np_full = -(-N // block) * block
        wq = jnp.asarray(rng.normal(size=(H, C)) * C**-0.5, jnp.bfloat16)
        wk = jnp.asarray(rng.normal(size=(H, C)) * C**-0.5, jnp.bfloat16)
        wv = jnp.asarray(rng.normal(size=(H, C)) * C**-0.5, jnp.bfloat16)
        woutT = jnp.asarray(rng.normal(size=(C, H)) * H**-0.5, jnp.bfloat16)
        b2 = jnp.zeros((C, 1), jnp.float32)
        g2 = jnp.ones((C, 1), jnp.float32)
        gp2 = jnp.ones((C, 1), jnp.float32)
        print(f"--- (N={N}, C={C}) ---")
        for label, flags in CASES:
            bn = flags.pop("block_n", 4096)
            np_ = -(-max(N, bn) // bn) * bn
            xp = jnp.pad(xt, ((0, 0), (0, 0), (0, np_ - N)))
            run = build(N, C, block_n=bn, **flags)
            ms = timeit(run, xp, wq, wk, wv, woutT, b2, g2, gp2)
            print(f"  {label:>12}: {ms:7.3f} ms")


if __name__ == "__main__":
    main()
