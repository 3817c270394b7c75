"""Measure linear-attention formulation variants on the real TPU.

The linear-attention family is the canonical UNet1d's hot spot (~39 ms of
a ~69 ms forward, BENCH_NOTES.md round-1 trace): the (N, 3*128) qkv
expansion dwarfs the (N, C<=16) activations it mixes. Round-1 findings:
the Pallas kernel wins standalone but loses in-model (fusion barrier);
the head-split einsum path pays ~6 ms/level-pair of relayout copies.

Variants measured here (all algebraically identical to the reference
unet1d.py:446-496 semantics):

  A. module path  — head-split (b,h,n,d) einsums (round-1 shipping code).
  B. maskedH      — no head transposes: per-head contractions run as full
                    (H, H) dots with a block-diagonal mask; w_out folded
                    into the context so the (N, H) head output is never
                    materialized.
  C. fused-exp    — B + broadcast-form qkv projection (C <= 16 so the
                    matmul is re-expressed as a fusible multiply-add
                    chain), unnormalized exp(k) with post-divided context:
                    raw q/k are never materialized in HBM, only their
                    exp() forms feeding the dots.
  P. pallas       — single-call fused kernel (ops/linear_attention.py).

Run: python scripts/bench_linattn_variants.py
"""

import functools
import time

import numpy as np


def timeit(fn, *args, n=30):
    import jax
    import jax.numpy as jnp

    sync = lambda o: float(jnp.sum(jax.tree_util.tree_leaves(o)[0]))
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / n * 1000


def make_variants():
    import jax
    import jax.numpy as jnp

    H = 128
    heads, dim_head = 4, 32

    def head_mask():
        i = np.arange(H)
        return jnp.asarray((i[:, None] // dim_head) == (i[None, :] // dim_head), jnp.float32)

    # ---------------- A: round-1 module path ---------------- #
    def variant_a(x, w_qkv, w_out, b_out, g, dtype):
        B, N, C = x.shape
        qkv = x.astype(dtype) @ w_qkv.astype(dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        sh = lambda t: t.reshape(B, N, heads, dim_head).transpose(0, 2, 1, 3)
        q, k, v = sh(q), sh(k), sh(v)
        q = jax.nn.softmax(q.astype(jnp.float32), axis=-1)
        k = jax.nn.softmax(k.astype(jnp.float32), axis=-2)
        q = (q * (dim_head**-0.5)).astype(dtype)
        k = k.astype(dtype)
        ctx = jnp.einsum("bhnd,bhne->bhde", k, v, preferred_element_type=jnp.float32)
        out = jnp.einsum("bhde,bhnd->bhne", ctx.astype(dtype), q,
                         preferred_element_type=jnp.float32)
        out = out.astype(dtype).transpose(0, 2, 1, 3).reshape(B, N, H)
        y = out @ w_out.astype(dtype) + b_out.astype(dtype)
        y32 = y.astype(jnp.float32)
        norm = jnp.sqrt(jnp.sum(jnp.square(y32), axis=-1, keepdims=True))
        return (y32 / jnp.maximum(norm, 1e-12) * g * (C**0.5)).astype(dtype)

    # ---------------- B: maskedH, w_out folded ---------------- #
    def variant_b(x, w_qkv, w_out, b_out, g, dtype):
        B, N, C = x.shape
        mask = head_mask()
        qkv = x.astype(dtype) @ w_qkv.astype(dtype)  # (B, N, 3H)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        # per-head softmax over dim_head channels: minor-dim reshape, no copy
        q = jax.nn.softmax(q.astype(jnp.float32).reshape(B, N, heads, dim_head), axis=-1)
        q = (q.reshape(B, N, H) * (dim_head**-0.5)).astype(dtype)
        # softmax over sequence, unnormalized: post-divide the context
        k32 = k.astype(jnp.float32)
        ek = jnp.exp(k32 - jnp.max(k32, axis=1, keepdims=True)).astype(dtype)
        s = jnp.sum(ek.astype(jnp.float32), axis=1)  # (B, H)
        ctx = jnp.einsum("bnd,bne->bde", ek, v, preferred_element_type=jnp.float32)
        ctx = ctx * mask[None] / jnp.maximum(s[:, :, None], 1e-30)
        w_fold = jnp.einsum("bde,ec->bdc", ctx, w_out.astype(jnp.float32))
        y = jnp.einsum("bnd,bdc->bnc", q, w_fold.astype(dtype),
                       preferred_element_type=jnp.float32) + b_out
        norm = jnp.sqrt(jnp.sum(jnp.square(y), axis=-1, keepdims=True))
        return (y / jnp.maximum(norm, 1e-12) * g * (C**0.5)).astype(dtype)

    # ---------------- C: B + fused-exp projections ---------------- #
    def variant_c(x, w_qkv, w_out, b_out, g, dtype):
        B, N, C = x.shape
        mask = head_mask()
        x32 = x.astype(jnp.float32)
        wq, wk, wv = jnp.split(w_qkv.astype(jnp.float32), 3, axis=-1)

        def proj(w):  # broadcast-form (B,N,C)@(C,H): fusible, no MXU tile pad
            return jnp.sum(x32[..., None] * w[None, None], axis=-2)

        q = proj(wq)  # traced twice below; XLA CSEs or recomputes in-fusion
        gmax = jnp.max(q.reshape(B, N, heads, dim_head), axis=-1)  # (B,N,h)
        eq = jnp.exp(q.reshape(B, N, heads, dim_head) - gmax[..., None])
        ssum = jnp.sum(eq, axis=-1)  # (B,N,h)
        eqn = (eq / jnp.maximum(ssum[..., None], 1e-30)).reshape(B, N, H)
        eqn = (eqn * (dim_head**-0.5)).astype(dtype)

        k = proj(wk)
        ek = jnp.exp(k - jnp.max(k, axis=1, keepdims=True)).astype(dtype)
        s = jnp.sum(ek.astype(jnp.float32), axis=1)  # (B,H)
        v = proj(wv).astype(dtype)

        ctx = jnp.einsum("bnd,bne->bde", ek, v, preferred_element_type=jnp.float32)
        ctx = ctx * mask[None] / jnp.maximum(s[:, :, None], 1e-30)
        w_fold = jnp.einsum("bde,ec->bdc", ctx, w_out.astype(jnp.float32))
        y = jnp.einsum("bnd,bdc->bnc", eqn, w_fold.astype(dtype),
                       preferred_element_type=jnp.float32) + b_out
        norm = jnp.sqrt(jnp.sum(jnp.square(y), axis=-1, keepdims=True))
        return (y / jnp.maximum(norm, 1e-12) * g * (C**0.5)).astype(dtype)

    return {"A:module": variant_a, "B:maskedH": variant_b, "C:fusedexp": variant_c}


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/dquartic_jax_cache")
    from dquartic_tpu.ops import linear_attention as la

    heads, dim_head = 4, 32
    H = heads * dim_head
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)

    # canonical level shapes: (N, C) down path, dim=4 dim_mults (1,2,2,3,3,4,4)
    shapes = [(40000, 4), (20000, 4), (10000, 8), (5000, 8), (2500, 12), (1250, 12), (625, 16)]
    variants = make_variants()

    print(f"{'shape':>14} | " + " | ".join(f"{k:>12}" for k in variants) + " |       pallas")
    totals = {k: 0.0 for k in list(variants) + ["pallas", "pallasT"]}
    for N, C in shapes:
        x = jnp.asarray(rng.normal(size=(34, N, C)).astype(np.float32)).astype(dtype)
        w_qkv = jnp.asarray(rng.normal(size=(C, 3 * H)).astype(np.float32) * 0.1)
        w_out = jnp.asarray(rng.normal(size=(H, C)).astype(np.float32) * 0.1)
        b_out = jnp.zeros((C,), jnp.float32)
        g = jnp.ones((C,), jnp.float32)

        ref = np.asarray(
            la.linear_attention_reference(x, w_qkv, w_out, b_out, g, heads, dim_head),
            dtype=np.float32,
        )
        row = []
        for name, fn in variants.items():
            jfn = jax.jit(functools.partial(fn, dtype=dtype))
            out = np.asarray(jfn(x, w_qkv, w_out, b_out, g), dtype=np.float32)
            err = np.max(np.abs(out - ref)) / (np.max(np.abs(ref)) + 1e-9)
            t = timeit(jfn, x, w_qkv, w_out, b_out, g)
            totals[name] += t
            row.append(f"{t:8.3f}ms e{err:.0e}")
        for pname, pimpl in (
            ("pallas", la.fused_linear_attention),
            ("pallasT", la.fused_linear_attention_t),
        ):
            pfn = jax.jit(
                lambda x, a, b, c, d, _f=pimpl: _f(x, a, b, c, d, heads=heads, dim_head=dim_head)
            )
            out = np.asarray(pfn(x, w_qkv, w_out, b_out, g), dtype=np.float32)
            perr = np.max(np.abs(out - ref)) / (np.max(np.abs(ref)) + 1e-9)
            tp = timeit(pfn, x, w_qkv, w_out, b_out, g)
            totals[pname] += tp
            row.append(f"{tp:8.3f}ms e{perr:.0e}")
        print(f"({N:6d},{C:3d}) | " + " | ".join(row))

    print("totals (x2 for down+up): " + ", ".join(f"{k}={2*v:.1f}ms" for k, v in totals.items()))


if __name__ == "__main__":
    main()
