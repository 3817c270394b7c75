"""Decompose the canonical UNet1d forward cost: per-component timings at
real shapes, vs the full forward. Guides kernel-fusion priorities."""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/dquartic_jax_cache")
    from dquartic_tpu.models import UNet1d
    from dquartic_tpu.models.attention import LinearAttention
    from dquartic_tpu.models.layers import ResnetBlock

    def timeit(fn, *args, n=10):
        sync = lambda o: float(jnp.sum(jax.tree_util.tree_leaves(o)[0]))
        out = fn(*args)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        sync(out)
        return (time.perf_counter() - t0) / n * 1000

    rows = 34  # b=1, rt=34
    time_dim = 16
    t_emb = jnp.ones((rows, time_dim), jnp.bfloat16)

    # per-level ResnetBlock + LinearAttention at canonical shapes
    level_shapes = [(40000, 4), (20000, 8), (10000, 8), (5000, 12), (2500, 12), (1250, 16), (625, 16)]
    total_res, total_lin = 0.0, 0.0
    for N, C in level_shapes:
        x = jnp.ones((rows, N, C), jnp.bfloat16)
        rb = ResnetBlock(C, time_emb_dim=time_dim, dtype=jnp.bfloat16)
        p = rb.init(jax.random.PRNGKey(0), x, t_emb)
        t_rb = timeit(jax.jit(lambda p, x: rb.apply(p, x, t_emb)), p, x)

        la_p = LinearAttention(C, impl="pallas", dtype=jnp.bfloat16)
        pp = la_p.init(jax.random.PRNGKey(0), x)
        t_lp = timeit(jax.jit(lambda p, x: la_p.apply(p, x)), pp, x)
        print(f"level N={N:>6} C={C:>2}: ResnetBlock {t_rb:7.2f} ms   LinAttn(pallas) {t_lp:7.2f} ms")
        total_res += t_rb
        total_lin += t_lp

    print(f"\nper fwd estimate: 4x resnet-sum={4 * total_res:.1f} ms (down2+up2), 2x linattn-sum={2 * total_lin:.1f} ms")

    # mid stack: ResnetBlock at (1, 34, 10000)
    xm = jnp.ones((1, 34, 10000), jnp.bfloat16)
    tm = jnp.ones((1, time_dim), jnp.bfloat16)
    rbm = ResnetBlock(10000, time_emb_dim=time_dim, dtype=jnp.bfloat16)
    pm = rbm.init(jax.random.PRNGKey(0), xm, tm)
    t_mid = timeit(jax.jit(lambda p, x: rbm.apply(p, x, tm)), pm, xm)
    print(f"mid ResnetBlock (1,34,10000): {t_mid:.2f} ms  (x2 per fwd)")

    # full forward
    model = UNet1d(
        dim=4, channels=1, dim_mults=(1, 2, 2, 3, 3, 4, 4), conditional=True,
        init_cond_channels=1, attn_cond_channels=1, downsample_dim=40000,
        simple=True, dtype=jnp.bfloat16,
    )
    x = jnp.ones((1, 34, 40000))
    t0_ = jnp.zeros((1,), jnp.int32)
    ac = jnp.ones((1, 34))
    params = model.init(jax.random.PRNGKey(0), x, t0_, x, ac)
    fwd = jax.jit(lambda p, x: model.apply(p, x, t0_, x, ac))
    t_full = timeit(fwd, params, x, n=5)
    print(f"full forward: {t_full:.2f} ms")

    model_x = model.clone(linear_attn_impl="xla")
    fwd_x = jax.jit(lambda p, x: model_x.apply(p, x, t0_, x, ac))
    t_full_x = timeit(fwd_x, params, x, n=5)
    print(f"full forward (xla linattn): {t_full_x:.2f} ms")


if __name__ == "__main__":
    main()
