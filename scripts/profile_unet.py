"""Profile one canonical UNet1d forward + micro-time the true-shape
components (rows = b*rt = 34). Tries jax.profiler first; falls back to
piecewise timing."""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/dquartic_jax_cache")

    def timeit(fn, *args, n=20):
        sync = lambda o: float(jnp.sum(jax.tree_util.tree_leaves(o)[0]))
        out = fn(*args)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        sync(out)
        return (time.perf_counter() - t0) / n * 1000

    # mid conv as matmul: (34, 30000) @ (30000, 10000) bf16
    a = jnp.ones((34, 30000), jnp.bfloat16)
    w = jnp.ones((30000, 10000), jnp.bfloat16)
    t = timeit(jax.jit(lambda a, w: a @ w), a, w)
    print(f"mid matmul (34,30000)@(30000,10000): {t:.2f} ms -> {600 / t:.0f} GB/s weight stream")

    # true-shape level-0 linattn via module path (B=34 rows after reshape)
    from dquartic_tpu.models.attention import LinearAttention

    x = jnp.ones((34, 40000, 4), jnp.bfloat16)
    la = LinearAttention(4, impl="xla", dtype=jnp.bfloat16)
    p = la.init(jax.random.PRNGKey(0), x)
    t = timeit(jax.jit(lambda p, x: la.apply(p, x)), p, x)
    print(f"linattn xla (34,40000,4): {t:.2f} ms")
    la_p = LinearAttention(4, impl="pallas", dtype=jnp.bfloat16)
    t = timeit(jax.jit(lambda p, x: la_p.apply(p, x)), p, x)
    print(f"linattn pallas (34,40000,4): {t:.2f} ms")

    # full forward again for the denominator
    from dquartic_tpu.models import UNet1d

    model = UNet1d(
        dim=4, channels=1, dim_mults=(1, 2, 2, 3, 3, 4, 4), conditional=True,
        init_cond_channels=1, attn_cond_channels=1, downsample_dim=40000,
        simple=True, dtype=jnp.bfloat16,
    )
    xx = jnp.ones((1, 34, 40000))
    tt = jnp.zeros((1,), jnp.int32)
    ac = jnp.ones((1, 34))
    params = model.init(jax.random.PRNGKey(0), xx, tt, xx, ac)
    fwd = jax.jit(lambda p, x: model.apply(p, x, tt, x, ac))
    t_full = timeit(fwd, params, xx, n=10)
    print(f"full forward: {t_full:.2f} ms")

    # attempt a profiler trace of 5 forwards
    try:
        import jax.profiler

        jax.profiler.start_trace("/tmp/unet_trace")
        for _ in range(5):
            out = fwd(params, xx)
        float(jnp.sum(out))
        jax.profiler.stop_trace()
        import glob
        files = glob.glob("/tmp/unet_trace/**/*.xplane.pb", recursive=True)
        print(f"trace captured: {files}")
    except Exception as e:
        print(f"profiler unavailable: {type(e).__name__}: {str(e)[:150]}")


if __name__ == "__main__":
    main()
