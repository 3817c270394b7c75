"""Real-hardware smoke for the sequence-parallel linattn kernels.

Only one physical TPU chip is reachable in this environment, so the sp
kernels' MULTI-device numerics are pinned on the virtual CPU mesh
(tests/test_parallel.py sp tests). What CPU interpret mode cannot prove
is that Mosaic actually compiles the five sp kernels for TPU — this
script runs the full sp forward + backward through shard_map on a
1-device "sp" mesh (psums over a size-1 axis are identity, so the oracle
comparison is exact) on the real chip.

Run: PYTHONPATH=/root/repo:/root/.axon_site JAX_CACHE_DIR=/tmp/dquartic_jax_cache \
  python scripts/smoke_sp_tpu.py
"""

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    jax.config.update("jax_compilation_cache_dir", "/tmp/dquartic_jax_cache")
    from dquartic_tpu.ops.linear_attention import (
        fused_linear_attention_t,
        linear_attention_nr_reference,
    )

    C, heads, dim_head = 8, 4, 32
    H = heads * dim_head
    rng = np.random.default_rng(0)
    w_qkv = jnp.asarray(rng.normal(size=(C, 3 * H)).astype(np.float32) * 0.1)
    w_out = jnp.asarray(rng.normal(size=(H, C)).astype(np.float32) * 0.1)
    b_out = jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.1)
    g = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))
    g_pre = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(4, 8192, C)).astype(np.float32))

    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1), ("sp",))
    with jax.set_mesh(mesh):
        xs = jax.device_put(x, NamedSharding(mesh, P(None, "sp", None)))

        def f(xx):
            return fused_linear_attention_t(
                xx, w_qkv, w_out, b_out, g, heads, dim_head,
                g_pre=g_pre, residual=True, sp_axis="sp",
            )

        out = jax.jit(f)(xs)
        ref = linear_attention_nr_reference(
            x, w_qkv, w_out, b_out, g, g_pre, heads, dim_head
        )
        err_f = float(jnp.max(jnp.abs(out - ref)))
        print(f"sp forward on TPU: max err vs oracle = {err_f:.2e}")
        assert err_f < 3e-4 * float(jnp.max(jnp.abs(ref))) + 3e-5

        def loss_sp(xx):
            return jnp.sum(f(xx) ** 2)

        def loss_ref(xx):
            return jnp.sum(
                linear_attention_nr_reference(
                    xx, w_qkv, w_out, b_out, g, g_pre, heads, dim_head
                ) ** 2
            )

        gf = jax.jit(jax.grad(loss_sp))(xs)
        gr = jax.grad(loss_ref)(x)
        err_g = float(jnp.max(jnp.abs(gf - gr)))
        scale = float(jnp.max(jnp.abs(gr)))
        print(f"sp backward on TPU: max dx err vs oracle = {err_g:.2e} (scale {scale:.2e})")
        assert err_g < 2e-3 * scale + 2e-3
    print("sp kernels compile + run on real TPU: OK")


if __name__ == "__main__":
    main()
