"""Fused transposed ResnetBlock kernel vs the flax module (interpret mode
on CPU; the same pallas_call compiles on TPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dquartic_tpu.models.layers import ResnetBlock
from dquartic_tpu.ops.fused_resnet import (
    fused_resnet_block_t,
    resnet_block_t_reference,
)


def _params_from_module(b, c_in, c_out, n, time_dim, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(b, n, c_in)).astype(np.float32))
    t_emb = jnp.asarray(rng.normal(size=(b, time_dim)).astype(np.float32))
    module = ResnetBlock(c_out, time_emb_dim=time_dim)
    params = module.init(jax.random.PRNGKey(seed), x, t_emb)
    return module, params, x, t_emb


def _kernel_args(params, t_emb, c_out):
    p = params["params"]
    mlp = p["mlp"]
    h = jax.nn.silu(t_emb) @ mlp["kernel"] + mlp["bias"]
    scale, shift = jnp.split(h, 2, axis=-1)
    res = p.get("res_conv")
    return dict(
        w1=p["block1"]["proj"]["kernel"],
        b1=p["block1"]["proj"]["bias"],
        g1=p["block1"]["norm"]["g"],
        scale=scale,
        shift=shift,
        w2=p["block2"]["proj"]["kernel"],
        b2=p["block2"]["proj"]["bias"],
        g2=p["block2"]["norm"]["g"],
        w_res=res["kernel"] if res is not None else None,
        b_res=res["bias"] if res is not None else None,
    )


@pytest.mark.parametrize("c_in,c_out", [(4, 4), (4, 8), (12, 16)])
def test_kernel_matches_flax_module(c_in, c_out):
    b, n, time_dim = 3, 640, 16
    module, params, x, t_emb = _params_from_module(b, c_in, c_out, n, time_dim)
    want = module.apply(params, x, t_emb)

    args = _kernel_args(params, t_emb, c_out)
    got_t = fused_resnet_block_t(
        jnp.swapaxes(x, 1, 2), block_n=256, interpret=True, **args
    )
    got = jnp.swapaxes(got_t, 1, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_kernel_matches_oracle_nondivisible_n():
    """N not a multiple of block_n: padded tail must not leak into conv."""
    b, c, n = 2, 8, 500
    rng = np.random.default_rng(1)
    x_t = jnp.asarray(rng.normal(size=(b, c, n)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(3, c, c)).astype(np.float32) * 0.2)
    w2 = jnp.asarray(rng.normal(size=(3, c, c)).astype(np.float32) * 0.2)
    b1 = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    b2 = jnp.zeros((c,), jnp.float32)
    g1 = jnp.asarray(rng.uniform(0.5, 1.5, (c,)).astype(np.float32))
    g2 = jnp.ones((c,), jnp.float32)
    got = fused_resnet_block_t(
        x_t, w1, b1, g1, None, None, w2, b2, g2, None, None,
        block_n=256, interpret=True,
    )
    want = resnet_block_t_reference(
        x_t, w1, b1, g1, None, None, w2, b2, g2, None, None
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_kernel_bf16():
    b, c, n = 2, 8, 512
    rng = np.random.default_rng(2)
    x_t = jnp.asarray(rng.normal(size=(b, c, n)).astype(np.float32), jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(3, c, c)).astype(np.float32) * 0.2)
    w2 = jnp.asarray(rng.normal(size=(3, c, c)).astype(np.float32) * 0.2)
    bias = jnp.zeros((c,), jnp.float32)
    g = jnp.ones((c,), jnp.float32)
    sc = jnp.asarray(rng.normal(size=(b, c)).astype(np.float32))
    sh = jnp.asarray(rng.normal(size=(b, c)).astype(np.float32))
    got = fused_resnet_block_t(
        x_t, w1, bias, g, sc, sh, w2, bias, g, None, None,
        block_n=256, interpret=True,
    )
    assert got.dtype == jnp.bfloat16
    want = resnet_block_t_reference(
        x_t, w1, bias, g, sc, sh, w2, bias, g, None, None
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), rtol=0.1, atol=0.1
    )


@pytest.mark.parametrize(
    "c_in,c_out,n,block_n,film",
    [(4, 8, 640, 256, True), (8, 8, 500, 256, True), (6, 4, 300, 256, False)],
)
def test_kernel_grads_match_oracle(c_in, c_out, n, block_n, film):
    """The recompute-based backward Pallas kernel (custom_vjp) produces
    the same gradients as jax.grad through the XLA oracle — for x, both
    conv kernels/biases, both RMSNorm gains, FiLM scale/shift, and the
    1x1 residual conv. Multi-block grids exercise the halo paths."""
    b = 2
    rng = np.random.default_rng(11)

    def mk(shape, scale=0.3):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32) * scale)

    x_t = mk((b, c_in, n), 1.0)
    args = dict(
        w1=mk((3, c_in, c_out)),
        b1=mk((c_out,), 0.1),
        g1=jnp.asarray(rng.uniform(0.5, 1.5, (c_out,)).astype(np.float32)),
        scale=mk((b, c_out), 0.2) if film else None,
        shift=mk((b, c_out), 0.2) if film else None,
        w2=mk((3, c_out, c_out)),
        b2=mk((c_out,), 0.1),
        g2=jnp.asarray(rng.uniform(0.5, 1.5, (c_out,)).astype(np.float32)),
        w_res=mk((1, c_in, c_out)) if c_in != c_out else None,
        b_res=mk((c_out,), 0.1) if c_in != c_out else None,
    )
    order = ["w1", "b1", "g1", "scale", "shift", "w2", "b2", "g2", "w_res", "b_res"]
    diff = {k: v for k, v in args.items() if v is not None}

    def loss_kernel(x, d):
        full = {k: d.get(k, None) for k in order}
        y = fused_resnet_block_t(x, block_n=block_n, interpret=True, **full)
        return jnp.sum(jnp.sin(y))  # non-trivial cotangent

    def loss_ref(x, d):
        full = {k: d.get(k, None) for k in order}
        y = resnet_block_t_reference(x, **full)
        return jnp.sum(jnp.sin(y))

    (gx, gd) = jax.grad(loss_kernel, argnums=(0, 1))(x_t, diff)
    (rx, rd) = jax.grad(loss_ref, argnums=(0, 1))(x_t, diff)

    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), rtol=2e-4, atol=2e-4)
    for k in rd:
        np.testing.assert_allclose(
            np.asarray(gd[k]), np.asarray(rd[k]), rtol=2e-4, atol=2e-4,
            err_msg=f"grad mismatch for {k}",
        )


def test_kernel_grads_bf16_activations():
    """bf16 activations with f32 params (the training configuration):
    dx comes back bf16 and close to the f32 oracle; param grads stay f32."""
    b, c, n = 2, 8, 512
    rng = np.random.default_rng(13)
    x32 = rng.normal(size=(b, c, n)).astype(np.float32)
    x_t = jnp.asarray(x32, jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(3, c, c)).astype(np.float32) * 0.2)
    w2 = jnp.asarray(rng.normal(size=(3, c, c)).astype(np.float32) * 0.2)
    bias = jnp.zeros((c,), jnp.float32)
    g = jnp.ones((c,), jnp.float32)

    def loss(fn, x, w1_, w2_):
        y = fn(x, w1_, bias, g, None, None, w2_, bias, g, None, None)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    k = functools.partial(
        lambda x, a, b_: fused_resnet_block_t(
            x, a, bias, g, None, None, b_, bias, g, None, None,
            block_n=256, interpret=True,
        )
    )
    gx, gw1, gw2 = jax.grad(
        lambda x, a, b_: jnp.sum(k(x, a, b_).astype(jnp.float32) ** 2),
        argnums=(0, 1, 2),
    )(x_t, w1, w2)
    rx, rw1, rw2 = jax.grad(
        lambda x, a, b_: jnp.sum(
            resnet_block_t_reference(
                x.astype(jnp.float32), a, bias, g, None, None, b_, bias, g,
                None, None,
            ) ** 2
        ),
        argnums=(0, 1, 2),
    )(x_t, w1, w2)
    assert gx.dtype == jnp.bfloat16
    assert gw1.dtype == jnp.float32
    # bf16 activations quantize y (and so the 2*y cotangent) to ~0.4%
    # per element; weight grads sum ~1k columns with cancellation, so the
    # honest comparison is direction + magnitude, not elementwise.
    for got, ref in [(gx, rx), (gw1, rw1), (gw2, rw2)]:
        a = np.asarray(got, np.float32).ravel()
        r = np.asarray(ref, np.float32).ravel()
        cos = float(a @ r / (np.linalg.norm(a) * np.linalg.norm(r) + 1e-12))
        rel = float(np.linalg.norm(a - r) / (np.linalg.norm(r) + 1e-12))
        assert cos > 0.999, f"cosine {cos}"
        assert rel < 0.05, f"relative norm error {rel}"


def test_unet_fused_grads_match_unfused():
    """Model-level gradient parity: jax.grad through the fused
    transposed-resident path equals the unfused module path for every
    parameter (same tree) — the property that makes fused_resnet a valid
    *training* configuration."""
    from dquartic_tpu.models import UNet1d

    # One level: per-op gradient parity across dims is covered by
    # test_kernel_grads_match_oracle, and forward parity at two levels by
    # test_unet_fused_path_matches_unfused; the model-level property here
    # (grads flow through the recompute custom_vjp in situ) is
    # level-count-independent, and each level doubles the backward
    # program this test lowers twice on the 1-core host.
    kw = dict(
        dim=4, channels=1, dim_mults=(1,), conditional=True,
        init_cond_channels=1, attn_cond_channels=1, downsample_dim=32,
        simple=True,
    )
    rng = np.random.default_rng(5)
    b, rt, mz = 2, 3, 32
    x = jnp.asarray(rng.uniform(0, 1, (b, rt, mz)).astype(np.float32))
    t = jnp.asarray([5, 9], jnp.int32)
    ms1 = jnp.asarray(rng.uniform(0, 1, (b, rt)).astype(np.float32))
    target = jnp.asarray(rng.normal(size=(b, rt, mz)).astype(np.float32))

    m_ref = UNet1d(**kw)
    m_fused = UNet1d(**kw, fused_resnet=True)
    params = jax.jit(m_ref.init)(jax.random.PRNGKey(0), x, t, x, ms1)

    def loss(m):
        def f(p):
            out = m.apply(p, x, t, x, ms1)
            return jnp.mean((out - target) ** 2)
        return f

    g_ref = jax.jit(jax.grad(loss(m_ref)))(params)
    g_fused = jax.jit(jax.grad(loss(m_fused)))(params)

    flat_r = jax.tree_util.tree_flatten_with_path(g_ref)[0]
    flat_f = jax.tree_util.tree_flatten_with_path(g_fused)[0]
    assert len(flat_r) == len(flat_f)
    for (kr, vr), (kf, vf) in zip(flat_r, flat_f):
        assert kr == kf
        np.testing.assert_allclose(
            np.asarray(vf), np.asarray(vr), rtol=5e-4, atol=5e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(kr)}",
        )


def test_unet_fused_train_step():
    """One Trainer step on the fused model: loss finite, params move."""
    from dquartic_tpu.core import DDIMProcess, make_schedule
    from dquartic_tpu.models import UNet1d
    from dquartic_tpu.train import Trainer

    # One level (see test_unet_fused_grads_match_unfused for why).
    model = UNet1d(
        dim=4, channels=1, dim_mults=(1,), conditional=True,
        init_cond_channels=1, attn_cond_channels=1, downsample_dim=32,
        simple=True, fused_resnet=True,
    )
    process = DDIMProcess(schedule=make_schedule(10, "cosine", "eps"))
    trainer = Trainer(model, process, seed=0)
    rng = np.random.default_rng(6)
    batch = {
        "ms2_1": rng.uniform(0, 1, (2, 3, 32)).astype(np.float32),
        "ms1_1": rng.uniform(0, 1, (2, 3)).astype(np.float32),
        "ms2_2": rng.uniform(0, 1, (2, 3, 32)).astype(np.float32),
        "ms1_2": rng.uniform(0, 1, (2, 3)).astype(np.float32),
    }
    state = trainer.init_state(batch)
    # Materialize before the step: train_step donates state, which
    # invalidates the original param buffers.
    before = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    state2, metrics = trainer.train_step(
        state, batch, jnp.float32(1e-3), jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(metrics["loss"]))
    after = np.asarray(jax.tree_util.tree_leaves(state2.params)[0])
    assert not np.allclose(before, after)


def test_unet_shipping_config_fused_plus_int8():
    """The bench flagship / CLI shipping inference config — fused_resnet
    AND quantize_mid together — stays close to the plain model (the two
    optimizations touch disjoint blocks but must compose in one apply)."""
    from dquartic_tpu.models import UNet1d
    from dquartic_tpu.ops.quantization import quantize_mid_block_params

    model = UNet1d(
        dim=4, channels=1, dim_mults=(1, 2), conditional=True,
        init_cond_channels=1, attn_cond_channels=1, downsample_dim=64,
        simple=True,
    )
    rng = np.random.default_rng(7)
    b, rt, mz = 2, 3, 64
    x = jnp.asarray(rng.normal(size=(b, rt, mz)).astype(np.float32))
    t = jnp.asarray([3, 11], jnp.int32)
    ms1 = jnp.asarray(rng.uniform(size=(b, rt)).astype(np.float32))

    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, t, x, ms1)
    out_ref = jax.jit(model.apply)(params, x, t, x, ms1)

    ship = model.clone(quantize_mid=True, fused_resnet=True)
    qparams = quantize_mid_block_params(params)
    out_ship = jax.jit(ship.apply)(qparams, x, t, x, ms1)

    a = np.asarray(out_ref).ravel()
    s = np.asarray(out_ship).ravel()
    cos = float(a @ s / (np.linalg.norm(a) * np.linalg.norm(s) + 1e-12))
    rel = float(np.linalg.norm(a - s) / (np.linalg.norm(a) + 1e-12))
    assert cos > 0.999, f"cosine {cos}"
    assert rel < 0.05, f"relative error {rel}"


def test_unet_fused_path_matches_unfused():
    """The transposed-resident inference path (fused_resnet=True) declares
    an identical parameter tree and computes the same function as the
    training path."""
    from dquartic_tpu.models import UNet1d

    kw = dict(
        dim=4, channels=1, dim_mults=(1, 2), conditional=True,
        init_cond_channels=1, attn_cond_channels=1, downsample_dim=32,
        simple=True,
    )
    rng = np.random.default_rng(3)
    b, rt, mz = 2, 3, 32
    x = jnp.asarray(rng.uniform(0, 1, (b, rt, mz)).astype(np.float32))
    t = jnp.asarray([5, 9], jnp.int32)
    ms1 = jnp.asarray(rng.uniform(0, 1, (b, rt)).astype(np.float32))

    m_ref = UNet1d(**kw)
    m_fused = UNet1d(**kw, fused_resnet=True)
    params = jax.jit(m_ref.init)(jax.random.PRNGKey(0), x, t, x, ms1)
    p2 = jax.eval_shape(m_fused.init, jax.random.PRNGKey(0), x, t, x, ms1)

    flat_ref = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_fused = jax.tree_util.tree_flatten_with_path(p2)[0]
    assert [(k, v.shape) for k, v in flat_ref] == [
        (k, v.shape) for k, v in flat_fused
    ], "fused path must be checkpoint-compatible"

    out_ref = jax.jit(m_ref.apply)(params, x, t, x, ms1)
    out_fused = jax.jit(m_fused.apply)(params, x, t, x, ms1)
    assert out_fused.shape == out_ref.shape
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_ref), rtol=3e-5, atol=3e-5
    )
