"""Fused transposed ResnetBlock kernel vs the flax module (interpret mode
on CPU; the same pallas_call compiles on TPU)."""

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
