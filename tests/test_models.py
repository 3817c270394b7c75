"""Shape, determinism and gradient tests for the denoiser networks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dquartic_tpu.models import CustomTransformer, UNet1d, rope_rotate
from dquartic_tpu.models.attention import LinearAttention
from dquartic_tpu.models.layers import Downsample, ResnetBlock, Upsample


TINY = dict(
    dim=4,
    channels=1,
    dim_mults=(1, 2),
    conditional=True,
    init_cond_channels=1,
    attn_cond_channels=1,
    downsample_dim=32,
    simple=True,
)


def init_unet(config, b=2, rt=6, mz=32, ms1_2d=False):
    model = UNet1d(**config)
    key = jax.random.PRNGKey(0)
    x = jnp.ones((b, rt, mz))
    t = jnp.zeros((b,), jnp.int32)
    ic = jnp.ones((b, rt, mz)) * 0.5
    ac = jnp.ones((b, rt, 8)) if ms1_2d else jnp.ones((b, rt))
    # jitted init: eager per-op dispatch dominates on the 1-core host and
    # the persistent cache makes repeat suite runs free
    params = jax.jit(model.init)(key, x, t, ic, ac)
    return model, params, (x, t, ic, ac)


@pytest.fixture(scope="module")
def tiny_unet():
    """One shared TINY model + params + jitted apply for the read-only
    tests (one trace/compile instead of one per test — the 1-core bench
    host makes per-test eager applies the dominant suite cost)."""
    model, params, args = init_unet(TINY)
    return model, params, args, jax.jit(model.apply)


def test_unet_shapes_simple(tiny_unet):
    model, params, (x, t, ic, ac), japply = tiny_unet
    out = japply(params, x, t, ic, ac)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_unet_param_count_independent_of_rt():
    """RT rows share all conv weights; param tree must not depend on rt."""
    model = UNet1d(**TINY)

    def shapes(rt):
        tree = jax.eval_shape(
            model.init, jax.random.PRNGKey(0), jnp.ones((2, rt, 32)),
            jnp.zeros((2,), jnp.int32), jnp.ones((2, rt, 32)), jnp.ones((2, rt)),
        )
        return jax.tree_util.tree_map(lambda a: a.shape, tree)

    assert shapes(6) == shapes(9)


def test_unet_2d_ms1_condition():
    cfg = dict(TINY)
    model, params, (x, t, ic, ac) = init_unet(cfg, ms1_2d=True)
    out = jax.jit(model.apply)(params, x, t, ic, ac)
    assert out.shape == x.shape


def test_unet_unconditional():
    cfg = dict(TINY, conditional=False)
    model = UNet1d(**cfg)
    x = jnp.ones((1, 4, 32))
    t = jnp.zeros((1,), jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, t)
    out = jax.jit(model.apply)(params, x, t)
    assert out.shape == x.shape


def test_unet_nonsimple_path():
    cfg = dict(TINY, simple=False, tfer_depth=2)
    model, params, (x, t, ic, ac) = init_unet(cfg)
    out = jax.jit(model.apply)(params, x, t, ic, ac)
    assert out.shape == x.shape


def test_unet_canonical_mult_pattern_shapes():
    """The canonical 7-level dim_mults with a reduced m/z axis."""
    cfg = dict(
        dim=4,
        channels=1,
        dim_mults=(1, 2, 2, 3, 3, 4, 4),
        conditional=True,
        init_cond_channels=1,
        attn_cond_channels=1,
        downsample_dim=640,
        simple=True,
    )
    # Trace-only: the 7-level shape contract (downsampled_n bookkeeping,
    # skip concat dims) is fully checked by abstract evaluation; actually
    # compiling the 7-level program costs ~17 s on this host while
    # numerics at canonical depth are exercised on-TPU (BENCH_NOTES
    # convergence runs) and at 2 levels throughout this suite.
    model = UNet1d(**cfg)
    b, rt, mz = 1, 4, 320
    x = jax.ShapeDtypeStruct((b, rt, mz), jnp.float32)
    t = jax.ShapeDtypeStruct((b,), jnp.int32)
    ac = jax.ShapeDtypeStruct((b, rt), jnp.float32)
    params = jax.eval_shape(model.init, jax.random.PRNGKey(0), x, t, x, ac)
    out = jax.eval_shape(model.apply, params, x, t, x, ac)
    assert out.shape == (1, 4, 320)


def test_unet_conditioning_matters(tiny_unet):
    model, params, (x, t, ic, ac), japply = tiny_unet
    out1 = japply(params, x, t, ic, ac)
    out2 = japply(params, x, t, ic * 2.0, ac)
    assert not np.allclose(np.asarray(out1), np.asarray(out2))
    out3 = japply(params, x, t, ic, ac * 3.0)
    assert not np.allclose(np.asarray(out1), np.asarray(out3))


def test_unet_time_matters(tiny_unet):
    model, params, (x, t, ic, ac), japply = tiny_unet
    out1 = japply(params, x, t, ic, ac)
    out2 = japply(params, x, jnp.full_like(t, 500), ic, ac)
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


def test_unet_gradients_flow(tiny_unet):
    model, params, (x, t, ic, ac), _ = tiny_unet

    def loss_fn(p):
        out = model.apply(p, x, t, ic, ac)
        return jnp.mean(out**2)

    grads = jax.jit(jax.grad(loss_fn))(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    nonzero = sum(bool(np.any(np.asarray(g) != 0)) for g in leaves)
    assert nonzero > 0.8 * len(leaves)


def test_unet_batch_consistency(tiny_unet):
    """Batched forward must equal per-sample forwards (the reference cannot
    do batch>1 at all; ours must be consistent)."""
    model, params, (x0, _, _, _), japply = tiny_unet
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=x0.shape).astype(np.float32))
    ic = jnp.asarray(rng.normal(size=x0.shape).astype(np.float32))
    ac = jnp.asarray(rng.normal(size=x0.shape[:2]).astype(np.float32))
    t = jnp.array([3, 700], jnp.int32)

    full = japply(params, x, t, ic, ac)
    single_apply = jax.jit(model.apply)
    for i in range(2):
        single = single_apply(params, x[i : i + 1], t[i : i + 1], ic[i : i + 1], ac[i : i + 1])
        np.testing.assert_allclose(np.asarray(full[i]), np.asarray(single[0]), rtol=2e-4, atol=1e-5)


def test_rope_matches_manual():
    """rope_rotate == the rotary_embedding_torch formula, written out
    longhand with explicit pair rotation."""
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 3, 5, 32)).astype(np.float32)
    rot_dim = 16
    out = np.asarray(rope_rotate(jnp.asarray(x), rot_dim))

    inv_freq = 1.0 / (10000.0 ** (np.arange(0, rot_dim, 2) / rot_dim))
    n = x.shape[-2]
    expected = x.copy()
    for pos in range(n):
        for j, f in enumerate(inv_freq):
            theta = pos * f
            c, s = np.cos(theta), np.sin(theta)
            a = x[..., pos, 2 * j].copy()
            b = x[..., pos, 2 * j + 1].copy()
            expected[..., pos, 2 * j] = a * c - b * s
            expected[..., pos, 2 * j + 1] = a * s + b * c
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-6)
    # passthrough of un-rotated tail
    np.testing.assert_array_equal(out[..., rot_dim:], x[..., rot_dim:])


def test_linear_attention_shapes_and_norm():
    m = LinearAttention(dim=8, heads=2, dim_head=4)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(3, 16, 8)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out.shape == x.shape


def test_down_up_sample_lengths():
    x = jnp.ones((2, 16, 4))
    d = Downsample(8)
    pd = d.init(jax.random.PRNGKey(0), x)
    y = d.apply(pd, x)
    assert y.shape == (2, 8, 8)
    u = Upsample(4)
    pu = u.init(jax.random.PRNGKey(0), y)
    z = u.apply(pu, y)
    assert z.shape == (2, 16, 4)


def test_resnet_block_residual_identity_at_zero_weights():
    """With all-zero params the block must reduce to the residual path."""
    m = ResnetBlock(dim_out=4, time_emb_dim=8)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 4)).astype(np.float32))
    t = jnp.zeros((2, 8))
    params = m.init(jax.random.PRNGKey(0), x, t)
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    out = m.apply(zeros, x, t)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_custom_transformer_shapes():
    m = CustomTransformer(input_dim=64, hidden_dim=32, num_heads=2, num_layers=2)
    x = jnp.ones((2, 6, 64))
    t = jnp.zeros((2,), jnp.int32)
    ms1 = jnp.ones((2, 6))
    params = jax.jit(m.init)(jax.random.PRNGKey(0), x, t, None, ms1)
    japply = jax.jit(m.apply)
    out = japply(params, x, t, None, ms1)
    assert out.shape == x.shape
    # conditioning must matter
    out2 = japply(params, x, t, None, ms1 * 5.0)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_unet_bf16_compute():
    cfg = dict(TINY, dtype=jnp.bfloat16)
    model, params, (x, t, ic, ac) = init_unet(cfg)
    out = jax.jit(model.apply)(params, x, t, ic, ac)
    assert np.isfinite(np.asarray(out, dtype=np.float32)).all()


def test_remat_blocks_matches_non_remat():
    """remat_blocks must not change outputs or gradients."""
    cfg = dict(TINY)
    model_a = UNet1d(**cfg)
    model_b = UNet1d(**cfg, remat_blocks=True)
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 4, 32)).astype(np.float32))
    t = jnp.array([5], jnp.int32)
    ic = jnp.asarray(rng.normal(size=(1, 4, 32)).astype(np.float32))
    ac = jnp.asarray(rng.normal(size=(1, 4)).astype(np.float32))
    params = jax.jit(model_a.init)(key, x, t, ic, ac)

    # jitted: eager op-by-op dispatch of the full 2-level net x4 costs
    # ~40 s on this 1-core host; compiled (and persistently cached) it is
    # seconds — and remat only has observable behavior under jit anyway
    out_a = jax.jit(model_a.apply)(params, x, t, ic, ac)
    out_b = jax.jit(model_b.apply)(params, x, t, ic, ac)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), rtol=1e-6, atol=1e-7)

    # recompute reassociates float ops; allow small numerical drift
    ga = jax.jit(jax.grad(lambda p: jnp.sum(model_a.apply(p, x, t, ic, ac) ** 2)))(params)
    gb = jax.jit(jax.grad(lambda p: jnp.sum(model_b.apply(p, x, t, ic, ac) ** 2)))(params)
    for a, b in zip(jax.tree_util.tree_leaves(ga), jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-4)


def test_unet_rejects_non_divisible_mz():
    """A clear validation error instead of an opaque concat shape error."""
    model = UNet1d(
        dim=4, channels=1, dim_mults=(1, 2), conditional=True,
        init_cond_channels=1, attn_cond_channels=1, downsample_dim=16,
    )
    x = jnp.zeros((1, 3, 17))  # 17 % 2 != 0: cannot round-trip the 2-level path
    with pytest.raises(ValueError, match="divisible"):
        model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32), x, jnp.zeros((1, 3)))
