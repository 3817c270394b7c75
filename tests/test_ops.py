"""Tests for custom ops: flash attention (interpret mode on CPU) vs the
XLA einsum reference, including gradients and the dispatch layer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dquartic_tpu.ops import dot_product_attention
from dquartic_tpu.ops.flash_attention import flash_attention


def rand_qkv(b=2, h=3, n=50, m=70, d=32, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, m, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, m, d)).astype(np.float32))
    return q, k, v


def xla_attention(q, k, v, scale=None):
    return dot_product_attention(q, k, v, scale=scale, impl="xla")


@pytest.mark.parametrize("n,m", [(50, 70), (128, 128), (1, 5), (200, 34)])
def test_flash_matches_xla(n, m):
    q, k, v = rand_qkv(n=n, m=m)
    out_ref = xla_attention(q, k, v)
    out = flash_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref), rtol=2e-5, atol=2e-5)


def test_flash_custom_scale():
    q, k, v = rand_qkv()
    out_ref = xla_attention(q, k, v, scale=0.5)
    out = flash_attention(q, k, v, scale=0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref), rtol=2e-5, atol=2e-5)


def test_flash_gradients_match():
    q, k, v = rand_qkv(b=1, h=2, n=40, m=40)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(xla_attention(q, k, v) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_flash_bf16():
    q, k, v = rand_qkv()
    q, k, v = (t.astype(jnp.bfloat16) for t in (q, k, v))
    out = flash_attention(q, k, v)
    out_ref = xla_attention(q, k, v)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(out_ref, np.float32), rtol=3e-2, atol=3e-2
    )


@pytest.mark.parametrize("n,m", [(200, 34), (130, 257), (520, 520)])
def test_flash_blockwise_backward_matches_oracle(n, m, monkeypatch):
    """The blockwise Pallas backward (default) == the einsum-recompute
    oracle (DQUARTIC_FLASH_BWD=reference) on non-divisible / multi-block
    shapes — the (n, n) matrix never exists in HBM on the default path."""
    q, k, v = rand_qkv(b=1, h=2, n=n, m=m, seed=3)

    def loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v) ** 2)

    monkeypatch.delenv("DQUARTIC_FLASH_BWD", raising=False)
    g_block = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    monkeypatch.setenv("DQUARTIC_FLASH_BWD", "reference")
    g_oracle = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_block, g_oracle):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)


def test_flash_backward_bf16():
    q, k, v = rand_qkv(b=1, h=2, n=100, m=100, seed=5)
    qb, kb, vb = (t.astype(jnp.bfloat16) for t in (q, k, v))

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v).astype(jnp.float32) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(xla_attention(q, k, v).astype(jnp.float32) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(qb, kb, vb)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        assert a.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b), rtol=6e-2, atol=6e-2
        )


def test_dispatch_impl_selection():
    q, k, v = rand_qkv(n=16, m=16)
    out_auto = dot_product_attention(q, k, v, impl="auto")  # cpu -> xla
    out_pallas = dot_product_attention(q, k, v, impl="pallas")
    np.testing.assert_allclose(
        np.asarray(out_auto), np.asarray(out_pallas), rtol=2e-5, atol=2e-5
    )
    with pytest.raises(ValueError):
        dot_product_attention(q, k, v, impl="nope")
