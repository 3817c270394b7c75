"""Pallas TPU flash attention.

Streaming softmax attention for (batch, heads, seq, dim_head) tensors:
grid over (batch*heads, q blocks), online-softmax accumulation over kv
blocks in VMEM — the score matrix never touches HBM. This is the
TPU-native replacement for the reference's CUDA SDPA dispatch
(/root/reference/dquartic/model/unet1d.py:327-411).

The backward pass recomputes attention with einsums under ``custom_vjp``
(flash recompute): for this model family the sequence axis is the RT
window (tens to hundreds of steps), so the recompute cost is negligible
next to the convolution stacks, while the forward kernel keeps long
windows off HBM.

On non-TPU backends the kernel runs in interpreter mode (tests), so the
same code path is exercised everywhere.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is importable on CPU builds as well; guard anyway
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    _HAS_PLTPU = False

_NEG_INF = -1e30


def _block_spec(block_shape, index_map):
    if _HAS_PLTPU:
        return pl.BlockSpec(block_shape, index_map, memory_space=pltpu.VMEM)
    return pl.BlockSpec(block_shape, index_map)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k: int, kv_len: int, scale: float):
    """One (batch*head, q-block) program: stream kv blocks, online softmax."""
    q = q_ref[0].astype(jnp.float32) * scale  # (block_q, d)
    block_q, d = q.shape
    num_kv = pl.cdiv(kv_len, block_k)

    def body(i, carry):
        acc, m_i, l_i = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)  # (block_k, d)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (block_q, block_k)

        # mask out-of-range kv positions (kv_len may not divide block_k)
        kv_idx = i * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(kv_idx < kv_len, s, _NEG_INF)

        m_new = jnp.maximum(m_i, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_i - m_new)
        l_new = l_i * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return acc_new, m_new, l_new

    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc, m_i, l_i = jax.lax.fori_loop(0, num_kv, body, (acc0, m0, l0))

    o_ref[0] = (acc / jnp.maximum(l_i, 1e-30)).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _flash_forward(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    block_q: int = 128,
    block_k: int = 128,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    b, h, n, d = q.shape
    m = k.shape[2]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # Pad to hardware-friendly tiles: lanes want d multiples of 128,
    # sublanes want seq multiples of the block size.
    dp = _round_up(d, 128)
    np_ = _round_up(n, block_q)
    mp = _round_up(m, block_k)
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, np_ - n), (0, dp - d)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, mp - m), (0, dp - d)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, mp - m), (0, dp - d)))

    bh = b * h
    qp = qp.reshape(bh, np_, dp)
    kp = kp.reshape(bh, mp, dp)
    vp = vp.reshape(bh, mp, dp)

    grid = (bh, np_ // block_q)
    kernel = functools.partial(
        _flash_kernel, block_k=block_k, kv_len=m, scale=scale
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bh, np_, dp), q.dtype),
        grid=grid,
        in_specs=[
            _block_spec((1, block_q, dp), lambda i, j: (i, j, 0)),
            _block_spec((1, mp, dp), lambda i, j: (i, 0, 0)),
            _block_spec((1, mp, dp), lambda i, j: (i, 0, 0)),
        ],
        out_specs=_block_spec((1, block_q, dp), lambda i, j: (i, j, 0)),
        interpret=interpret,
    )(qp, kp, vp)

    return out.reshape(b, h, np_, dp)[:, :, :n, :d]


def _reference_attention(q, k, v, scale):
    s = jnp.einsum("bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    return p, jnp.einsum("bhij,bhjd->bhid", p.astype(v.dtype), v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash(q, k, v, scale):
    return _flash_forward(q, k, v, scale)


def _flash_fwd(q, k, v, scale):
    return _flash_forward(q, k, v, scale), (q, k, v)


def _flash_bwd(scale, res, g):
    q, k, v = res
    p, _ = _reference_attention(q, k, v, scale)  # recompute
    g32 = g.astype(jnp.float32)
    p32 = p.astype(jnp.float32)
    dv = jnp.einsum("bhij,bhid->bhjd", p32, g32).astype(v.dtype)
    dp = jnp.einsum("bhid,bhjd->bhij", g32, v.astype(jnp.float32))
    # softmax backward: dS = P * (dP - sum_j(P * dP))
    ds = p32 * (dp - jnp.sum(p32 * dp, axis=-1, keepdims=True))
    dq = (jnp.einsum("bhij,bhjd->bhid", ds, k.astype(jnp.float32)) * scale).astype(q.dtype)
    dk = (jnp.einsum("bhij,bhid->bhjd", ds, q.astype(jnp.float32)) * scale).astype(k.dtype)
    return dq, dk, dv


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Flash attention over (b, h, n, d); differentiable."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return _flash(q, k, v, float(scale))
