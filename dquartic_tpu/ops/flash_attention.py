"""Pallas TPU flash attention.

Streaming softmax attention for (batch, heads, seq, dim_head) tensors:
grid over (batch*heads, q blocks), online-softmax accumulation over kv
blocks in VMEM — the score matrix never touches HBM. This is the
TPU-native replacement for the reference's CUDA SDPA dispatch
(/root/reference/dquartic/model/unet1d.py:327-411).

The backward pass is blockwise as well (standard two-kernel scheme): the
forward saves the per-row logsumexp stats ``L = m + log(l)``, and the
dq / dk+dv kernels rebuild each probability block as ``exp(qk*scale - L)``
in VMEM — under ``jax.grad`` the (n, n) score matrix never exists in HBM
in either direction, which matters precisely at the sequence lengths
(>= ~5k, see attention_dispatch) where this kernel is selected.
``DQUARTIC_FLASH_BWD=reference`` restores the einsum recompute backward
(materializes (n, n); kept as the testing oracle).

Like the forward, the backward keeps the full (padded) kv sequence of one
(batch, head) in VMEM — fine through ~16k positions at bf16, far beyond
this model family's RT windows.

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


def _flash_kernel(
    q_ref, k_ref, v_ref, o_ref, l_ref, *, block_k: int, kv_len: int, scale: float
):
    """One (batch*head, q-block) program: stream kv blocks, online softmax.

    Also writes the per-row logsumexp ``L = m + log(l)`` the blockwise
    backward needs to rebuild probability blocks without re-running the
    online softmax.
    """
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
    l_ref[0] = (m_i + jnp.log(jnp.maximum(l_i, 1e-30)))[:, 0]


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
    out, lse = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((bh, np_, dp), q.dtype),
            jax.ShapeDtypeStruct((bh, np_), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            _block_spec((1, block_q, dp), lambda i, j: (i, j, 0)),
            _block_spec((1, mp, dp), lambda i, j: (i, 0, 0)),
            _block_spec((1, mp, dp), lambda i, j: (i, 0, 0)),
        ],
        out_specs=(
            _block_spec((1, block_q, dp), lambda i, j: (i, j, 0)),
            _block_spec((1, block_q), lambda i, j: (i, j)),
        ),
        interpret=interpret,
    )(qp, kp, vp)

    return out.reshape(b, h, np_, dp)[:, :, :n, :d], lse.reshape(b, h, np_)[:, :, :n]


def _reference_attention(q, k, v, scale):
    s = jnp.einsum("bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    return p, jnp.einsum("bhij,bhjd->bhid", p.astype(v.dtype), v)


# --------------------------------------------------------------------- #
# blockwise backward                                                    #
# --------------------------------------------------------------------- #


def _flash_bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, l_ref, dD_ref, dq_ref, *, block_k: int, kv_len: int, scale: float
):
    """dq for one q block: loop kv blocks, rebuild P = exp(qk*scale - L)."""
    q = q_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = l_ref[0][:, None]  # (block_q, 1)
    dD = dD_ref[0][:, None]
    num_kv = pl.cdiv(kv_len, block_k)

    def body(i, acc):
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        p = jnp.exp(s - lse)
        kv_idx = i * block_k + jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
        p = jnp.where(kv_idx < kv_len, p, 0.0)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - dD)
        return acc + jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    acc0 = jnp.zeros(q.shape, jnp.float32)
    acc = jax.lax.fori_loop(0, num_kv, body, acc0)
    dq_ref[0] = (acc * scale).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(
    k_ref, v_ref, q_ref, do_ref, l_ref, dD_ref, dk_ref, dv_ref,
    *, block_q: int, q_len: int, scale: float,
):
    """dk/dv for one kv block: loop q blocks.

    Padded q rows carry zero dO and zero dD (the wrapper zero-pads g), so
    their contributions vanish without masking.
    """
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    num_q = pl.cdiv(q_len, block_q)

    def body(i, carry):
        dk_acc, dv_acc = carry
        q = q_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        do = do_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        lse = l_ref[0, pl.ds(i * block_q, block_q)][:, None]
        dD = dD_ref[0, pl.ds(i * block_q, block_q)][:, None]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (block_q, block_k)
        p = jnp.exp(s - lse)
        dv_acc = dv_acc + jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - dD)
        dk_acc = dk_acc + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return dk_acc, dv_acc

    z = jnp.zeros(k.shape, jnp.float32)
    dk_acc, dv_acc = jax.lax.fori_loop(0, num_q, body, (z, z))
    dk_ref[0] = (dk_acc * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv_acc.astype(dv_ref.dtype)


def _flash_backward(
    q, k, v, lse, o, g, scale,
    block_q: int = 128, block_k: int = 128,
    interpret: Optional[bool] = None,
):
    b, h, n, d = q.shape
    m = k.shape[2]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    dp_ = _round_up(d, 128)
    np_ = _round_up(n, block_q)
    mp = _round_up(m, block_k)
    pad4 = lambda x, nn: jnp.pad(  # noqa: E731
        x, ((0, 0), (0, 0), (0, nn - x.shape[2]), (0, dp_ - d))
    )
    bh = b * h
    qp = pad4(q, np_).reshape(bh, np_, dp_)
    kp = pad4(k, mp).reshape(bh, mp, dp_)
    vp = pad4(v, mp).reshape(bh, mp, dp_)
    gp = pad4(g, np_).reshape(bh, np_, dp_)
    # D_i = sum_d dO_i * O_i — cheap elementwise rowwise reduce in XLA.
    dD = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    dDp = jnp.pad(dD, ((0, 0), (0, 0), (0, np_ - n))).reshape(bh, np_)
    lsep = jnp.pad(lse, ((0, 0), (0, 0), (0, np_ - n))).reshape(bh, np_)

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, block_k=block_k, kv_len=m, scale=scale),
        out_shape=jax.ShapeDtypeStruct((bh, np_, dp_), q.dtype),
        grid=(bh, np_ // block_q),
        in_specs=[
            _block_spec((1, block_q, dp_), lambda i, j: (i, j, 0)),
            _block_spec((1, mp, dp_), lambda i, j: (i, 0, 0)),
            _block_spec((1, mp, dp_), lambda i, j: (i, 0, 0)),
            _block_spec((1, block_q, dp_), lambda i, j: (i, j, 0)),
            _block_spec((1, block_q), lambda i, j: (i, j)),
            _block_spec((1, block_q), lambda i, j: (i, j)),
        ],
        out_specs=_block_spec((1, block_q, dp_), lambda i, j: (i, j, 0)),
        interpret=interpret,
    )(qp, kp, vp, gp, lsep, dDp)

    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, block_q=block_q, q_len=n, scale=scale),
        out_shape=(
            jax.ShapeDtypeStruct((bh, mp, dp_), k.dtype),
            jax.ShapeDtypeStruct((bh, mp, dp_), v.dtype),
        ),
        grid=(bh, mp // block_k),
        in_specs=[
            _block_spec((1, block_k, dp_), lambda i, j: (i, j, 0)),
            _block_spec((1, block_k, dp_), lambda i, j: (i, j, 0)),
            _block_spec((1, np_, dp_), lambda i, j: (i, 0, 0)),
            _block_spec((1, np_, dp_), lambda i, j: (i, 0, 0)),
            _block_spec((1, np_), lambda i, j: (i, 0)),
            _block_spec((1, np_), lambda i, j: (i, 0)),
        ],
        out_specs=(
            _block_spec((1, block_k, dp_), lambda i, j: (i, j, 0)),
            _block_spec((1, block_k, dp_), lambda i, j: (i, j, 0)),
        ),
        interpret=interpret,
    )(kp, vp, qp, gp, lsep, dDp)

    unpad_q = lambda x: x.reshape(b, h, np_, dp_)[:, :, :n, :d]  # noqa: E731
    unpad_kv = lambda x: x.reshape(b, h, mp, dp_)[:, :, :m, :d]  # noqa: E731
    return unpad_q(dq), unpad_kv(dk), unpad_kv(dv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash(q, k, v, scale):
    out, _ = _flash_forward(q, k, v, scale)
    return out


def _flash_fwd(q, k, v, scale):
    out, lse = _flash_forward(q, k, v, scale)
    return out, (q, k, v, out, lse)


def _flash_bwd(scale, res, g):
    q, k, v, o, lse = res
    import os

    if os.environ.get("DQUARTIC_FLASH_BWD") == "reference":
        # testing oracle: einsum recompute — materializes (n, n)
        p, _ = _reference_attention(q, k, v, scale)
        g32 = g.astype(jnp.float32)
        p32 = p.astype(jnp.float32)
        dv = jnp.einsum("bhij,bhid->bhjd", p32, g32).astype(v.dtype)
        dp = jnp.einsum("bhid,bhjd->bhij", g32, v.astype(jnp.float32))
        ds = p32 * (dp - jnp.sum(p32 * dp, axis=-1, keepdims=True))
        dq = (jnp.einsum("bhij,bhjd->bhid", ds, k.astype(jnp.float32)) * scale).astype(q.dtype)
        dk = (jnp.einsum("bhij,bhid->bhjd", ds, q.astype(jnp.float32)) * scale).astype(k.dtype)
        return dq, dk, dv
    return _flash_backward(q, k, v, lse, o, g, scale)


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
