"""Fused ResnetBlock Pallas kernel in the transposed (B, C, N) layout.

Round-3 trace analysis (BENCH_NOTES.md roofline) showed the canonical
forward's #2 cost is 5.6 ms of pure layout copies: XLA alternates the
down/up-path activations between a rows-minor layout (its choice for the
small-channel convs) and the mz-minor layout of the Pallas linear-
attention kernels ~290 times per forward. This kernel removes the cause:
the whole ResnetBlock — conv3 -> RMSNorm -> FiLM -> SiLU -> conv3 ->
RMSNorm -> SiLU -> (+ 1x1-conv residual) — runs as ONE pallas_call in
the same lane-dense (C, N) layout the linear-attention kernel uses, so
entire U-Net levels stay in one layout with no relayouts and each block
reads/writes its activation exactly once (vs ~6 HBM round trips + copies
for the unfused op sequence).

Matches the reference block structure at
/root/reference/dquartic/model/unet1d.py:223-323 (Block / ResnetBlock)
with the same FiLM placement (scale-shift on block1 only) and the
F.normalize-style RMSNorm (1e-12 clamp, f32 math).

Inference-only: no custom VJP — the training path keeps the unfused XLA
modules (remat-friendly, layout costs amortize differently under grad).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _vmem_spec(block_shape, index_map=None):
    return pl.BlockSpec(block_shape, index_map, memory_space=pltpu.VMEM)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _rmsnorm_cols(h32: jnp.ndarray, g_col: jnp.ndarray, c: int) -> jnp.ndarray:
    """f32 RMSNorm over the channel (sublane) axis of a (C, W) slab."""
    norm = jnp.sqrt(jnp.sum(h32 * h32, axis=0, keepdims=True))
    return h32 / jnp.maximum(norm, 1e-12) * g_col * (c**0.5)


def _kernel_resnet_t(
    x_l, x_c, x_r, w1, b1, g1, sc, sh, w2, b2, g2, wr, br, out,
    *, block_n: int, c_in: int, c_out: int, film: bool, n_total: int,
):
    """One (batch-row, n-block) grid cell of the fused ResnetBlock.

    Halo: conv3 twice needs 2 neighbor columns per side; the left/right
    neighbor *blocks* are passed as extra inputs (their DMA cost is the
    same block the adjacent grid cell streams anyway) and masked to zero
    at the sequence edges.
    """
    ni = pl.program_id(1)
    nb = pl.num_programs(1)
    dtype = x_c.dtype
    bn = block_n

    # All interior math runs in f32: HBM traffic stays in the compute
    # dtype (block specs), but Mosaic's lane rotate only exists for
    # 32-bit data, and f32 also sidesteps its bf16 transcendental gaps.
    xc = x_c[0].astype(jnp.float32)  # (C_in, bn)
    # Halo columns, materialized at lane offset 0: Mosaic cannot
    # concatenate (or efficiently consume) lane-misaligned slices, so
    # rotate first and slice from the front.
    left = jnp.where(
        ni == 0,
        jnp.zeros_like(xc[:, :2]),
        pltpu.roll(x_l[0].astype(jnp.float32), shift=2, axis=1)[:, :2],
    )
    right = jnp.where(
        ni == nb - 1,
        jnp.zeros_like(xc[:, :2]),
        x_r[0][:, :2].astype(jnp.float32),
    )
    xt = jnp.concatenate([left, xc, right], axis=1)  # (C_in, bn+4)

    def conv3(ws, src, width):
        """'same' conv3 as 3 shifted dots: out[:, j] = sum_k ws[k] @ src[:, j+k].

        ``ws`` (3, C_out, C_src); ``src`` (C_src, width+2). Shifted
        operands come from pltpu.roll so every dot input sits at lane
        offset 0 (the wrapped tail lands beyond ``width`` and is sliced
        off)."""
        w_src = width + 2  # pltpu.roll needs shift >= 0: -k == w_src - k
        w32 = ws.astype(jnp.float32)
        acc = jax.lax.dot(w32[0], src[:, :width], preferred_element_type=jnp.float32)
        acc += jax.lax.dot(
            w32[1], pltpu.roll(src, shift=w_src - 1, axis=1)[:, :width],
            preferred_element_type=jnp.float32,
        )
        acc += jax.lax.dot(
            w32[2], pltpu.roll(src, shift=w_src - 2, axis=1)[:, :width],
            preferred_element_type=jnp.float32,
        )
        return acc

    # conv1 -> (C_out, bn+2): output col j is absolute position
    # ni*bn + j - 1; W[k] multiplies x[pos + k - 1] (flax 'same' conv3).
    h = conv3(w1[...], xt, bn + 2) + b1[...]
    h = _rmsnorm_cols(h, g1[...], c_out)
    if film:
        h = h * (sc[0] + 1.0) + sh[0]
    h = h * jax.nn.sigmoid(h)  # SiLU (f32)
    # conv2's input is the *zero-padded* block1 output: h columns whose
    # absolute position falls outside [0, N) must be exactly 0 (the
    # halo h cols at the sequence edges are otherwise bias/norm-real).
    pos = ni * bn - 1 + jax.lax.broadcasted_iota(jnp.int32, (1, bn + 2), 1)
    h = jnp.where((pos >= 0) & (pos < n_total), h, jnp.zeros_like(h))

    # conv2 -> (C_out, bn): output col n needs h cols n, n+1, n+2
    h2 = conv3(w2[...], h, bn) + b2[...]
    h2 = _rmsnorm_cols(h2, g2[...], c_out)
    h2 = h2 * jax.nn.sigmoid(h2)

    # residual 1x1 conv (identity matrix when C_in == C_out and no
    # res_conv param exists — the dot cost is negligible at C <= 32)
    res = jax.lax.dot(
        wr[...].astype(jnp.float32), xc, preferred_element_type=jnp.float32
    )
    res = res + br[...]

    out[0] = (h2 + res).astype(dtype)


def fused_resnet_block_t(
    x_t: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    g1: jnp.ndarray,
    scale: Optional[jnp.ndarray],
    shift: Optional[jnp.ndarray],
    w2: jnp.ndarray,
    b2: jnp.ndarray,
    g2: jnp.ndarray,
    w_res: Optional[jnp.ndarray],
    b_res: Optional[jnp.ndarray],
    *,
    block_n: int = 4096,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Fused ResnetBlock on transposed activations.

    Args:
      x_t: (B, C_in, N) activations, m/z on the minor (lane) axis.
      w1/w2: flax conv3 kernels, shape (3, C_in, C_out) / (3, C_out, C_out).
      b1/b2: (C_out,) biases; g1/g2: (C_out,) RMSNorm gains.
      scale/shift: (B, C_out) FiLM from the time embedding (scale is the
        raw MLP output — the kernel applies ``h * (scale + 1) + shift``),
        or both None for unconditioned blocks.
      w_res/b_res: (1, C_in, C_out) 1x1 residual conv (+ bias), or None
        when C_in == C_out (identity residual).

    Returns (B, C_out, N) in ``x_t.dtype``.
    """
    B, C_in, N = x_t.shape
    C_out = w1.shape[-1]
    dtype = x_t.dtype
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    block_n = min(block_n, _round_up(N, 512))
    np_ = _round_up(max(N, block_n), block_n)
    xp = jnp.pad(x_t, ((0, 0), (0, 0), (0, np_ - N)))
    nb = np_ // block_n

    w1m = w1.transpose(0, 2, 1).astype(dtype)  # (3, C_out, C_in)
    w2m = w2.transpose(0, 2, 1).astype(dtype)  # (3, C_out, C_out)
    b1c = b1.reshape(C_out, 1).astype(jnp.float32)
    b2c = b2.reshape(C_out, 1).astype(jnp.float32)
    g1c = g1.reshape(C_out, 1).astype(jnp.float32)
    g2c = g2.reshape(C_out, 1).astype(jnp.float32)

    film = scale is not None
    if film:
        # (B, C_out, 1): the per-batch-row FiLM column. The trailing
        # length-1 dim keeps the (C_out, 1) block equal to the array's
        # last two dims (Mosaic requires block == array dim or 8/128
        # divisibility).
        scT = scale.astype(jnp.float32)[:, :, None]
        shT = shift.astype(jnp.float32)[:, :, None]
    else:
        scT = jnp.zeros((B, C_out, 1), jnp.float32)
        shT = jnp.zeros((B, C_out, 1), jnp.float32)

    if w_res is not None:
        wrm = w_res[0].T.astype(dtype)  # (C_out, C_in)
        brc = (
            b_res.reshape(C_out, 1).astype(jnp.float32)
            if b_res is not None
            else jnp.zeros((C_out, 1), jnp.float32)
        )
    else:
        if C_in != C_out:
            raise ValueError("identity residual requires C_in == C_out")
        wrm = jnp.eye(C_out, dtype=dtype)
        brc = jnp.zeros((C_out, 1), jnp.float32)

    kernel = functools.partial(
        _kernel_resnet_t,
        block_n=block_n, c_in=C_in, c_out=C_out, film=film, n_total=N,
    )
    clamp = lambda j: jnp.clip(j, 0, nb - 1)
    y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, C_out, np_), dtype),
        grid=(B, nb),
        in_specs=[
            _vmem_spec((1, C_in, block_n), lambda i, j: (i, 0, clamp(j - 1))),
            _vmem_spec((1, C_in, block_n), lambda i, j: (i, 0, j)),
            _vmem_spec((1, C_in, block_n), lambda i, j: (i, 0, clamp(j + 1))),
            _vmem_spec((3, C_out, C_in), lambda i, j: (0, 0, 0)),
            _vmem_spec((C_out, 1), lambda i, j: (0, 0)),
            _vmem_spec((C_out, 1), lambda i, j: (0, 0)),
            _vmem_spec((1, C_out, 1), lambda i, j: (i, 0, 0)),
            _vmem_spec((1, C_out, 1), lambda i, j: (i, 0, 0)),
            _vmem_spec((3, C_out, C_out), lambda i, j: (0, 0, 0)),
            _vmem_spec((C_out, 1), lambda i, j: (0, 0)),
            _vmem_spec((C_out, 1), lambda i, j: (0, 0)),
            _vmem_spec((C_out, C_in), lambda i, j: (0, 0)),
            _vmem_spec((C_out, 1), lambda i, j: (0, 0)),
        ],
        out_specs=_vmem_spec((1, C_out, block_n), lambda i, j: (i, 0, j)),
        interpret=interpret,
    )(xp, xp, xp, w1m, b1c, g1c, scT, shT, w2m, b2c, g2c, wrm, brc)
    return y[:, :, :N]


def resnet_block_t_reference(
    x_t, w1, b1, g1, scale, shift, w2, b2, g2, w_res, b_res
):
    """XLA oracle with identical math on (B, C, N) input (tests)."""

    def conv3(x, w, b):  # x (B, C_in, N), w (3, C_in, C_out)
        dtype = x.dtype
        xpad = jnp.pad(x, ((0, 0), (0, 0), (1, 1)))
        out = sum(
            jnp.einsum("bcn,cd->bdn", xpad[:, :, k : k + x.shape[2]], w[k].astype(dtype))
            for k in range(3)
        )
        return out + b.astype(dtype).reshape(1, -1, 1)

    def rms(x, g):
        x32 = x.astype(jnp.float32)
        c = x.shape[1]
        norm = jnp.sqrt(jnp.sum(x32 * x32, axis=1, keepdims=True))
        return x32 / jnp.maximum(norm, 1e-12) * g.reshape(1, -1, 1) * (c**0.5)

    dtype = x_t.dtype
    h = conv3(x_t, w1, b1).astype(dtype)
    h = rms(h, g1).astype(dtype)
    if scale is not None:
        h = h * (scale[:, :, None].astype(dtype) + jnp.asarray(1.0, dtype))
        h = h + shift[:, :, None].astype(dtype)
    h = h * jax.nn.sigmoid(h)
    h2 = conv3(h, w2, b2).astype(dtype)
    h2 = rms(h2, g2).astype(dtype)
    h2 = h2 * jax.nn.sigmoid(h2)
    if w_res is not None:
        res = jnp.einsum("bcn,cd->bdn", x_t, w_res[0].astype(dtype))
        if b_res is not None:
            res = res + b_res.astype(dtype).reshape(1, -1, 1)
    else:
        res = x_t
    return (h2 + res.astype(dtype)).astype(dtype)
