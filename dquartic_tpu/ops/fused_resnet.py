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

**Rows-stacked grid (round-3, second iteration).** The first kernel ran
one (batch-row, n-block) grid cell per row with a (1, C, bn) block — at
the net's C = 4..16 channels that is 4/16 of the sublanes of a single
register tile and ~32 KB DMAs, and the trace showed the launches running
at ~70-95 GB/s (vs the ~620 GB/s the int8 weight-stream kernel
sustains). This version stacks R rows per grid cell so blocks are
(R*C, bn) — sublane-dense, megabyte-scale DMAs, 10-30x fewer grid
steps. Channel mixing uses precomputed block-diagonal weights
(kron(I_R, W): one small MXU tile instead of R tiny dots), and the
per-row RMSNorm becomes two indicator-matrix dots (group-sum + expand).
Rows are padded up to G*R and sliced off outside; padded rows receive a
zero cotangent, so every parameter gradient is unaffected.

Matches the reference block structure at
/root/reference/dquartic/model/unet1d.py:223-323 (Block / ResnetBlock)
with the same FiLM placement (scale-shift on block1 only) and the
F.normalize-style RMSNorm (1e-12 clamp, f32 math).

Trainable: a ``jax.custom_vjp`` pairs the forward with a recompute-based
backward Pallas kernel (one launch per block, same halo scheme with a
4-column x window / 2-column dy window) that produces dx and every
weight/bias/gain/FiLM gradient in a single pass — only (x, dy, params)
ever stream from HBM, mirroring the streamed linear-attention backward.
Block-diagonal weight-gradient accumulators are reduced to the shared
(C_out, C_in) gradient by a diagonal-block einsum outside the kernel.
Gradient parity vs the XLA oracle is pinned in tests/test_fused_resnet.py.
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


def _grouping(B: int, c_in: int, c_out: int, s_max: int):
    """Split B rows into G groups of R rows so R*max(C) <= s_max sublanes.

    R is chosen as ceil(B/G) so padding is minimal (e.g. B=34, C=8,
    s_max=144 -> G=2, R=17: zero padding and 136 dense sublanes)."""
    cmax = max(c_in, c_out)
    r_max = max(1, s_max // cmax)
    G = -(-B // r_max)
    R = -(-B // G)
    return G, R


def _silu_grad(z: jnp.ndarray) -> jnp.ndarray:
    s = jax.nn.sigmoid(z)
    return s * (1.0 + z * (1.0 - s))


def _conv3_cols(ws, src, width):
    """'same' conv3 as 3 shifted dots: out[:, j] = sum_k ws[k] @ src[:, j+k].

    ``ws`` (3, S_out, S_src) block-diagonal; ``src`` (S_src, width+2).
    Shifted operands come from pltpu.roll so every dot input sits at lane
    offset 0 (the wrapped tail lands beyond ``width`` and is sliced off)."""
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


def _group_norm_den(h32, A):
    """Per-row-group RMS denominator of a stacked (R*C, W) slab.

    A (R, R*C) is the 0/1 group-sum indicator; returns (R, W)."""
    sq = jax.lax.dot(A, h32 * h32, preferred_element_type=jnp.float32)
    return jnp.maximum(jnp.sqrt(sq), 1e-12)


def _expand(E, den):
    """Broadcast per-group (R, W) values back to (R*C, W) rows (E = A^T)."""
    return jax.lax.dot(E, den, preferred_element_type=jnp.float32)


def _kernel_resnet_t(
    x_l, x_c, x_r, w1, b1, g1, sc, sh, w2, b2, g2, wr, br, A, E, out,
    *, block_n: int, c_out: int, film: bool, n_total: int,
):
    """One (row-group, n-block) grid cell of the fused ResnetBlock.

    Halo: conv3 twice needs 2 neighbor columns per side; the left/right
    neighbor *blocks* are passed as extra inputs (their DMA cost is the
    same block the adjacent grid cell streams anyway) and masked to zero
    at the sequence edges.
    """
    ni = pl.program_id(1)
    nb = pl.num_programs(1)
    dtype = x_c.dtype
    bn = block_n
    rs = c_out**0.5
    Am = A[...]
    Em = E[...]

    # All interior math runs in f32: HBM traffic stays in the compute
    # dtype (block specs), but Mosaic's lane rotate only exists for
    # 32-bit data, and f32 also sidesteps its bf16 transcendental gaps.
    xc = x_c[0].astype(jnp.float32)  # (S_in, bn)
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
    xt = jnp.concatenate([left, xc, right], axis=1)  # (S_in, bn+4)

    # conv1 -> (S_out, bn+2): output col j is absolute position
    # ni*bn + j - 1; W[k] multiplies x[pos + k - 1] (flax 'same' conv3).
    h = _conv3_cols(w1[...], xt, bn + 2) + b1[...]
    h = h / _expand(Em, _group_norm_den(h, Am)) * g1[...] * rs
    if film:
        h = h * (sc[0] + 1.0) + sh[0]
    h = h * jax.nn.sigmoid(h)  # SiLU (f32)
    # conv2's input is the *zero-padded* block1 output: h columns whose
    # absolute position falls outside [0, N) must be exactly 0 (the
    # halo h cols at the sequence edges are otherwise bias/norm-real).
    pos = ni * bn - 1 + jax.lax.broadcasted_iota(jnp.int32, (1, bn + 2), 1)
    h = jnp.where((pos >= 0) & (pos < n_total), h, jnp.zeros_like(h))

    # conv2 -> (S_out, bn): output col n needs h cols n, n+1, n+2
    h2 = _conv3_cols(w2[...], h, bn) + b2[...]
    h2 = h2 / _expand(Em, _group_norm_den(h2, Am)) * g2[...] * rs
    h2 = h2 * jax.nn.sigmoid(h2)

    # residual 1x1 conv (block-diag identity when C_in == C_out and no
    # res_conv param exists — the dot cost is one tile pass per column)
    res = jax.lax.dot(
        wr[...].astype(jnp.float32), xc, preferred_element_type=jnp.float32
    )
    res = res + br[...]

    out[0] = (h2 + res).astype(dtype)


def _prep_params(
    dtype, C_out, Bp, G, R,
    w1, b1, g1, scale, shift, w2, b2, g2, w_res, b_res,
):
    """Reshape/transpose flax-layout parameters into the rows-stacked
    kernel layout: block-diagonal kron weights, tiled bias/gain columns,
    group-sum indicator A (R, R*C_out) and its transpose E."""
    C_in = w1.shape[1]
    eye = jnp.eye(R, dtype=jnp.float32)
    # (3, C_out, C_in) kernel layout, then block-diagonal over rows
    w1m = w1.transpose(0, 2, 1).astype(jnp.float32)
    w2m = w2.transpose(0, 2, 1).astype(jnp.float32)
    w1b = jnp.einsum("rs,kcd->krcsd", eye, w1m).reshape(
        3, R * C_out, R * C_in
    ).astype(dtype)
    w2b = jnp.einsum("rs,kcd->krcsd", eye, w2m).reshape(
        3, R * C_out, R * C_out
    ).astype(dtype)
    b1c = jnp.tile(b1, R).reshape(R * C_out, 1).astype(jnp.float32)
    b2c = jnp.tile(b2, R).reshape(R * C_out, 1).astype(jnp.float32)
    g1c = jnp.tile(g1, R).reshape(R * C_out, 1).astype(jnp.float32)
    g2c = jnp.tile(g2, R).reshape(R * C_out, 1).astype(jnp.float32)

    # group-sum indicator: A[r, r*C_out + c] = 1
    A = jnp.repeat(eye, C_out, axis=1)  # (R, R*C_out)
    E = A.T  # (R*C_out, R)

    film = scale is not None
    if film:
        # (G, R*C_out, 1): the per-row FiLM column, rows stacked.
        pad = ((0, Bp - scale.shape[0]), (0, 0))
        scT = jnp.pad(scale.astype(jnp.float32), pad).reshape(G, R * C_out, 1)
        shT = jnp.pad(shift.astype(jnp.float32), pad).reshape(G, R * C_out, 1)
    else:
        scT = jnp.zeros((G, R * C_out, 1), jnp.float32)
        shT = jnp.zeros((G, R * C_out, 1), jnp.float32)

    if w_res is not None:
        wrm = w_res[0].T.astype(jnp.float32)  # (C_out, C_in)
        brc = (
            b_res.astype(jnp.float32)
            if b_res is not None
            else jnp.zeros((C_out,), jnp.float32)
        )
    else:
        if C_in != C_out:
            raise ValueError("identity residual requires C_in == C_out")
        wrm = jnp.eye(C_out, dtype=jnp.float32)
        brc = jnp.zeros((C_out,), jnp.float32)
    wrb = jnp.einsum("rs,cd->rcsd", eye, wrm).reshape(
        R * C_out, R * C_in
    ).astype(dtype)
    brb = jnp.tile(brc, R).reshape(R * C_out, 1)
    return w1b, b1c, g1c, scT, shT, w2b, b2c, g2c, wrb, brb, A, E, film


def _stack_rows(x, Bp, G, R, np_):
    """(B, C, N) -> (G, R*C, Np): pad rows to G*R, pad N, merge (R, C)."""
    B, C, N = x.shape
    x = jnp.pad(x, ((0, Bp - B), (0, 0), (0, np_ - N)))
    return x.reshape(G, R * C, np_)


def _forward(
    block_n, s_max, interpret,
    x_t, w1, b1, g1, scale, shift, w2, b2, g2, w_res, b_res,
):
    B, C_in, N = x_t.shape
    C_out = w1.shape[-1]
    dtype = x_t.dtype

    G, R = _grouping(B, C_in, C_out, s_max)
    Bp = G * R
    block_n = min(block_n, _round_up(N, 512))
    np_ = _round_up(max(N, block_n), block_n)
    nb = np_ // block_n
    xp = _stack_rows(x_t, Bp, G, R, np_)
    S_in, S_out = R * C_in, R * C_out

    (w1b, b1c, g1c, scT, shT, w2b, b2c, g2c, wrb, brb, A, E, film) = _prep_params(
        dtype, C_out, Bp, G, R,
        w1, b1, g1, scale, shift, w2, b2, g2, w_res, b_res,
    )

    kernel = functools.partial(
        _kernel_resnet_t,
        block_n=block_n, c_out=C_out, film=film, n_total=N,
    )
    clamp = lambda j: jnp.clip(j, 0, nb - 1)
    y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((G, S_out, np_), dtype),
        grid=(G, nb),
        in_specs=[
            _vmem_spec((1, S_in, block_n), lambda i, j: (i, 0, clamp(j - 1))),
            _vmem_spec((1, S_in, block_n), lambda i, j: (i, 0, j)),
            _vmem_spec((1, S_in, block_n), lambda i, j: (i, 0, clamp(j + 1))),
            _vmem_spec((3, S_out, S_in), lambda i, j: (0, 0, 0)),
            _vmem_spec((S_out, 1), lambda i, j: (0, 0)),
            _vmem_spec((S_out, 1), lambda i, j: (0, 0)),
            _vmem_spec((1, S_out, 1), lambda i, j: (i, 0, 0)),
            _vmem_spec((1, S_out, 1), lambda i, j: (i, 0, 0)),
            _vmem_spec((3, S_out, S_out), lambda i, j: (0, 0, 0)),
            _vmem_spec((S_out, 1), lambda i, j: (0, 0)),
            _vmem_spec((S_out, 1), lambda i, j: (0, 0)),
            _vmem_spec((S_out, S_in), lambda i, j: (0, 0)),
            _vmem_spec((S_out, 1), lambda i, j: (0, 0)),
            _vmem_spec((R, S_out), lambda i, j: (0, 0)),
            _vmem_spec((S_out, R), lambda i, j: (0, 0)),
        ],
        out_specs=_vmem_spec((1, S_out, block_n), lambda i, j: (i, 0, j)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # The stacked (R*C, bn) f32 temporaries exceed the 16 MB
            # scoped-vmem default at S=136 x bn=2048 (~20 MB peak);
            # v5e VMEM is 128 MB, so raise the ceiling instead of
            # shrinking the (deliberately large) DMA blocks.
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, xp, xp, w1b, b1c, g1c, scT, shT, w2b, b2c, g2c, wrb, brb, A, E)
    return y.reshape(Bp, C_out, np_)[:B, :, :N]


# --------------------------------------------------------------------- #
# Backward: one recompute-based Pallas pass.
#
# Per (row-group, n-block) grid cell, the forward intermediates are
# recomputed from a 4-column-halo x window (exactly the receptive field
# two transposed conv3s need):
#
#   window bases (absolute position of column 0) and widths:
#     x        j*bn - 4   bn + 8
#     h1*/a1   j*bn - 3   bn + 6
#     h2*/dy   j*bn - 2   bn + 4
#     dh1*     j*bn - 1   bn + 2
#     dx       j*bn       bn
#
# dx needs the chain at neighbor columns; every weight/bias/gain/FiLM
# gradient is accumulated over the cell's OWN columns [j*bn, j*bn+bn)
# only, so each position contributes exactly once globally. The grid is
# sequential on TPU, so the reductions accumulate into revisited output
# blocks (constant index maps), the standard Pallas reduction pattern.
# Weight gradients accumulate in block-diagonal (S_out, S_in) form; the
# diagonal blocks are summed into (C_out, C_in) outside the kernel.
# --------------------------------------------------------------------- #


def _kernel_resnet_bwd_t(
    x_l, x_c, x_r, dy_l, dy_c, dy_r,
    w1, b1, g1, sc, sh, w2, b2, g2, wr, A, E,
    dx, dw1, db1, dg1, dsc, dsh, dw2, db2, dg2, dwr, dbr,
    *, block_n: int, c_out: int, film: bool, has_res: bool,
    n_total: int,
):
    i = pl.program_id(0)
    ni = pl.program_id(1)
    nb = pl.num_programs(1)
    bn = block_n
    rs = c_out**0.5  # RMSNorm sqrt(C) factor (both norms act on C_out)
    Am = A[...]
    Em = E[...]

    @pl.when((i == 0) & (ni == 0))
    def _init_global():
        dw1[...] = jnp.zeros_like(dw1)
        db1[...] = jnp.zeros_like(db1)
        dg1[...] = jnp.zeros_like(dg1)
        dw2[...] = jnp.zeros_like(dw2)
        db2[...] = jnp.zeros_like(db2)
        dg2[...] = jnp.zeros_like(dg2)
        dwr[...] = jnp.zeros_like(dwr)
        dbr[...] = jnp.zeros_like(dbr)

    @pl.when(ni == 0)
    def _init_row():
        dsc[...] = jnp.zeros_like(dsc)
        dsh[...] = jnp.zeros_like(dsh)

    # ---- windows ----------------------------------------------------- #
    xc = x_c[0].astype(jnp.float32)  # (S_in, bn)
    xl4 = jnp.where(
        ni == 0,
        jnp.zeros_like(xc[:, :4]),
        pltpu.roll(x_l[0].astype(jnp.float32), shift=4, axis=1)[:, :4],
    )
    xr4 = jnp.where(
        ni == nb - 1,
        jnp.zeros_like(xc[:, :4]),
        x_r[0][:, :4].astype(jnp.float32),
    )
    xw = jnp.concatenate([xl4, xc, xr4], axis=1)  # (S_in, bn+8), base -4

    dyc = dy_c[0].astype(jnp.float32)  # (S_out, bn), zero beyond N (padded)
    dyl2 = jnp.where(
        ni == 0,
        jnp.zeros_like(dyc[:, :2]),
        pltpu.roll(dy_l[0].astype(jnp.float32), shift=2, axis=1)[:, :2],
    )
    dyr2 = jnp.where(
        ni == nb - 1,
        jnp.zeros_like(dyc[:, :2]),
        dy_r[0][:, :2].astype(jnp.float32),
    )
    dyw = jnp.concatenate([dyl2, dyc, dyr2], axis=1)  # (S_out, bn+4), base -2

    def shl(a, k, width):
        """Columns [k, k+width) of ``a``, landed at lane offset 0."""
        if k == 0:
            return a[:, :width]
        return pltpu.roll(a, shift=a.shape[1] - k, axis=1)[:, :width]

    def gden(h32):
        return _group_norm_den(h32, Am)

    # ---- forward recompute ------------------------------------------- #
    h1_pre = _conv3_cols(w1[...], xw, bn + 6) + b1[...]  # base -3
    n1 = gden(h1_pre)  # (R, bn+6)
    n1e = _expand(Em, n1)
    g1c = g1[...]
    h1n = h1_pre / n1e * g1c * rs
    if film:
        f = h1n * (sc[0] + 1.0) + sh[0]
    else:
        f = h1n
    a1 = f * jax.nn.sigmoid(f)
    pos1 = ni * bn - 3 + jax.lax.broadcasted_iota(jnp.int32, (1, bn + 6), 1)
    in1 = (pos1 >= 0) & (pos1 < n_total)
    a1 = jnp.where(in1, a1, jnp.zeros_like(a1))

    h2_pre = _conv3_cols(w2[...], a1, bn + 4) + b2[...]  # base -2
    n2 = gden(h2_pre)
    n2e = _expand(Em, n2)
    g2c = g2[...]
    h2n = h2_pre / n2e * g2c * rs

    # ---- backward through block2 ------------------------------------- #
    dh2n = dyw * _silu_grad(h2n)  # (S_out, bn+4)
    u2 = dh2n * g2c * rs
    xdu2 = _expand(Em, jax.lax.dot(Am, h2_pre * u2, preferred_element_type=jnp.float32))
    dh2_pre = (u2 - h2_pre * (xdu2 / (n2e * n2e))) / n2e  # base -2

    def dotT(a, b):
        """a^T @ b for (S_a, S_b)-ish sublane operands."""
        return jax.lax.dot_general(
            a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    w2f = w2[...].astype(jnp.float32)
    # da1[p] = sum_k w2[k]^T dh2_pre[p+1-k]; base -1, width bn+2
    da1 = dotT(w2f[2], shl(dh2_pre, 0, bn + 2))
    da1 += dotT(w2f[1], shl(dh2_pre, 1, bn + 2))
    da1 += dotT(w2f[0], shl(dh2_pre, 2, bn + 2))
    pos_a = ni * bn - 1 + jax.lax.broadcasted_iota(jnp.int32, (1, bn + 2), 1)
    da1 = jnp.where((pos_a >= 0) & (pos_a < n_total), da1, jnp.zeros_like(da1))

    # ---- backward through FiLM + block1 (window base -1, width bn+2) -- #
    f_w = shl(f, 2, bn + 2)
    dA = da1 * _silu_grad(f_w)
    if film:
        dh1n = dA * (sc[0] + 1.0)
    else:
        dh1n = dA
    h1_pre_w = shl(h1_pre, 2, bn + 2)
    n1_w = shl(n1e, 2, bn + 2)
    u1 = dh1n * g1c * rs
    xdu1 = _expand(
        Em, jax.lax.dot(Am, h1_pre_w * u1, preferred_element_type=jnp.float32)
    )
    dh1_pre = (u1 - h1_pre_w * (xdu1 / (n1_w * n1_w))) / n1_w  # base -1

    # ---- dx ------------------------------------------------------------ #
    w1f = w1[...].astype(jnp.float32)
    dxb = dotT(w1f[2], shl(dh1_pre, 0, bn))
    dxb += dotT(w1f[1], shl(dh1_pre, 1, bn))
    dxb += dotT(w1f[0], shl(dh1_pre, 2, bn))
    dxb += dotT(wr[...].astype(jnp.float32), dyc)
    dx[0] = dxb.astype(dx.dtype)

    # ---- parameter gradients over the cell's own columns --------------- #
    def colsum(a):
        return jnp.sum(a, axis=1, keepdims=True)

    dh1_own = shl(dh1_pre, 1, bn)  # positions [j*bn, j*bn+bn)
    db1[...] += colsum(dh1_own)
    dg1[...] += colsum(shl(dh1n, 1, bn) * shl(h1_pre, 3, bn) / shl(n1e, 3, bn)) * rs
    if film:
        dA_own = shl(dA, 1, bn)
        dsc[0] += colsum(dA_own * shl(h1n, 3, bn))
        dsh[0] += colsum(dA_own)
    for k in range(3):
        # x positions [j*bn + k - 1, ...): xw base -4 -> cols k+3
        dw1[k] += jax.lax.dot_general(
            dh1_own, shl(xw, k + 3, bn), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    dh2_own = shl(dh2_pre, 2, bn)
    db2[...] += colsum(dh2_own)
    dg2[...] += colsum(shl(dh2n, 2, bn) * shl(h2_pre, 2, bn) / shl(n2e, 2, bn)) * rs
    for k in range(3):
        # a1 positions [j*bn + k - 1, ...): a1 base -3 -> cols k+2
        dw2[k] += jax.lax.dot_general(
            dh2_own, shl(a1, k + 2, bn), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if has_res:
        dwr[...] += jax.lax.dot_general(
            dyc, xc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dbr[...] += colsum(dyc)


def _diag_blocks(m, R, C_out, C_in):
    """Sum the R diagonal (C_out, C_in) blocks of a stacked gradient."""
    if m.ndim == 3:  # (3, S_out, S_in)
        return jnp.einsum("krcrd->kcd", m.reshape(3, R, C_out, R, C_in))
    return jnp.einsum("rcrd->cd", m.reshape(R, C_out, R, C_in))


def _backward(
    block_n, s_max, interpret,
    x_t, w1, b1, g1, scale, shift, w2, b2, g2, w_res, b_res, dy,
):
    B, C_in, N = x_t.shape
    C_out = w1.shape[-1]
    dtype = x_t.dtype

    G, R = _grouping(B, C_in, C_out, s_max)
    Bp = G * R
    # The backward holds ~2x the forward's live slabs; halve the block.
    block_n = min(max(block_n // 2, 256), _round_up(N, 256))
    np_ = _round_up(max(N, block_n), block_n)
    nb = np_ // block_n
    xp = _stack_rows(x_t, Bp, G, R, np_)
    dyp = _stack_rows(dy.astype(dtype), Bp, G, R, np_)
    S_in, S_out = R * C_in, R * C_out

    (w1b, b1c, g1c, scT, shT, w2b, b2c, g2c, wrb, _brb, A, E, film) = _prep_params(
        dtype, C_out, Bp, G, R,
        w1, b1, g1, scale, shift, w2, b2, g2, w_res, b_res,
    )
    has_res = w_res is not None

    kernel = functools.partial(
        _kernel_resnet_bwd_t,
        block_n=block_n, c_out=C_out, film=film, has_res=has_res,
        n_total=N,
    )
    clamp = lambda j: jnp.clip(j, 0, nb - 1)
    f32 = jnp.float32
    outs = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((G, S_in, np_), dtype),   # dx
            jax.ShapeDtypeStruct((3, S_out, S_in), f32),   # dw1 (block-diag)
            jax.ShapeDtypeStruct((S_out, 1), f32),         # db1
            jax.ShapeDtypeStruct((S_out, 1), f32),         # dg1
            jax.ShapeDtypeStruct((G, S_out, 1), f32),      # dscale
            jax.ShapeDtypeStruct((G, S_out, 1), f32),      # dshift
            jax.ShapeDtypeStruct((3, S_out, S_out), f32),  # dw2
            jax.ShapeDtypeStruct((S_out, 1), f32),         # db2
            jax.ShapeDtypeStruct((S_out, 1), f32),         # dg2
            jax.ShapeDtypeStruct((S_out, S_in), f32),      # dw_res
            jax.ShapeDtypeStruct((S_out, 1), f32),         # db_res
        ],
        grid=(G, nb),
        in_specs=[
            _vmem_spec((1, S_in, block_n), lambda i, j: (i, 0, clamp(j - 1))),
            _vmem_spec((1, S_in, block_n), lambda i, j: (i, 0, j)),
            _vmem_spec((1, S_in, block_n), lambda i, j: (i, 0, clamp(j + 1))),
            _vmem_spec((1, S_out, block_n), lambda i, j: (i, 0, clamp(j - 1))),
            _vmem_spec((1, S_out, block_n), lambda i, j: (i, 0, j)),
            _vmem_spec((1, S_out, block_n), lambda i, j: (i, 0, clamp(j + 1))),
            _vmem_spec((3, S_out, S_in), lambda i, j: (0, 0, 0)),
            _vmem_spec((S_out, 1), lambda i, j: (0, 0)),
            _vmem_spec((S_out, 1), lambda i, j: (0, 0)),
            _vmem_spec((1, S_out, 1), lambda i, j: (i, 0, 0)),
            _vmem_spec((1, S_out, 1), lambda i, j: (i, 0, 0)),
            _vmem_spec((3, S_out, S_out), lambda i, j: (0, 0, 0)),
            _vmem_spec((S_out, 1), lambda i, j: (0, 0)),
            _vmem_spec((S_out, 1), lambda i, j: (0, 0)),
            _vmem_spec((S_out, S_in), lambda i, j: (0, 0)),
            _vmem_spec((R, S_out), lambda i, j: (0, 0)),
            _vmem_spec((S_out, R), lambda i, j: (0, 0)),
        ],
        out_specs=[
            _vmem_spec((1, S_in, block_n), lambda i, j: (i, 0, j)),
            _vmem_spec((3, S_out, S_in), lambda i, j: (0, 0, 0)),
            _vmem_spec((S_out, 1), lambda i, j: (0, 0)),
            _vmem_spec((S_out, 1), lambda i, j: (0, 0)),
            _vmem_spec((1, S_out, 1), lambda i, j: (i, 0, 0)),
            _vmem_spec((1, S_out, 1), lambda i, j: (i, 0, 0)),
            _vmem_spec((3, S_out, S_out), lambda i, j: (0, 0, 0)),
            _vmem_spec((S_out, 1), lambda i, j: (0, 0)),
            _vmem_spec((S_out, 1), lambda i, j: (0, 0)),
            _vmem_spec((S_out, S_in), lambda i, j: (0, 0)),
            _vmem_spec((S_out, 1), lambda i, j: (0, 0)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, xp, xp, dyp, dyp, dyp, w1b, b1c, g1c, scT, shT, w2b, b2c, g2c, wrb, A, E)

    (dxp, dw1m, db1c, dg1c, dscT, dshT, dw2m, db2c, dg2c, dwrm, dbrc) = outs

    dx = dxp.reshape(Bp, C_in, np_)[:B, :, :N].astype(x_t.dtype)
    dw1 = _diag_blocks(dw1m, R, C_out, C_in).transpose(0, 2, 1).astype(w1.dtype)
    dw2 = _diag_blocks(dw2m, R, C_out, C_out).transpose(0, 2, 1).astype(w2.dtype)
    db1 = db1c.reshape(R, C_out).sum(0).astype(b1.dtype)
    db2 = db2c.reshape(R, C_out).sum(0).astype(b2.dtype)
    dg1 = dg1c.reshape(R, C_out).sum(0).astype(g1.dtype)
    dg2 = dg2c.reshape(R, C_out).sum(0).astype(g2.dtype)
    dscale = (
        dscT.reshape(Bp, C_out)[:B].astype(scale.dtype) if film else None
    )
    dshift = (
        dshT.reshape(Bp, C_out)[:B].astype(shift.dtype) if film else None
    )
    if has_res:
        dw_res = _diag_blocks(dwrm, R, C_out, C_in).T[None].astype(w_res.dtype)
        db_res = (
            dbrc.reshape(R, C_out).sum(0).astype(b_res.dtype)
            if b_res is not None
            else None
        )
    else:
        dw_res = db_res = None
    return (dx, dw1, db1, dg1, dscale, dshift, dw2, db2, dg2, dw_res, db_res)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _fused_resnet(
    block_n, s_max, interpret,
    x_t, w1, b1, g1, scale, shift, w2, b2, g2, w_res, b_res,
):
    return _forward(
        block_n, s_max, interpret,
        x_t, w1, b1, g1, scale, shift, w2, b2, g2, w_res, b_res,
    )


def _fused_resnet_fwd(
    block_n, s_max, interpret,
    x_t, w1, b1, g1, scale, shift, w2, b2, g2, w_res, b_res,
):
    y = _forward(
        block_n, s_max, interpret,
        x_t, w1, b1, g1, scale, shift, w2, b2, g2, w_res, b_res,
    )
    # Recompute-based backward: only the primal inputs are saved — the
    # same residual policy as the streamed linear-attention backward, so
    # the fused path is remat-equivalent by construction.
    return y, (x_t, w1, b1, g1, scale, shift, w2, b2, g2, w_res, b_res)


def _fused_resnet_bwd(block_n, s_max, interpret, res, dy):
    (x_t, w1, b1, g1, scale, shift, w2, b2, g2, w_res, b_res) = res
    return _backward(
        block_n, s_max, interpret,
        x_t, w1, b1, g1, scale, shift, w2, b2, g2, w_res, b_res, dy,
    )


_fused_resnet.defvjp(_fused_resnet_fwd, _fused_resnet_bwd)


# --------------------------------------------------------------------- #
# data-parallel (row-sharded) variant                                    #
# --------------------------------------------------------------------- #
#
# Same motivation as the linear-attention dp wrappers (see
# ops/linear_attention.py): a bare pallas_call under a jit-SPMD mesh gets
# all-gathered and replicated, erasing data parallelism. The kernel's
# grid dim 0 is the row axis, so shard_map over the dp axis runs the
# unchanged kernel per shard; a custom_vjp psums the replicated-weight
# cotangents in a sharded backward (dx and the per-row FiLM scale/shift
# grads stay sharded).


def _dp_specs(axis, row_flags):
    from jax.sharding import PartitionSpec as P

    return tuple(P(axis) if r else P() for r in row_flags)


# row-sharded args of _fused_resnet's array operands, in order:
# x_t, w1, b1, g1, scale, shift, w2, b2, g2, w_res, b_res
_ROW_IN = (True, False, False, False, True, True, False, False, False, False, False)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _fused_resnet_dp(
    block_n, s_max, interpret, axis,
    x_t, w1, b1, g1, scale, shift, w2, b2, g2, w_res, b_res,
):
    fn = lambda *a: _fused_resnet(block_n, s_max, interpret, *a)  # noqa: E731
    return jax.shard_map(
        fn,
        in_specs=_dp_specs(axis, _ROW_IN),
        out_specs=_dp_specs(axis, (True,))[0],
        axis_names={axis},
        check_vma=False,
    )(x_t, w1, b1, g1, scale, shift, w2, b2, g2, w_res, b_res)


def _fused_resnet_dp_fwd(
    block_n, s_max, interpret, axis,
    x_t, w1, b1, g1, scale, shift, w2, b2, g2, w_res, b_res,
):
    y = _fused_resnet_dp(
        block_n, s_max, interpret, axis,
        x_t, w1, b1, g1, scale, shift, w2, b2, g2, w_res, b_res,
    )
    return y, (x_t, w1, b1, g1, scale, shift, w2, b2, g2, w_res, b_res)


def _fused_resnet_dp_bwd(block_n, s_max, interpret, axis, res, dy):
    def body(x_t, w1, b1, g1, scale, shift, w2, b2, g2, w_res, b_res, dy):
        grads = _backward(
            block_n, s_max, interpret,
            x_t, w1, b1, g1, scale, shift, w2, b2, g2, w_res, b_res, dy,
        )
        ps = lambda t: None if t is None else jax.lax.psum(t, axis)  # noqa: E731
        return tuple(
            g if row else ps(g) for g, row in zip(grads, _ROW_IN)
        )

    return jax.shard_map(
        body,
        in_specs=_dp_specs(axis, _ROW_IN + (True,)),
        out_specs=_dp_specs(axis, _ROW_IN),
        axis_names={axis},
        check_vma=False,
    )(*res, dy)


_fused_resnet_dp.defvjp(_fused_resnet_dp_fwd, _fused_resnet_dp_bwd)


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
    block_n: int = 2048,
    group_sublanes: int = 144,
    interpret: Optional[bool] = None,
    dp_axis: Optional[str] = None,
) -> jnp.ndarray:
    """Fused ResnetBlock on transposed activations (differentiable).

    Args:
      x_t: (B, C_in, N) activations, m/z on the minor (lane) axis.
      w1/w2: flax conv3 kernels, shape (3, C_in, C_out) / (3, C_out, C_out).
      b1/b2: (C_out,) biases; g1/g2: (C_out,) RMSNorm gains.
      scale/shift: (B, C_out) FiLM from the time embedding (scale is the
        raw MLP output — the kernel applies ``h * (scale + 1) + shift``),
        or both None for unconditioned blocks.
      w_res/b_res: (1, C_in, C_out) 1x1 residual conv (+ bias), or None
        when C_in == C_out (identity residual).
      block_n: lane (m/z) block width; the backward uses block_n // 2.
      group_sublanes: target sublane count per grid cell — rows are
        stacked R = ~group_sublanes/C per cell for dense DMAs.

    Returns (B, C_out, N) in ``x_t.dtype``. Under ``jax.grad`` the
    recompute-based backward Pallas kernel produces every gradient in one
    launch; only (x, dy, params) are ever resident in HBM.

    ``dp_axis``: name of a mesh axis the rows (dim 0 of ``x_t``) are
    sharded over — runs the row-sharded shard_map variant so jit-SPMD
    does not all-gather the activations around the custom call.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if (scale is None) != (shift is None):
        raise ValueError("scale and shift must both be provided or both None")
    if dp_axis is not None:
        return _fused_resnet_dp(
            block_n, group_sublanes, bool(interpret), dp_axis,
            x_t, w1, b1, g1, scale, shift, w2, b2, g2, w_res, b_res,
        )
    return _fused_resnet(
        block_n, group_sublanes, bool(interpret),
        x_t, w1, b1, g1, scale, shift, w2, b2, g2, w_res, b_res,
    )


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
