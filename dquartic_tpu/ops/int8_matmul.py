"""Int8 weight-streaming matmul / conv1d for the U-Net mid blocks.

The canonical UNet1d's four mid-block convolutions hold ~1.2B of its
1.206B parameters (reference unet1d.py:1029-1058: two ResnetBlocks over
``mid_ch = mid_dim * downsampled_n`` = 10,000 channels, kernel 3 →
4 x (3, 10000, 10000)). At inference the forward is weight-bound: each
conv streams a 600 MB bf16 kernel from HBM at the platform's practical
ceiling (~375 GB/s → 1.6 ms, BENCH_NOTES.md round-2 dead end — neither
Pallas bf16 weight streaming nor XLA matmul beats the in-model conv
fusion at bf16 width). The only remaining lever is *narrower weights*:
this kernel streams the weights as **int8 + per-output-channel f32
scales** (half the bytes) and dequantizes inside VMEM, so HBM never sees
a wide copy — the TPU-native realization of the reference's int8
post-training quantization experiment (nbs/quantization_experiment.ipynb),
made fast rather than merely small.

Layout: the k-tap conv is flattened to one matmul by im2col over the
(tiny) activation — x (b, L, C) → (b*L, k*C) — against a pre-flattened,
pre-padded weight matrix ``w_q`` of shape (K_pad, N_pad) int8 where
``K_pad = roundup(k*C_in, BLOCK_K)`` and ``N_pad = roundup(C_out,
BLOCK_N)``. Padding lives in the *stored* tensor (zero rows/cols, scale
1.0) so the hot path never re-pads 300 MB; the activation padding it
does do is ~KBs. int8 values are exactly representable in bf16, so
dequant-to-compute-dtype inside the kernel is lossless; the per-channel
scale multiplies the f32 accumulator after the contraction.

Numerics contract: ``int8_matmul(x, w_q, scale)`` ==
``x @ (w_q.astype(f32) * scale)`` with f32 MXU accumulation — the XLA
fallback (`int8_matmul_reference`) computes exactly that, and tests pin
the two together.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    _HAS_PLTPU = False

# Measured on v5e (scripts/bench_midconv.py lineage): 512x1024 int8 weight
# tiles pipeline at the HBM floor; larger tiles fail the remote compiler.
BLOCK_K = 512
BLOCK_N = 1024


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def quant_pad_dims(k_logical: int, n_logical: int) -> Tuple[int, int]:
    """Stored (K_pad, N_pad) for a logical (k*C_in, C_out) weight."""
    return _round_up(k_logical, BLOCK_K), _round_up(n_logical, BLOCK_N)


def quantize_weight_matrix(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(K, N) float → padded (K_pad, N_pad) int8 + (N_pad,) f32 scales.

    Symmetric per-output-channel (column) quantization; pad columns get
    scale 1.0 and zero values so they contribute nothing.
    """
    w32 = jnp.asarray(w, jnp.float32)
    k, n = w32.shape
    absmax = jnp.max(jnp.abs(w32), axis=0)
    scale = jnp.maximum(absmax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(w32 / scale[None, :]), -127, 127).astype(jnp.int8)
    k_pad, n_pad = quant_pad_dims(k, n)
    q = jnp.pad(q, ((0, k_pad - k), (0, n_pad - n)))
    scale = jnp.pad(scale.astype(jnp.float32), (0, n_pad - n), constant_values=1.0)
    return q, scale


def quantize_conv_kernel(kernel: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Flax conv kernel (k, C_in, C_out) → padded int8 matrix + scales.

    Row order is tap-major (tap*C_in + c), matching the im2col layout
    produced by :func:`int8_conv1d`.
    """
    k, cin, cout = kernel.shape
    return quantize_weight_matrix(jnp.asarray(kernel).reshape(k * cin, cout))


def _mxu_dtype(x_dtype) -> jnp.dtype:
    return jnp.bfloat16 if x_dtype == jnp.bfloat16 else jnp.float32


def _matmul_kernel(x_ref, w_ref, s_ref, out_ref, acc_ref):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = w_ref[:].astype(x_ref.dtype)  # int8 → compute dtype, exact
    acc_ref[:] += jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        out_ref[:] = (acc_ref[:] * s_ref[:]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def int8_matmul(
    x: jnp.ndarray,
    w_q: jnp.ndarray,
    scale: jnp.ndarray,
    out_dtype=None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """x (M, K≤K_pad) @ dequant(w_q (K_pad, N_pad)) → (M, N_pad).

    The weight stream is the only large HBM read; each int8 tile is
    dequantized to the compute dtype in VMEM and contracted on the MXU
    with f32 accumulation. Output columns beyond the logical N carry the
    zero-pad garbage — callers slice.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    k_pad, n_pad = w_q.shape
    m, k_x = x.shape
    cdt = _mxu_dtype(x.dtype)
    out_dtype = out_dtype or x.dtype

    block_k = min(BLOCK_K, k_pad)
    block_n = min(BLOCK_N, n_pad)
    m_pad = _round_up(m, 16 if cdt == jnp.bfloat16 else 8)
    xp = x.astype(cdt)
    if m_pad != m or k_x != k_pad:
        xp = jnp.pad(xp, ((0, m_pad - m), (0, k_pad - k_x)))

    out = pl.pallas_call(
        _matmul_kernel,
        grid=(n_pad // block_n, k_pad // block_k),
        in_specs=[
            _vmem_spec((m_pad, block_k), lambda i, j: (0, j)),
            _vmem_spec((block_k, block_n), lambda i, j: (j, i)),
            _vmem_spec((1, block_n), lambda i, j: (0, i)),
        ],
        out_specs=_vmem_spec((m_pad, block_n), lambda i, j: (0, i)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), out_dtype),
        scratch_shapes=[_scratch_vmem((m_pad, block_n), jnp.float32)],
        interpret=interpret,
    )(xp, w_q, scale.reshape(1, n_pad))
    return out[:m]


def _vmem_spec(block_shape, index_map):
    if _HAS_PLTPU:
        return pl.BlockSpec(block_shape, index_map, memory_space=pltpu.VMEM)
    return pl.BlockSpec(block_shape, index_map)


def _scratch_vmem(shape, dtype):
    if not _HAS_PLTPU:  # pragma: no cover
        raise NotImplementedError("int8_matmul requires pallas TPU support")
    return pltpu.VMEM(shape, dtype)


def int8_matmul_reference(x, w_q, scale, out_dtype=None):
    """XLA oracle: identical math (dequant to compute dtype, f32 accum)."""
    cdt = _mxu_dtype(x.dtype)
    out_dtype = out_dtype or x.dtype
    k_pad = w_q.shape[0]
    xp = x.astype(cdt)
    if x.shape[1] != k_pad:
        xp = jnp.pad(xp, ((0, 0), (0, k_pad - x.shape[1])))
    acc = jnp.dot(xp, w_q.astype(cdt), preferred_element_type=jnp.float32)
    return (acc * scale[None, :]).astype(out_dtype)


@jax.custom_jvp
def _inference_only(x: jnp.ndarray) -> jnp.ndarray:
    """Identity that refuses differentiation with an actionable message.

    Without it, differentiating a ``quantize_mid`` model surfaces as an
    opaque "pallas_call does not have a transpose/jvp rule" deep inside
    JAX. int8 weights are frozen post-training artifacts — there is no
    meaningful weight gradient — so training configs must use the bf16
    master weights (``tpu.quantize_mid`` belongs in `predict`, not
    `train`).
    """
    return x


@_inference_only.defjvp
def _inference_only_jvp(primals, tangents):
    raise NotImplementedError(
        "int8 quantized mid-block weights are inference-only: the weights "
        "are frozen int8 + per-channel scales with no gradient. Train with "
        "the bf16 master weights and quantize afterwards "
        "(ops.quantization.quantize_mid_block_params / `cli predict "
        "--quantize-mid`); remove `quantize_mid` from the training config."
    )


def int8_conv1d(
    x: jnp.ndarray,
    w_q: jnp.ndarray,
    scale: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    kernel: int,
    features: int,
    impl: str = "auto",
    dp_axis: Optional[str] = None,
) -> jnp.ndarray:
    """Same-padding stride-1 conv over axis 1 with int8 weights.

    x (b, L, C_in); w_q/scale from :func:`quantize_conv_kernel`; returns
    (b, L, features) in x.dtype. The im2col expansion is k× the (tiny)
    activation — negligible next to the weight stream it halves.

    ``dp_axis``: mesh axis the batch (dim 0) is sharded over — runs the
    kernel per shard under shard_map so jit-SPMD does not all-gather
    around the custom call (inference-only op: no backward needed).
    """
    if dp_axis is not None:
        from jax.sharding import PartitionSpec as P

        fn = lambda a, w, s: int8_conv1d(  # noqa: E731
            a, w, s, bias, kernel, features, impl=impl
        )
        return jax.shard_map(
            fn,
            in_specs=(P(dp_axis), P(), P()),
            out_specs=P(dp_axis),
            axis_names={dp_axis},
            check_vma=False,
        )(x, w_q, scale)
    # Guard every differentiable operand: x carries tangents from earlier
    # layers' params; scale/bias are themselves (frozen) float params.
    x = _inference_only(x)
    scale = _inference_only(scale)
    if bias is not None:
        bias = _inference_only(bias)
    b, length, cin = x.shape
    pad = (kernel - 1) // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
    xcat = jnp.concatenate(
        [xp[:, i : i + length] for i in range(kernel)], axis=-1
    )  # (b, L, k*C_in), tap-major
    xf = xcat.reshape(b * length, kernel * cin)
    if impl == "xla":
        out = int8_matmul_reference(xf, w_q, scale)
    else:
        out = int8_matmul(xf, w_q, scale)
    out = out[:, :features].reshape(b, length, features)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
