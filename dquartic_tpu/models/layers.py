"""Building-block layers for the 1-D denoiser networks.

Flax re-designs of the reference blocks in
/root/reference/dquartic/model/unet1d.py (cited per class). All layers use
the TPU-friendly **feature-last** layout ``(batch, length, channels)`` —
the lane dimension maps onto the channel axis — where the PyTorch
reference is channel-first ``(batch, channels, length)``. The checkpoint
converter (:mod:`dquartic_tpu.compat.torch_ckpt`) transposes weights
accordingly.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = jnp.dtype


def sinusoidal_pos_emb(t: jnp.ndarray, dim: int, theta: float = 10000.0) -> jnp.ndarray:
    """Sinusoidal timestep embedding (reference unet1d.py:181-218).

    ``t`` has shape (b,); returns (b, dim) float32.
    """
    half_dim = dim // 2
    emb = math.log(theta) / (half_dim - 1)
    freqs = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class RMSNorm(nn.Module):
    """Channel RMSNorm: ``normalize(x) * g * sqrt(C)`` (unet1d.py:113-140).

    Matches ``F.normalize(x, dim=channel)`` semantics including the 1e-12
    norm clamp. Normalization math runs in float32.
    """

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        g = self.param("g", nn.initializers.ones, (self.dim,), jnp.float32)
        x32 = x.astype(jnp.float32)
        norm = jnp.sqrt(jnp.sum(jnp.square(x32), axis=-1, keepdims=True))
        out = x32 / jnp.maximum(norm, 1e-12) * g * (self.dim**0.5)
        return out.astype(self.dtype)


class LayerNorm1d(nn.Module):
    """Channel LayerNorm with biased variance (unet1d.py:681-719)."""

    channels: int
    use_bias: bool = True
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        g = self.param("g", nn.initializers.ones, (self.channels,), jnp.float32)
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        out = (x32 - mean) * jax.lax.rsqrt(var + self.eps) * g
        if self.use_bias:
            b = self.param("b", nn.initializers.zeros, (self.channels,), jnp.float32)
            out = out + b
        return out.astype(self.dtype)


def conv1d(
    features: int,
    kernel: int,
    stride: int = 1,
    padding: int = 0,
    use_bias: bool = True,
    dtype: Dtype = jnp.float32,
    name: Optional[str] = None,
) -> nn.Conv:
    """1-D convolution over the length axis, feature-last."""
    return nn.Conv(
        features=features,
        kernel_size=(kernel,),
        strides=(stride,),
        padding=[(padding, padding)],
        use_bias=use_bias,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


class Int8Conv1d(nn.Module):
    """Same-padding conv1d with int8 weights + per-channel scales.

    Inference-time replacement for the mid-block ``conv1d`` whose weight
    stream is the forward pass's measured HBM floor (BENCH_NOTES.md): the
    Pallas kernel in :mod:`dquartic_tpu.ops.int8_matmul` streams half the
    bytes and dequantizes in VMEM. Parameters are the *stored* padded
    layout (``kernel_q`` (K_pad, N_pad) int8, ``kernel_scale`` (N_pad,)
    f32, ``bias``); convert a trained f32 tree with
    :func:`dquartic_tpu.ops.quantization.quantize_mid_block_params`.
    """

    features: int
    kernel: int = 3
    impl: str = "auto"
    dtype: Dtype = jnp.float32
    dp_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..ops.int8_matmul import int8_conv1d, quant_pad_dims

        cin = x.shape[-1]
        k_pad, n_pad = quant_pad_dims(self.kernel * cin, self.features)
        w_q = self.param(
            "kernel_q", nn.initializers.zeros, (k_pad, n_pad), jnp.int8
        )
        scale = self.param(
            "kernel_scale", nn.initializers.ones, (n_pad,), jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return int8_conv1d(
            x.astype(self.dtype), w_q, scale, bias, self.kernel, self.features,
            impl=self.impl, dp_axis=self.dp_axis,
        )


class Block(nn.Module):
    """conv3 -> RMSNorm -> (FiLM) -> SiLU -> dropout (unet1d.py:223-268)."""

    dim_out: int
    dropout: float = 0.0
    quantize_weights: bool = False
    dtype: Dtype = jnp.float32
    dp_axis: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        scale_shift: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        if self.quantize_weights:
            x = Int8Conv1d(
                self.dim_out, 3, dtype=self.dtype, dp_axis=self.dp_axis,
                name="proj",
            )(x)
        else:
            x = conv1d(self.dim_out, 3, padding=1, dtype=self.dtype, name="proj")(x)
        x = RMSNorm(self.dim_out, dtype=self.dtype, name="norm")(x)
        if scale_shift is not None:
            scale, shift = scale_shift
            x = x * (scale + 1.0) + shift
        x = nn.silu(x)
        if self.dropout > 0.0:
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class ResnetBlock(nn.Module):
    """Two conv blocks + residual, FiLM-conditioned on the time embedding
    (unet1d.py:271-323).

    ``time_emb`` has shape (batch, time_emb_dim) where ``batch`` matches
    the leading axis of ``x``; the reference instead relies on
    batch-size-1 broadcasting of a (1, C, 1) tensor against (rt, C, mz)
    rows (see SURVEY.md §7 "batch semantics").
    """

    dim_out: int
    time_emb_dim: Optional[int] = None
    dropout: float = 0.0
    quantize_weights: bool = False
    dtype: Dtype = jnp.float32
    dp_axis: Optional[str] = None  # only consumed by the int8 path

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        time_emb: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        scale_shift = None
        if self.time_emb_dim is not None and time_emb is not None:
            h = nn.Dense(
                self.dim_out * 2, dtype=self.dtype, param_dtype=jnp.float32, name="mlp"
            )(nn.silu(time_emb))
            h = h[:, None, :]  # (b, 1, 2C) — broadcast over length
            scale_shift = tuple(jnp.split(h, 2, axis=-1))

        h = Block(
            self.dim_out, dropout=self.dropout,
            quantize_weights=self.quantize_weights, dtype=self.dtype,
            dp_axis=self.dp_axis, name="block1",
        )(x, scale_shift=scale_shift, deterministic=deterministic)
        h = Block(
            self.dim_out, quantize_weights=self.quantize_weights,
            dtype=self.dtype, dp_axis=self.dp_axis, name="block2",
        )(h)

        if x.shape[-1] != self.dim_out:
            res = conv1d(self.dim_out, 1, dtype=self.dtype, name="res_conv")(x)
        else:
            res = x
        return h + res


class ConditionalScaleShift(nn.Module):
    """FiLM the init condition by the time embedding (unet1d.py:648-678)."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(
            self.dim * 2, dtype=self.dtype, param_dtype=jnp.float32, name="to_scale_shift"
        )(nn.silu(t))
        scale, shift = jnp.split(h, 2, axis=-1)
        return x * (scale[:, None, :] + 1.0) + shift[:, None, :]


class FeedForward1d(nn.Module):
    """LayerNorm -> 1x1 conv expand -> GELU -> 1x1 conv (unet1d.py:722-755)."""

    channels: int
    ch_mult: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = LayerNorm1d(self.channels, dtype=self.dtype, name="norm")(x)
        x = conv1d(self.channels * self.ch_mult, 1, dtype=self.dtype, name="conv1")(x)
        x = nn.gelu(x, approximate=False)
        x = conv1d(self.channels, 1, dtype=self.dtype, name="conv2")(x)
        return x


class Upsample(nn.Module):
    """Nearest x2 upsample + conv3 (unet1d.py:82-96)."""

    dim_out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = jnp.repeat(x, 2, axis=1)
        return conv1d(self.dim_out, 3, padding=1, dtype=self.dtype, name="conv")(x)


class Downsample(nn.Module):
    """Stride-2 conv4 downsample (unet1d.py:99-110)."""

    dim_out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return conv1d(self.dim_out, 4, stride=2, padding=1, dtype=self.dtype, name="conv")(x)
