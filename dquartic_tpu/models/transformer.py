"""Legacy cross-attention transformer denoiser.

Re-design of the reference ``CustomTransformer``
(/root/reference/dquartic/model/building_blocks.py:179-260), the
hackathon-era denoiser whose trained checkpoints the prediction notebook
uses. Fixed relative to the reference:

  * The reference forward takes 3 args ``(x_t, t, x_cond)``
    (building_blocks.py:224) but the DDIM process calls the denoiser with
    4 ``(x_t, t, ms2_cond, ms1_cond)`` (model.py:271, 359) — a TypeError
    if selected via config. This implementation adopts the 4-arg denoiser
    signature; ``attn_cond`` (the MS1 chromatogram, shape (b, rt)) is the
    conditional input, matching the documented intent
    (building_blocks.py:228-235).
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

Dtype = jnp.dtype


def apply_rope_pairwise(x: jnp.ndarray) -> jnp.ndarray:
    """The reference's handwritten RoPE (building_blocks.py:6-66).

    Unlike the U-Net RoPE this rotates the **full** hidden dimension with
    ``hidden/2`` frequencies ``10000**(-i/(hidden/2))`` over adjacent
    (even, odd) pairs. ``x``: (b, seq, hidden).
    """
    b, seq, hidden = x.shape
    half = hidden // 2
    freq_seq = jnp.arange(half, dtype=jnp.float32) / half
    inv_freq = 10000.0**-freq_seq
    pos = jnp.arange(seq, dtype=jnp.float32)
    angles = pos[:, None] * inv_freq[None, :]  # (seq, half)
    sin = jnp.sin(angles)[None].astype(x.dtype)
    cos = jnp.cos(angles)[None].astype(x.dtype)

    xr = x.reshape(b, seq, half, 2)
    x1, x2 = xr[..., 0], xr[..., 1]
    out = jnp.stack([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)
    return out.reshape(b, seq, hidden)


class TimeEmbedding(nn.Module):
    """Sinusoidal features + 2-layer MLP (building_blocks.py:69-112)."""

    hidden_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        half = self.hidden_dim // 2
        emb = math.log(10000.0) / (half - 1)
        freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -emb)
        h = t.astype(jnp.float32)[:, None] * freqs[None, :]
        h = jnp.concatenate([jnp.sin(h), jnp.cos(h)], axis=-1)
        h = nn.Dense(self.hidden_dim * 4, dtype=self.dtype, param_dtype=jnp.float32, name="linear1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, param_dtype=jnp.float32, name="linear2")(h)
        return h


class TransformerLayer(nn.Module):
    """Post-norm cross-attention layer (building_blocks.py:115-176).

    query = x_t, key/value = concat(cond, x_t); multi-head attention with
    packed qkv biases, matching ``nn.MultiheadAttention`` semantics so
    torch checkpoints convert 1:1.
    """

    hidden_dim: int
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_t: jnp.ndarray, x_cond: jnp.ndarray) -> jnp.ndarray:
        combined = jnp.concatenate([x_cond, x_t], axis=1)

        d = self.hidden_dim
        h = self.num_heads
        hd = d // h
        dense = lambda n: nn.Dense(d, dtype=self.dtype, param_dtype=jnp.float32, name=n)
        q = dense("q_proj")(x_t)
        k = dense("k_proj")(combined)
        v = dense("v_proj")(combined)

        def split(tensor):
            b, n, _ = tensor.shape
            return tensor.reshape(b, n, h, hd).transpose(0, 2, 1, 3)

        qh, kh, vh = split(q), split(k), split(v)
        sim = jnp.einsum("bhid,bhjd->bhij", qh, kh, preferred_element_type=jnp.float32)
        attn = nn.softmax(sim * (hd**-0.5), axis=-1).astype(vh.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", attn, vh)
        b, _, n, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, d)
        out = dense("out_proj")(out)

        x_t = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="norm1")(x_t + out)

        ff = nn.Dense(4 * d, dtype=self.dtype, param_dtype=jnp.float32, name="ff1")(x_t)
        ff = nn.gelu(ff, approximate=False)
        ff = nn.Dense(d, dtype=self.dtype, param_dtype=jnp.float32, name="ff2")(ff)
        x_t = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="norm2")(x_t + ff)
        return x_t


class CustomTransformer(nn.Module):
    """See module docstring (building_blocks.py:179-260)."""

    input_dim: int = 40000
    hidden_dim: int = 128
    num_heads: int = 1
    num_layers: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x_t: jnp.ndarray,
        t: jnp.ndarray,
        init_cond: Optional[jnp.ndarray] = None,
        attn_cond: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        del init_cond, deterministic  # the MS2 mixture is unused by this arch
        if attn_cond is None:
            attn_cond = jnp.zeros(x_t.shape[:2], x_t.dtype)

        x = nn.Dense(
            self.hidden_dim, dtype=self.dtype, param_dtype=jnp.float32, name="input_projection"
        )(x_t.astype(self.dtype))
        cond = attn_cond.astype(self.dtype)[..., None]  # (b, rt, 1)
        cond = nn.Dense(
            self.hidden_dim, dtype=self.dtype, param_dtype=jnp.float32,
            name="conditional_projection",
        )(cond)

        x = apply_rope_pairwise(x)
        cond = apply_rope_pairwise(cond)

        temb = TimeEmbedding(self.hidden_dim, dtype=self.dtype, name="time_embedding")(t)
        x = x + temb[:, None, :]

        for i in range(self.num_layers):
            x = TransformerLayer(
                self.hidden_dim, self.num_heads, dtype=self.dtype, name=f"layers_{i}"
            )(x, cond)

        return nn.Dense(
            self.input_dim, dtype=self.dtype, param_dtype=jnp.float32, name="output_projection"
        )(x)
