"""Attention modules: RoPE, linear attention, full/cross attention,
hybrid attention and the 1-D transformer stack.

Flax re-designs of /root/reference/dquartic/model/unet1d.py:446-826.
Layout is feature-last (batch, length, channels); head splitting follows
the reference's ``(h c)`` channel-major ordering so converted checkpoints
are bit-compatible.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import dot_product_attention
from .layers import FeedForward1d, RMSNorm, conv1d


class RMSNormParam(nn.Module):
    """Parameter-only holder matching :class:`layers.RMSNorm`'s subtree."""

    dim: int

    @nn.compact
    def __call__(self):
        return self.param("g", nn.initializers.ones, (self.dim,), jnp.float32)

Dtype = jnp.dtype


def rope_rotate(x: jnp.ndarray, rot_dim: int, theta: float = 10000.0) -> jnp.ndarray:
    """Rotary position embedding, matching ``rotary_embedding_torch``.

    The reference wraps ``RotaryEmbedding(dim=dim_head // 2)``
    (unet1d.py:529, 560-561): only the first ``rot_dim = dim_head // 2``
    features of each head are rotated (adjacent-pair interleaved, with
    ``rot_dim/2`` frequencies ``theta**(-2i/rot_dim)``); the rest pass
    through unchanged.

    ``x`` has shape (..., seq, dim_head).
    """
    seq = x.shape[-2]
    inv_freq = 1.0 / (theta ** (jnp.arange(0, rot_dim, 2, dtype=jnp.float32) / rot_dim))
    pos = jnp.arange(seq, dtype=jnp.float32)
    freqs = pos[:, None] * inv_freq[None, :]  # (seq, rot_dim/2)
    freqs = jnp.repeat(freqs, 2, axis=-1)  # (seq, rot_dim) — interleaved dup
    cos = jnp.cos(freqs).astype(x.dtype)
    sin = jnp.sin(freqs).astype(x.dtype)

    x_rot, x_pass = x[..., :rot_dim], x[..., rot_dim:]
    x1 = x_rot[..., 0::2]
    x2 = x_rot[..., 1::2]
    rotated = jnp.stack([-x2, x1], axis=-1).reshape(x_rot.shape)
    out = x_rot * cos + rotated * sin
    return jnp.concatenate([out, x_pass], axis=-1)


def _split_heads(x: jnp.ndarray, heads: int) -> jnp.ndarray:
    """(b, n, h*c) -> (b, h, n, c), channel-major heads (torch '(h c)')."""
    b, n, hc = x.shape
    return x.reshape(b, n, heads, hc // heads).transpose(0, 2, 1, 3)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """(b, h, n, c) -> (b, n, h*c)."""
    b, h, n, c = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, n, h * c)


class _ConvParams(nn.Module):
    """Parameter-only holder that reproduces a 1x1 ``nn.Conv``'s variable
    subtree (kernel (1, in, out) [+ bias]) so checkpoints stay layout-
    identical whether the op runs as XLA einsums or a fused Pallas
    kernel."""

    in_features: int
    out_features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (1, self.in_features, self.out_features),
            jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.out_features,), jnp.float32)
            if self.use_bias
            else None
        )
        return kernel, bias


class LinearAttention(nn.Module):
    """O(n) linear attention (unet1d.py:446-496).

    q softmaxed over the head-feature axis, k over the sequence axis; the
    (d x e) context matrix contracts the full sequence once — two small
    MXU matmuls per head instead of an n^2 score matrix. Used as the cheap
    residual mixer at every U-Net resolution, where n is the m/z axis
    (up to 40k): never materializes an (n, n) tensor.

    ``impl``: "xla" (einsum path), "pallas_t" (the lane-dense transposed
    fused kernel in :mod:`dquartic_tpu.ops.linear_attention`, which also
    fuses the output projection + RMSNorm and keeps the 3*hidden qkv
    expansion out of HBM), "pallas" (the original row-blocked kernel,
    kept for comparison), or "auto": pallas_t on TPU for sequences >=
    ``DQUARTIC_LINATTN_MIN_SEQ`` (default 2048 — measured v5e
    crossover vs XLA, BENCH_NOTES.md), XLA below.
    """

    dim: int
    heads: int = 4
    dim_head: int = 32
    impl: str = "auto"
    dtype: Dtype = jnp.float32
    # mesh axis the rows are sharded over (data-parallel training): the
    # pallas_t path runs its shard_map variant so jit-SPMD keeps the
    # kernel per-shard instead of all-gathering around the custom call
    dp_axis: Optional[str] = None
    # mesh axis the SEQUENCE (m/z) is sharded over (activation sharding):
    # the pallas_t path runs the sequence-parallel split-phase kernels
    # (phase-0 stats psum'd across the axis; ops/linear_attention.py sp
    # section). Falls back to XLA when the sequence does not divide the
    # axis or is below the per-shard crossover.
    sp_axis: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        g_pre: Optional[jnp.ndarray] = None,
        residual: bool = False,
    ) -> jnp.ndarray:
        """``g_pre``/``residual`` fuse the model's norm -> attn -> +x
        sandwich: with ``g_pre`` (the paired RMSNorm's gain) the input is
        pre-normalized — inside the Pallas kernel on the pallas_t path,
        saving two (N, C) HBM round trips — and ``residual`` adds the raw
        input to the output."""
        import os

        hidden = self.heads * self.dim_head
        w_qkv, _ = _ConvParams(self.dim, hidden * 3, use_bias=False, name="to_qkv")()
        w_out, b_out = _ConvParams(hidden, self.dim, name="to_out_conv")()
        g = RMSNormParam(self.dim, name="to_out_norm")()

        impl = self.impl
        min_seq = int(os.environ.get("DQUARTIC_LINATTN_MIN_SEQ", "2048"))
        auto_resolved = impl == "auto"
        if impl == "auto":
            env = os.environ.get("DQUARTIC_LINATTN_IMPL")
            impl = env if env in ("pallas", "pallas_t", "xla") else (
                "pallas_t" if jax.default_backend() == "tpu" else "xla"
            )
        # kernels only pay off on long sequences: measured v5e crossover
        # vs XLA is ~2048-5000 (scripts/bench_linattn_variants.py) — below it
        # the per-call floor dominates and XLA wins. The floor applies only
        # to auto/env dispatch; an explicit module-level impl= always wins.
        if auto_resolved and impl != "xla" and x.shape[1] < min_seq:
            impl = "xla"

        if impl == "pallas_t" and self.sp_axis is not None:
            # sequence-parallel dispatch: engage the split-phase kernels
            # only when the m/z axis divides the sp mesh axis evenly (and
            # the rows divide dp), each shard's sequence clears the
            # crossover, and the call is the fused prenorm form; otherwise
            # the XLA impl owns the split axis (it partitions fine — the
            # kernel path is a measured ~4x win at canonical widths, not a
            # correctness requirement).
            shape = dict(jax.sharding.get_abstract_mesh().shape)
            sp_size = shape.get(self.sp_axis)
            dp_size = shape.get(self.dp_axis, 1) if self.dp_axis else 1
            rows, n = x.shape[0], x.shape[1]
            ok = (
                g_pre is not None
                and sp_size is not None
                and n % sp_size == 0
                and (dp_size or 1) > 0
                and rows % (dp_size or 1) == 0
                and (not auto_resolved or n // sp_size >= min_seq)
            )
            if ok:
                from ..ops.linear_attention import fused_linear_attention_t

                return fused_linear_attention_t(
                    x.astype(self.dtype), w_qkv[0], w_out[0], b_out, g,
                    heads=self.heads, dim_head=self.dim_head,
                    g_pre=g_pre, residual=residual,
                    dp_axis=self.dp_axis, sp_axis=self.sp_axis,
                )
            impl = "xla"

        if impl == "pallas_t":
            from ..ops.linear_attention import fused_linear_attention_t

            return fused_linear_attention_t(
                x.astype(self.dtype), w_qkv[0], w_out[0], b_out, g,
                heads=self.heads, dim_head=self.dim_head,
                g_pre=g_pre, residual=residual, dp_axis=self.dp_axis,
            )
        if impl == "pallas":
            from ..ops.linear_attention import fused_linear_attention

            xin = self._pre(x, g_pre)
            out = fused_linear_attention(
                xin.astype(self.dtype), w_qkv[0], w_out[0], b_out, g,
                heads=self.heads, dim_head=self.dim_head,
            )
            return (x + out).astype(self.dtype) if residual else out

        xin = self._pre(x, g_pre)
        qkv = xin.astype(self.dtype) @ w_qkv[0].astype(self.dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = (_split_heads(t, self.heads) for t in (q, k, v))  # (b, h, n, c)

        # Reference softmax axes in (b, h, c, n) layout: q over c, k over n.
        # Softmax math runs in f32, but the (b, h, n, d) results are
        # materialized in the compute dtype before the contractions: dots
        # don't fuse producers on TPU, so these two tensors dominate the
        # op's HBM traffic (profile_unet.py) — bf16 halves it. The MXU
        # still accumulates the n-axis reductions in f32.
        q = nn.softmax(q.astype(jnp.float32), axis=-1)  # over c (feature)
        k = nn.softmax(k.astype(jnp.float32), axis=-2)  # over n (sequence)
        q = (q * (self.dim_head**-0.5)).astype(self.dtype)
        k = k.astype(self.dtype)

        context = jnp.einsum(
            "bhnd,bhne->bhde", k, v, preferred_element_type=jnp.float32
        )
        out = jnp.einsum(
            "bhde,bhnd->bhne", context.astype(self.dtype), q,
            preferred_element_type=jnp.float32,
        )
        out = _merge_heads(out.astype(self.dtype))

        out = out @ w_out[0].astype(self.dtype) + b_out.astype(self.dtype)
        # RMSNorm (f32 internals), identical to layers.RMSNorm
        x32 = out.astype(jnp.float32)
        norm = jnp.sqrt(jnp.sum(jnp.square(x32), axis=-1, keepdims=True))
        out = x32 / jnp.maximum(norm, 1e-12) * g * (self.dim**0.5)
        out = out.astype(self.dtype)
        return (x + out).astype(self.dtype) if residual else out

    def _pre(self, x: jnp.ndarray, g_pre: Optional[jnp.ndarray]) -> jnp.ndarray:
        """Pre-RMSNorm for the non-fused paths (layers.RMSNorm math)."""
        if g_pre is None:
            return x
        x32 = x.astype(jnp.float32)
        norm = jnp.sqrt(jnp.sum(jnp.square(x32), axis=-1, keepdims=True))
        out = x32 / jnp.maximum(norm, 1e-12) * g_pre * (self.dim**0.5)
        return out.astype(self.dtype)


class Attention(nn.Module):
    """Full softmax attention with RoPE; self- or cross-mode
    (unet1d.py:498-567).

    Cross mode (``use_xattn``): queries and values come from ``x``, keys
    from ``cond`` — the reference's unusual q/v-from-x convention
    (unet1d.py:533-535, 552-555) is preserved.
    """

    dim: int
    heads: int = 4
    dim_head: int = 32
    use_xattn: bool = False
    cond_dim: int = 1
    attn_impl: str = "auto"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, cond: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        hidden = self.heads * self.dim_head
        if self.use_xattn and cond is not None:
            qv = conv1d(hidden * 2, 1, use_bias=False, dtype=self.dtype, name="to_qv")(x)
            q, v = jnp.split(qv, 2, axis=-1)
            k = conv1d(hidden, 1, use_bias=False, dtype=self.dtype, name="to_k")(cond)
        else:
            qkv = conv1d(hidden * 3, 1, use_bias=False, dtype=self.dtype, name="to_qkv")(x)
            q, k, v = jnp.split(qkv, 3, axis=-1)

        q, k, v = (_split_heads(t, self.heads) for t in (q, k, v))
        q = rope_rotate(q, self.dim_head // 2)
        k = rope_rotate(k, self.dim_head // 2)

        out = dot_product_attention(q, k, v, impl=self.attn_impl)
        out = _merge_heads(out)
        return conv1d(self.dim, 1, dtype=self.dtype, name="to_out")(out)


class HybridSelfAndCrossAttention(nn.Module):
    """Self-attention, 1x1 mid projection, then cross-attention against the
    condition (unet1d.py:570-643)."""

    dim: int
    heads: int = 4
    dim_head: int = 32
    cond_dim: int = 1
    attn_impl: str = "auto"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, cond: jnp.ndarray) -> jnp.ndarray:
        hidden = self.heads * self.dim_head

        qkv = conv1d(hidden * 3, 1, use_bias=False, dtype=self.dtype, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = (_split_heads(t, self.heads) for t in (q, k, v))
        q = rope_rotate(q, self.dim_head // 2)
        k = rope_rotate(k, self.dim_head // 2)
        x = _merge_heads(dot_product_attention(q, k, v, impl=self.attn_impl))

        mid = conv1d(self.dim, 1, dtype=self.dtype, name="to_mid")(x)

        qv = conv1d(hidden * 2, 1, use_bias=False, dtype=self.dtype, name="to_qv")(mid)
        q, v = jnp.split(qv, 2, axis=-1)
        k = conv1d(hidden, 1, use_bias=False, dtype=self.dtype, name="to_k")(cond)
        q, v, k = _split_heads(q, self.heads), _split_heads(v, self.heads), _split_heads(k, self.heads)
        q = rope_rotate(q, self.dim_head // 2)
        k = rope_rotate(k, self.dim_head // 2)

        out = _merge_heads(dot_product_attention(q, k, v, impl=self.attn_impl))
        return conv1d(self.dim, 1, dtype=self.dtype, name="to_out")(out)


class Transformer1d(nn.Module):
    """Depth-N transformer: first half self-attention, second half hybrid
    self+cross layers (unet1d.py:758-826).

    The reference's forward crashes on this stack (it 4-way unpacks
    2-element layer lists, unet1d.py:822 — only the ``simple=True`` U-Net
    path avoids it). This implementation realizes the evident intent:
    ``x = attn(x, cond) + x; x = ff(x) + x``.
    """

    dim: int
    depth: int = 4
    heads: int = 4
    dim_head: int = 32
    mlp_mult: int = 2
    use_xattn: bool = False
    cond_dim: int = 1
    attn_impl: str = "auto"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, cond: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        for i in range(self.depth):
            if i < self.depth // 2 or not self.use_xattn:
                attn = Attention(
                    self.dim,
                    heads=self.heads,
                    dim_head=self.dim_head,
                    attn_impl=self.attn_impl,
                    dtype=self.dtype,
                    name=f"layers_{i}_attn",
                )
                x = attn(x) + x
            else:
                attn = HybridSelfAndCrossAttention(
                    self.dim,
                    heads=self.heads,
                    dim_head=self.dim_head,
                    cond_dim=self.cond_dim,
                    attn_impl=self.attn_impl,
                    dtype=self.dtype,
                    name=f"layers_{i}_attn",
                )
                x = attn(x, cond) + x
            ff = FeedForward1d(
                self.dim, ch_mult=self.mlp_mult, dtype=self.dtype, name=f"layers_{i}_ff"
            )
            x = ff(x) + x
        return x
