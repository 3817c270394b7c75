"""Attention kernel dispatch.

TPU-native analogue of the reference's ``Attend`` module
(/root/reference/dquartic/model/unet1d.py:327-443), which selects between
flash/math/mem-efficient CUDA SDPA kernels. Here the choice is between:

  * ``"xla"``    — einsum + softmax; XLA fuses this well for the short
    RT-axis sequences the bottleneck attention runs over.
  * ``"pallas"`` — the hand-written Pallas TPU flash-attention kernel
    (:mod:`dquartic_tpu.ops.flash_attention`).
  * ``"auto"``   — pallas on TPU backends when the sequence is long enough
    to amortize the kernel launch, else xla.

All inputs are (batch, heads, seq, dim_head).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

# Measured v5e crossover (scripts/bench_attn_dispatch.py, (1,4,seq,32)
# bf16): XLA's fused n^2 softmax-attention holds to seq=4096 (1.3 ms),
# then falls off a cliff as the score matrix spills (5120: 4.9 ms,
# 6144: 43 ms, 8192: 113 ms) while the flash kernel scales smoothly
# (3.3 / 5.1 / 6.8 ms). Below the cliff both are at the dispatch floor
# (<2 ms) and in-model the difference is sub-noise at rt=34
# (28.8 vs 29.1 ms canonical forward), so XLA keeps the simpler program.
_PALLAS_MIN_SEQ = 5120


def _xla_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: Optional[float]
) -> jnp.ndarray:
    if scale is None:
        scale = q.shape[-1] ** -0.5
    # Scores accumulate in f32 on the MXU regardless of input dtype.
    sim = jnp.einsum("bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32)
    sim = sim * scale
    attn = jax.nn.softmax(sim, axis=-1)
    out = jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v)
    return out


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    impl: str = "auto",
) -> jnp.ndarray:
    """Softmax attention over (b, h, n, d) tensors.

    ``scale=None`` uses 1/sqrt(dim_head) (the reference's default at
    unet1d.py:428).
    """
    if impl not in ("auto", "xla", "pallas"):
        raise ValueError(f"Unknown attention impl: {impl!r}")

    if impl == "auto":
        on_tpu = jax.default_backend() == "tpu"
        long_enough = q.shape[-2] >= _PALLAS_MIN_SEQ and k.shape[-2] >= _PALLAS_MIN_SEQ
        impl = "pallas" if (on_tpu and long_enough) else "xla"

    if impl == "pallas":
        from .flash_attention import flash_attention

        return flash_attention(q, k, v, scale=scale)
    return _xla_attention(q, k, v, scale)
