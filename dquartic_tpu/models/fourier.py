"""Learned Fourier-space filter block.

Functional re-design of the reference ``FourierFeatures``
(/root/reference/dquartic/model/unet1d.py:831-870): rFFT2 over the
(length, width) axes, multiply by a learned complex weight, inverse
rFFT2. The reference defines it but never wires it in; it is provided
here as an optional global-context block (FFTs lower to XLA's
TPU-optimized kernels).

Layout: feature-last (batch, h, w, channels); the torch reference is
channel-first with weight (dim, h, w, 2).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class FourierFeatures(nn.Module):
    dim: int
    h: int = 10000
    w: int = 34
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        # rfft2 over (h, w): last transformed axis halves to w//2 + 1
        weight = self.param(
            "complex_weight",
            nn.initializers.normal(0.02),
            (self.dim, self.h, self.w, 2),
            jnp.float32,
        )
        xf = jnp.fft.rfft2(x.astype(jnp.float32), axes=(1, 2), norm="ortho")
        wf = jnp.transpose(
            weight[..., 0] + 1j * weight[..., 1], (1, 2, 0)
        )  # (h, w, dim) complex
        xf = xf * wf[None, : xf.shape[1], : xf.shape[2], :]
        out = jnp.fft.irfft2(xf, s=(h, w), axes=(1, 2), norm="ortho")
        return out.astype(self.dtype)
