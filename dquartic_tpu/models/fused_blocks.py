"""Transposed-resident ResnetBlock module backed by the fused Pallas
kernel (:mod:`dquartic_tpu.ops.fused_resnet`).

Round-3 roofline (BENCH_NOTES.md) showed the canonical forward's #2 cost
is ~5.6 ms of pure relayout copies: XLA alternates activations between
the conv stack's rows-minor layout and the Pallas linear-attention
kernels' mz-minor layout ~290 times per forward. Running the whole
down/up path **transposed-resident** — activations logically (B, C, N)
with m/z on lanes, ResnetBlocks as one fused kernel each, and the
linattn kernel's entry/exit transposes cancelling against the model's —
removes the cause instead of the symptom.

:class:`ResnetBlockT` declares the exact same parameter tree (module and
param names, shapes) as :class:`dquartic_tpu.models.layers.ResnetBlock`,
so one checkpoint runs on either path; forward and gradient equivalence
is pinned in tests/test_fused_resnet.py. Trainable: the kernel's
custom_vjp recomputes from (x, params) in a single backward Pallas pass,
so the fused path is remat-equivalent by construction (no dropout path —
requires dropout == 0).

Matches the reference block structure at
/root/reference/dquartic/model/unet1d.py:223-323.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..ops.fused_resnet import fused_resnet_block_t
from .attention import RMSNormParam, _ConvParams

Dtype = jnp.dtype


class _Conv3Params(nn.Module):
    """Parameter-only holder reproducing a width-3 ``nn.Conv`` subtree
    (kernel (3, in, out) + bias) with the same fan-in initialization."""

    in_features: int
    out_features: int
    kernel_width: int = 3

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(in_axis=(0, 1), out_axis=2),
            (self.kernel_width, self.in_features, self.out_features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.out_features,), jnp.float32
        )
        return kernel, bias


class _BlockParams(nn.Module):
    """Param holder for one ``Block`` (conv3 ``proj`` + RMSNorm ``norm``)."""

    in_features: int
    out_features: int

    @nn.compact
    def __call__(self):
        w, b = _Conv3Params(self.in_features, self.out_features, name="proj")()
        g = RMSNormParam(self.out_features, name="norm")()
        return w, b, g


class ResnetBlockT(nn.Module):
    """ResnetBlock on transposed ``(B, C, N)`` activations, one fused
    Pallas launch (conv3 -> RMSNorm -> FiLM -> SiLU -> conv3 -> RMSNorm
    -> SiLU -> +res). Parameter-tree-identical to
    :class:`~dquartic_tpu.models.layers.ResnetBlock`."""

    dim_out: int
    time_emb_dim: Optional[int] = None
    dtype: Dtype = jnp.float32
    block_n: int = 4096
    # mesh axis the rows are sharded over (data-parallel training): run
    # the shard_map variant so jit-SPMD keeps the kernel per-shard
    # instead of all-gathering around the custom call
    dp_axis: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        x_t: jnp.ndarray,
        time_emb: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        del deterministic  # no dropout path (UNet1d guards dropout == 0)
        c_in = x_t.shape[1]
        scale = shift = None
        if self.time_emb_dim is not None and time_emb is not None:
            h = nn.Dense(
                self.dim_out * 2, dtype=self.dtype, param_dtype=jnp.float32,
                name="mlp",
            )(nn.silu(time_emb))
            scale, shift = jnp.split(h, 2, axis=-1)  # (b, C) each

        w1, b1, g1 = _BlockParams(c_in, self.dim_out, name="block1")()
        w2, b2, g2 = _BlockParams(self.dim_out, self.dim_out, name="block2")()
        if c_in != self.dim_out:
            w_res, b_res = _ConvParams(c_in, self.dim_out, name="res_conv")()
        else:
            w_res = b_res = None

        return fused_resnet_block_t(
            x_t.astype(self.dtype), w1, b1, g1, scale, shift, w2, b2, g2,
            w_res, b_res, block_n=self.block_n, dp_axis=self.dp_axis,
        )
