"""Conditional 1-D U-Net denoiser.

TPU-native re-design of the reference ``UNet1d``
(/root/reference/dquartic/model/unet1d.py:874-1165): per-RT-row 1-D conv
stacks over the m/z axis, with the bottleneck pivoted so full attention
(with MS1 cross-attention) runs over the short RT axis.

Differences from the reference, all parity-preserving at the shipped
batch_size=1 config:

  * Feature-last layout (rows, mz, channels) — lanes map to channels.
  * The time embedding is explicitly repeated per RT row; the reference
    relies on batch-size-1 broadcasting of a (1, C, 1) FiLM tensor
    (unet1d.py:315-318 + model_interface.py semantics) and would
    mis-broadcast for batch > 1.
  * The bottleneck channel count is derived from the **runtime** m/z
    length rather than the ``downsample_dim`` config (unet1d.py:1027), so
    small test shapes work; with the canonical 40000-bin input the two
    are identical.
  * The ``simple=False`` transformer path uses the fixed
    :class:`~dquartic_tpu.models.attention.Transformer1d` (the reference's
    crashes, unet1d.py:822) with a sane ``mlp_mult`` instead of the
    reference's accidental ``ch_mult=mlp_dim`` explosion (unet1d.py:792).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .attention import Attention, LinearAttention, RMSNormParam, Transformer1d, _ConvParams
from .fused_blocks import ResnetBlockT
from .layers import (
    ConditionalScaleShift,
    Downsample,
    ResnetBlock,
    RMSNorm,
    Upsample,
    conv1d,
    sinusoidal_pos_emb,
)

Dtype = jnp.dtype


class UNet1d(nn.Module):
    """See module docstring. Constructor args mirror the reference
    (unet1d.py:918-939) so JSON configs load unchanged."""

    dim: int
    init_dim: Optional[int] = None
    out_dim: Optional[int] = None
    dim_mults: Sequence[int] = (1, 2, 4, 8)
    channels: int = 3
    dropout: float = 0.0
    conditional: bool = True
    init_cond_channels: Optional[int] = None
    attn_cond_channels: Optional[int] = None
    attn_cond_init_dim: Optional[int] = None
    learned_variance: bool = False
    sinusoidal_pos_emb_theta: float = 10000.0
    attn_heads: int = 4
    attn_dim_head: int = 32
    tfer_dim_mult: int = 620
    tfer_depth: int = 4
    downsample_dim: int = 40000
    simple: bool = True
    pos_output_only: bool = False
    attn_impl: str = "auto"
    linear_attn_impl: str = "auto"
    # Sequence-parallel activation sharding: ("dp", "sp") names the mesh
    # axes for the row dim (b*rt) and the m/z dim of per-row activations.
    # XLA SPMD inserts the conv halo exchanges. Requires running under a
    # mesh that defines those axes; None = no constraints (default).
    activation_sharding: Optional[Tuple[str, str]] = None
    dtype: Dtype = jnp.float32
    # Run the mid-block convolutions with int8 weights dequantized inside
    # a Pallas kernel (ops/int8_matmul.py). These 4 convs hold ~1.2B of
    # the canonical model's 1.206B params and are the forward pass's
    # measured weight-bound floor; int8 halves the stream. Inference-only
    # (no custom vjp): convert a trained tree with
    # ops.quantization.quantize_mid_block_params.
    quantize_mid: bool = False
    # Run the per-row down/up path **transposed-resident**: activations
    # stay logically (b*rt, C, mz') with m/z on the minor axis, every
    # ResnetBlock is one fused Pallas launch (ops/fused_resnet.py), the
    # linattn kernel's boundary transposes cancel against the model's,
    # and the bottleneck pivot / final head become pure reshapes. Kills
    # the ~5.6 ms of rows-minor <-> mz-minor relayout copies the round-3
    # trace found (BENCH_NOTES.md roofline). Trainable: the kernel's
    # custom_vjp runs a recompute-based backward Pallas pass that saves
    # only (x, params) — remat-equivalent by construction. Requires
    # dropout == 0; incompatible with activation_sharding.
    fused_resnet: bool = False
    # Mesh axis the batch is data-parallel sharded over. A bare
    # pallas_call has no jit-SPMD partitioning rule — XLA all-gathers the
    # row-sharded activations and replicates the kernel on every device.
    # With kernel_dp_axis set, every Pallas call site (linear attention,
    # fused ResnetBlocks) runs its shard_map row-sharded variant instead:
    # each device runs the unchanged kernel on its own rows, weight
    # gradients are psum'd — numerically identical to single-device, and
    # dp training keeps the kernel fast path. Incompatible with
    # activation_sharding (sp partitions the m/z axis the kernels own).
    kernel_dp_axis: Optional[str] = None
    # Rematerialize ResNet blocks in the backward pass: trades FLOPs for
    # HBM so full-resolution windows (e.g. rt=340 x mz=30000 from the
    # reference's production data-gen settings, run_data_gen.sh) fit.
    # Requires dropout == 0 (the only path that branches on
    # `deterministic`).
    remat_blocks: bool = False
    # Rematerialize the linear-attention mixers in the backward pass.
    # Only relevant for the XLA impl, whose saved qkv/softmax expansions
    # are 24-96x wider than the (N, C<=16) activations around them (bs2
    # full-resolution training otherwise overflows a 16 GB chip by
    # ~0.2 GB; the recompute costs ~26 ms/step). The Pallas kernel's
    # custom vjp already saves only (x, weights), making this a no-op
    # memory-wise on the kernel path. Measured in BENCH_NOTES.md.
    remat_linear_attn: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        time: jnp.ndarray,
        init_cond: Optional[jnp.ndarray] = None,
        attn_cond: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        if x.ndim == 2:  # (rt, mz) -> (1, rt, mz), reference unet1d.py:1099-1104
            x = x[None]
            squeeze_out = True
        else:
            squeeze_out = False
        b, rt, mz = x.shape
        stride = 2 ** (len(self.dim_mults) - 1)
        if mz % stride != 0:
            raise ValueError(
                f"UNet1d requires the m/z length to be divisible by "
                f"2**(len(dim_mults)-1) = {stride} so the {len(self.dim_mults)}-level "
                f"down/up path round-trips (got mz={mz}; pad or re-bin the input, "
                f"e.g. to {((mz + stride - 1) // stride) * stride})"
            )
        dtype = self.dtype
        # Under SPMD activation sharding the m/z axis is partitioned across
        # the mesh. Linear attention keeps the Pallas fast path via the
        # sequence-parallel split-phase kernels (ops/linear_attention.py sp
        # section): LinearAttention receives the (dp, sp) axis names and
        # per level engages the kernel when the m/z width divides the sp
        # axis, falling back to XLA otherwise (round 3 fell back to the
        # ~4x-slower XLA path for every level).
        la_impl = self.linear_attn_impl
        la_dp_axis, la_sp_axis = self.kernel_dp_axis, None
        if self.activation_sharding is not None:
            la_dp_axis, la_sp_axis = self.activation_sharding
        fuse = self.fused_resnet
        if fuse and self.activation_sharding is not None:
            raise ValueError("fused_resnet is incompatible with activation_sharding")
        if self.kernel_dp_axis is not None and self.activation_sharding is not None:
            raise ValueError(
                "kernel_dp_axis is incompatible with activation_sharding (sp "
                "partitions the m/z axis the Pallas kernels own; use the XLA "
                "impl under sp instead)"
            )
        dp_ax = self.kernel_dp_axis
        if fuse and self.dropout > 0:
            raise ValueError(
                "fused_resnet requires dropout == 0 (the fused kernel has no "
                "dropout path)"
            )
        if self.remat_blocks:
            if self.dropout > 0:
                raise ValueError("remat_blocks requires dropout == 0")
            ResBlock = nn.remat(ResnetBlock)
        else:
            ResBlock = ResnetBlock
        # static_argnums: 0 is self; 3 is the python-bool `residual` flag
        # of LinearAttention.__call__ (tracing it breaks jax.checkpoint)
        LinAttn = (
            nn.remat(LinearAttention, static_argnums=(3,))
            if self.remat_linear_attn
            else LinearAttention
        )

        init_dim = self.init_dim if self.init_dim is not None else self.dim
        time_dim = self.dim * 4
        n_levels = len(self.dim_mults)
        dims = [init_dim] + [self.dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))

        if time.ndim == 0:
            time = time[None]

        # ---- time embedding (unet1d.py:956-960, 1105) ------------------- #
        t = sinusoidal_pos_emb(time, self.dim, self.sinusoidal_pos_emb_theta)
        t = nn.Dense(time_dim, dtype=dtype, param_dtype=jnp.float32, name="time_mlp_1")(t)
        t = nn.gelu(t, approximate=False)
        t = nn.Dense(time_dim, dtype=dtype, param_dtype=jnp.float32, name="time_mlp_3")(t)
        t_rows = jnp.repeat(t, rt, axis=0)  # (b*rt, time_dim): per-row FiLM

        # ---- input rows ------------------------------------------------- #
        x = x.reshape(b * rt, mz, 1).astype(dtype)

        if self.conditional:
            if init_cond is None:
                init_cond = jnp.zeros((b, rt, mz), dtype)
            if init_cond.ndim == 2:
                init_cond = init_cond[None]
            ic = init_cond.reshape(b * rt, mz, self.init_cond_channels or 1).astype(dtype)
            ic = ConditionalScaleShift(
                self.init_cond_channels or 1, dtype=dtype, name="init_cond_proj"
            )(ic, t_rows)
            # torch cat((init_cond, x), dim=channel) — unet1d.py:1115
            x = jnp.concatenate([ic, x], axis=-1)

        def constrain(rows):
            """Optional (dp, sp) sharding hint on (b*rt, mz', C) tensors."""
            if self.activation_sharding is None:
                return rows
            from jax.sharding import PartitionSpec as P

            dp_ax, sp_ax = self.activation_sharding
            return jax.lax.with_sharding_constraint(rows, P(dp_ax, sp_ax, None))

        x = conv1d(init_dim, 7, padding=3, dtype=dtype, name="init_conv")(x)
        x = constrain(x)
        if fuse:
            # enter the transposed-resident region: ONE real transpose;
            # every later layout flip either cancels against a kernel
            # boundary or degenerates to a reshape.
            x = jnp.swapaxes(x, 1, 2)  # (b*rt, C, mz)
        r = x

        def rows_block(h, dim_o, name):
            """ResnetBlock on per-row activations (both layouts)."""
            if fuse:
                return ResnetBlockT(
                    dim_o, time_emb_dim=time_dim, dtype=dtype, dp_axis=dp_ax,
                    name=name,
                )(h, t_rows)
            return ResBlock(
                dim_o, time_emb_dim=time_dim, dropout=self.dropout, dtype=dtype,
                name=name,
            )(h, t_rows, deterministic)

        def rows_linattn(h, dim_, name_norm, name_fn):
            """norm -> linattn -> +residual sandwich; under fuse the
            swapaxes pair cancels against the pallas_t kernel's own."""
            g_pre_ = RMSNormParam(dim_, name=name_norm)()
            attn = LinAttn(
                dim_, impl=la_impl, dtype=dtype, dp_axis=la_dp_axis,
                sp_axis=la_sp_axis, name=name_fn,
            )
            if fuse:
                return jnp.swapaxes(attn(jnp.swapaxes(h, 1, 2), g_pre_, True), 1, 2)
            return attn(h, g_pre_, True)

        def rows_conv(h, mod):
            """Feature-last conv module applied in either layout."""
            if fuse:
                return jnp.swapaxes(mod(jnp.swapaxes(h, 1, 2)), 1, 2)
            return mod(h)

        # ---- MS1 condition tower (unet1d.py:966-1001, 1120-1130) -------- #
        cond = None
        if self.conditional:
            acid = (
                self.attn_cond_init_dim
                if self.attn_cond_init_dim is not None
                else self.dim * 2
            )
            if attn_cond is None:
                attn_cond = jnp.zeros((b, rt), dtype)
            if attn_cond.ndim == 2:  # (b, rt) scalar chromatogram
                ac = attn_cond.reshape(b * rt, 1, 1).astype(dtype)
            else:  # (b, rt, mz_c)
                ac = attn_cond.reshape(b * rt, attn_cond.shape[-1], 1).astype(dtype)

            if self.simple:
                pass  # mz_net = Identity (unet1d.py:974)
            else:
                ac = conv1d(acid, 7, padding=3, dtype=dtype, name="attn_mz_conv")(ac)
                ac = ResnetBlock(acid, time_emb_dim=None, dtype=dtype, name="attn_mz_res1")(ac)
                ac = ResnetBlock(acid, time_emb_dim=None, dtype=dtype, name="attn_mz_res2")(ac)
                g_pre = RMSNormParam(acid, name="attn_mz_attn_norm")()
                ac = LinAttn(
                    acid, impl=la_impl, dtype=dtype, dp_axis=la_dp_axis,
                    sp_axis=la_sp_axis, name="attn_mz_attn_fn",
                )(ac, g_pre, True)

            # pivot '(b rt) mz d -> b rt (d mz)' with channel-major (d, mz)
            # flattening order for checkpoint parity (unet1d.py:1129)
            _, mzc, dc = ac.shape
            ac = ac.reshape(b, rt, mzc, dc).transpose(0, 1, 3, 2).reshape(b, rt, dc * mzc)

            if self.simple:
                ac = conv1d(acid, 7, padding=3, dtype=dtype, name="attn_rt_conv1")(ac)
                ac = nn.gelu(ac, approximate=False)
                ac = conv1d(acid, 1, dtype=dtype, name="attn_rt_conv2")(ac)
            else:
                ac = Transformer1d(
                    dc * mzc,
                    depth=self.tfer_depth // 2,
                    heads=self.attn_heads,
                    dim_head=self.attn_dim_head,
                    attn_impl=self.attn_impl,
                    dtype=dtype,
                    name="attn_rt_tfer",
                )(ac)
            cond = ac  # (b, rt, cond_channels)

        # ---- down path (unet1d.py:1005-1025, 1134-1142) ----------------- #
        skips = []
        for i, (dim_in, dim_out) in enumerate(in_out):
            is_last = i >= (len(in_out) - 1)
            x = rows_block(x, dim_in, f"downs_{i}_block1")
            skips.append(x)

            x = rows_block(x, dim_in, f"downs_{i}_block2")
            # norm -> attn -> +x sandwich; the pallas_t kernel fuses all
            # three into one launch (pre-norm + residual live in VMEM)
            x = rows_linattn(x, dim_in, f"downs_{i}_attn_norm", f"downs_{i}_attn_fn")
            skips.append(x)

            if not is_last:
                mod = Downsample(dim_out, dtype=dtype, name=f"downs_{i}_downsample")
            else:
                mod = conv1d(dim_out, 3, padding=1, dtype=dtype, name=f"downs_{i}_downsample")
            x = rows_conv(x, mod)
            x = constrain(x)

        # ---- bottleneck: pivot to (b, rt, C*mz') (unet1d.py:1144-1148) --- #
        mid_dim = dims[-1]
        if fuse:
            # transposed rows are already channel-major: the pivot's (d, mz)
            # flattening is a pure reshape — no transpose op at all
            mzp = x.shape[2]
            x = x.reshape(b, rt, mid_dim * mzp)
        else:
            mzp = x.shape[1]  # = mz // 2**(n_levels-1) for canonical shapes
            x = x.reshape(b, rt, mzp, mid_dim).transpose(0, 1, 3, 2).reshape(b, rt, mid_dim * mzp)
        mid_ch = mid_dim * mzp

        x = ResBlock(
            mid_ch, time_emb_dim=time_dim, dropout=self.dropout,
            quantize_weights=self.quantize_mid, dtype=dtype, dp_axis=dp_ax,
            name="mid_block1",
        )(x, t, deterministic)

        xn = RMSNorm(mid_ch, dtype=dtype, name="mid_attn_norm")(x)
        if self.simple:
            attn_out = Attention(
                mid_ch,
                heads=self.attn_heads,
                dim_head=self.attn_dim_head,
                use_xattn=self.conditional,
                cond_dim=(cond.shape[-1] if cond is not None else 1),
                attn_impl=self.attn_impl,
                dtype=dtype,
                name="mid_attn_fn",
            )(xn, cond=cond)
        else:
            attn_out = Transformer1d(
                mid_ch,
                depth=self.tfer_depth,
                heads=self.attn_heads,
                dim_head=self.attn_dim_head,
                use_xattn=self.conditional,
                cond_dim=(cond.shape[-1] if cond is not None else 1),
                attn_impl=self.attn_impl,
                dtype=dtype,
                name="mid_attn_fn",
            )(xn, cond=cond)
        x = x + attn_out

        x = ResBlock(
            mid_ch, time_emb_dim=time_dim, dropout=self.dropout,
            quantize_weights=self.quantize_mid, dtype=dtype, dp_axis=dp_ax,
            name="mid_block2",
        )(x, t, deterministic)

        if fuse:
            x = x.reshape(b * rt, mid_dim, mzp)
        else:
            x = x.reshape(b, rt, mid_dim, mzp).transpose(0, 1, 3, 2).reshape(b * rt, mzp, mid_dim)

        # ---- up path (unet1d.py:1060-1076, 1150-1158) -------------------- #
        ch_axis = 1 if fuse else -1
        for i, (dim_in, dim_out) in enumerate(reversed(in_out)):
            is_last = i == (len(in_out) - 1)
            x = jnp.concatenate([x, skips.pop()], axis=ch_axis)
            x = rows_block(x, dim_out, f"ups_{i}_block1")

            x = jnp.concatenate([x, skips.pop()], axis=ch_axis)
            x = rows_block(x, dim_out, f"ups_{i}_block2")
            x = rows_linattn(x, dim_out, f"ups_{i}_attn_norm", f"ups_{i}_attn_fn")

            if not is_last:
                mod = Upsample(dim_in, dtype=dtype, name=f"ups_{i}_upsample")
            else:
                mod = conv1d(dim_in, 3, padding=1, dtype=dtype, name=f"ups_{i}_upsample")
            x = rows_conv(x, mod)
            x = constrain(x)

        # ---- head (unet1d.py:1078-1084, 1160-1165) ----------------------- #
        out_dim = (
            self.out_dim
            if self.out_dim is not None
            else self.channels * (2 if self.learned_variance else 1)
        )
        x = jnp.concatenate([x, r], axis=ch_axis)
        x = rows_block(x, init_dim, "final_res_block")
        # '(b rt) mz d -> b (rt d) mz' (unet1d.py:1164); transposed rows
        # make the final pivot a pure reshape too
        if fuse:
            kfc, bfc = _ConvParams(x.shape[1], out_dim, name="final_conv")()
            x = jnp.einsum("bcn,co->bon", x, kfc[0].astype(dtype))
            x = x + bfc.astype(dtype)[None, :, None]
            x = x.reshape(b, rt * out_dim, mz)
        else:
            x = conv1d(out_dim, 1, dtype=dtype, name="final_conv")(x)
            x = x.reshape(b, rt, mz, out_dim).transpose(0, 1, 3, 2).reshape(b, rt * out_dim, mz)
        if self.pos_output_only:
            x = nn.softplus(x)
        if squeeze_out and b == 1:
            pass  # reference returns (1, rt, mz) for 2-D input as well
        return x
