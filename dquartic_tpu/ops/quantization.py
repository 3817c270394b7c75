"""Weight quantization for inference.

TPU-native counterpart of the reference's eager-mode int8 post-training
quantization experiment (SURVEY.md §2.5;
/root/reference/nbs/quantization_experiment.ipynb — QuantStub/Histogram
observers, 14 GB -> 10 GB checkpoint). Here quantization is symmetric
per-output-channel int8 on the weight tensors, applied to the whole
parameter tree:

  * :func:`quantize_params` / :func:`dequantize_params` — int8 values +
    float32 scales, ~4x smaller checkpoints for the conv-heavy UNet1d
    (whose ~10k-channel bottleneck convolutions hold almost all bytes).
  * :class:`QuantizedParams` trees serialize through the normal msgpack
    checkpoint path.
  * Dequantization happens on device at load (or lazily per-apply with
    ``apply_quantized``); XLA fuses the scale multiply into the consumer
    matmul/conv, so inference math stays bf16/f32 on the MXU.

Small tensors (biases, norm scales) stay float32 — quantizing them saves
nothing and costs accuracy.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

QUANT_SUFFIX_VALUES = "::q_values"
QUANT_SUFFIX_SCALE = "::q_scale"
_MIN_QUANT_SIZE = 4096  # below this, int8 overhead beats the savings


def _quantize_leaf(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-last-axis-channel int8 quantization."""
    x32 = jnp.asarray(x, jnp.float32)
    absmax = jnp.max(jnp.abs(x32), axis=tuple(range(x32.ndim - 1)), keepdims=True)
    scale = jnp.maximum(absmax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(x32 / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def _dequantize_leaf(q: jnp.ndarray, scale: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    return (q.astype(jnp.float32) * scale).astype(dtype)


def quantize_params(params: Any, min_size: int = _MIN_QUANT_SIZE) -> Dict[str, Any]:
    """Quantize a parameter tree. Returns a dict tree in which each
    quantized leaf ``name`` is replaced by ``name::q_values`` /
    ``name::q_scale`` siblings; small leaves pass through unchanged."""

    def walk(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if isinstance(v, dict):
                    out[k] = walk(v)
                else:
                    arr = jnp.asarray(v)
                    if arr.size >= min_size and arr.ndim >= 2 and jnp.issubdtype(arr.dtype, jnp.floating):
                        qv, sc = _quantize_leaf(arr)
                        out[k + QUANT_SUFFIX_VALUES] = qv
                        out[k + QUANT_SUFFIX_SCALE] = sc
                    else:
                        out[k] = arr
            return out
        return node

    return walk(params)


def dequantize_params(qparams: Any, dtype=jnp.float32) -> Any:
    """Invert :func:`quantize_params`."""

    def walk(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if isinstance(v, dict):
                    out[k] = walk(v)
                elif k.endswith(QUANT_SUFFIX_VALUES):
                    base = k[: -len(QUANT_SUFFIX_VALUES)]
                    scale = node[base + QUANT_SUFFIX_SCALE]
                    out[base] = _dequantize_leaf(v, jnp.asarray(scale), dtype)
                elif k.endswith(QUANT_SUFFIX_SCALE):
                    continue
                else:
                    out[k] = jnp.asarray(v)
            return out
        return node

    return walk(qparams)


def apply_quantized(model, qparams: Any, *args, dtype=jnp.float32, **kwargs):
    """Run ``model.apply`` with a quantized parameter tree, dequantizing
    lazily inside the traced computation.

    Under ``jax.jit`` the int8 values + scales are the only weight
    residents the caller must keep live; inside a sampling ``lax.scan``
    XLA hoists the dequantize out of the loop, so step speed matches
    dequantize-at-load while checkpoints/host transfers stay ~4x smaller.
    """
    return model.apply(dequantize_params(qparams, dtype=dtype), *args, **kwargs)


def quantized_nbytes(tree: Any) -> int:
    return sum(
        np.asarray(l).nbytes for l in jax.tree_util.tree_leaves(tree)
    )


def quantize_mid_block_params(variables: Any) -> Any:
    """Convert a trained UNet1d tree for ``UNet1d(quantize_mid=True)``.

    Replaces each mid-block conv (``mid_block{1,2}/block{1,2}/proj``:
    {kernel (k, C_in, C_out), bias}) with the stored int8 layout
    ({kernel_q (K_pad, N_pad) int8, kernel_scale (N_pad,) f32, bias})
    the :class:`~dquartic_tpu.models.layers.Int8Conv1d` module declares.
    These four convs hold ~1.2B of the canonical model's 1.206B params;
    everything else passes through unchanged. Accepts either the full
    ``{"params": ...}`` variables dict or the params subtree.
    """
    from .int8_matmul import quantize_conv_kernel

    import flax

    tree = flax.core.unfreeze(variables) if hasattr(variables, "unfreeze") else variables

    def convert_proj(proj: Dict[str, Any]) -> Dict[str, Any]:
        q, scale = quantize_conv_kernel(jnp.asarray(proj["kernel"]))
        out = {"kernel_q": q, "kernel_scale": scale}
        if "bias" in proj:
            out["bias"] = jnp.asarray(proj["bias"])
        return out

    def walk(node, in_mid=False):
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            if in_mid and k == "proj" and isinstance(v, dict) and "kernel" in v:
                out[k] = convert_proj(v)
            else:
                out[k] = walk(v, in_mid or k.startswith("mid_block"))
        return out

    return walk(tree)


def stochastic_round_to_int8(x: jnp.ndarray, key: jax.Array) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Stochastic-rounding int8 quantization (training-friendly variant).

    On TPU a Pallas kernel using the hardware PRNG
    (``pltpu.prng_random_bits`` + ``pltpu.stochastic_round``) would fuse
    this; the jnp formulation below is backend-portable and XLA fuses it
    to a single pass.
    """
    x32 = jnp.asarray(x, jnp.float32)
    absmax = jnp.max(jnp.abs(x32), axis=tuple(range(x32.ndim - 1)), keepdims=True)
    scale = jnp.maximum(absmax / 127.0, 1e-12)
    scaled = x32 / scale
    floor = jnp.floor(scaled)
    frac = scaled - floor
    rnd = jax.random.uniform(key, x32.shape)
    q = jnp.clip(floor + (rnd < frac), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)
