"""PyTorch -> JAX checkpoint conversion.

Maps reference state_dicts onto this framework's parameter trees so
trained reference checkpoints reproduce here (the parity requirement in
BASELINE.json). Layout conventions converted:

  * torch Conv1d weight (out, in, k)  -> flax kernel (k, in, out)
  * torch Linear weight (out, in)     -> flax kernel (in, out)
  * torch RMSNorm/LayerNorm1d g,b (1, C, 1) -> (C,)
  * torch MultiheadAttention packed in_proj (3h, h) -> separate q/k/v

Module-name correspondence follows the reference structure
(/root/reference/dquartic/model/unet1d.py:918-1084 and
building_blocks.py:179-260); the flax modules were named to make this
mapping mechanical (see models/unet1d.py).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import numpy as np


def _conv(sd: Dict[str, np.ndarray], torch_name: str) -> Dict[str, np.ndarray]:
    out = {"kernel": np.transpose(sd[f"{torch_name}.weight"], (2, 1, 0))}
    if f"{torch_name}.bias" in sd:
        out["bias"] = sd[f"{torch_name}.bias"]
    return out


def _dense(sd: Dict[str, np.ndarray], torch_name: str) -> Dict[str, np.ndarray]:
    out = {"kernel": np.transpose(sd[f"{torch_name}.weight"], (1, 0))}
    if f"{torch_name}.bias" in sd:
        out["bias"] = sd[f"{torch_name}.bias"]
    return out


def _chan_norm(sd: Dict[str, np.ndarray], torch_name: str, bias: bool = False) -> Dict[str, np.ndarray]:
    out = {"g": sd[f"{torch_name}.g"].reshape(-1)}
    if bias and f"{torch_name}.b" in sd:
        out["b"] = sd[f"{torch_name}.b"].reshape(-1)
    return out


def _resnet_block(sd, prefix: str, has_res_conv: bool) -> Dict[str, Any]:
    out = {
        "block1": {
            "proj": _conv(sd, f"{prefix}.block1.proj"),
            "norm": _chan_norm(sd, f"{prefix}.block1.norm"),
        },
        "block2": {
            "proj": _conv(sd, f"{prefix}.block2.proj"),
            "norm": _chan_norm(sd, f"{prefix}.block2.norm"),
        },
    }
    if f"{prefix}.mlp.1.weight" in sd:
        out["mlp"] = _dense(sd, f"{prefix}.mlp.1")
    if has_res_conv and f"{prefix}.res_conv.weight" in sd:
        out["res_conv"] = _conv(sd, f"{prefix}.res_conv")
    return out


def _linear_attention(sd, prefix: str) -> Dict[str, Any]:
    return {
        "to_qkv": _conv(sd, f"{prefix}.to_qkv"),
        "to_out_conv": _conv(sd, f"{prefix}.to_out.0"),
        "to_out_norm": _chan_norm(sd, f"{prefix}.to_out.1"),
    }


def _attention(sd, prefix: str, cross: bool) -> Dict[str, Any]:
    out = {"to_out": _conv(sd, f"{prefix}.to_out")}
    if cross:
        out["to_qv"] = _conv(sd, f"{prefix}.to_qv")
        out["to_k"] = _conv(sd, f"{prefix}.to_k")
    else:
        out["to_qkv"] = _conv(sd, f"{prefix}.to_qkv")
    return out


def convert_unet1d_state_dict(
    sd: Dict[str, np.ndarray], dim_mults: Sequence[int], conditional: bool = True,
    simple: bool = True,
) -> Dict[str, Any]:
    """Convert a reference UNet1d state_dict to a flax param dict
    (the ``{"params": ...}`` tree)."""
    sd = {k: np.asarray(v, dtype=np.float32) for k, v in sd.items()}
    n_levels = len(dim_mults)
    p: Dict[str, Any] = {}

    p["init_conv"] = _conv(sd, "init_conv")
    p["time_mlp_1"] = _dense(sd, "time_mlp.1")
    p["time_mlp_3"] = _dense(sd, "time_mlp.3")

    if conditional:
        p["init_cond_proj"] = {"to_scale_shift": _dense(sd, "init_cond_proj.to_scale_shift.1")}
        if simple:
            p["attn_rt_conv1"] = _conv(sd, "attn_cond_proj.1.0")
            p["attn_rt_conv2"] = _conv(sd, "attn_cond_proj.1.2")
        else:
            p["attn_mz_conv"] = _conv(sd, "attn_cond_proj.0.0")
            p["attn_mz_res1"] = _resnet_block(sd, "attn_cond_proj.0.1", True)
            p["attn_mz_res2"] = _resnet_block(sd, "attn_cond_proj.0.2", True)
            p["attn_mz_attn_norm"] = _chan_norm(sd, "attn_cond_proj.0.3.fn.norm")
            p["attn_mz_attn_fn"] = _linear_attention(sd, "attn_cond_proj.0.3.fn.fn")

    for i in range(n_levels):
        is_last = i >= n_levels - 1
        p[f"downs_{i}_block1"] = _resnet_block(sd, f"downs.{i}.0", True)
        p[f"downs_{i}_block2"] = _resnet_block(sd, f"downs.{i}.1", True)
        p[f"downs_{i}_attn_norm"] = _chan_norm(sd, f"downs.{i}.2.fn.norm")
        p[f"downs_{i}_attn_fn"] = _linear_attention(sd, f"downs.{i}.2.fn.fn")
        if is_last:
            p[f"downs_{i}_downsample"] = _conv(sd, f"downs.{i}.3")
        else:
            p[f"downs_{i}_downsample"] = {"conv": _conv(sd, f"downs.{i}.3")}

    p["mid_block1"] = _resnet_block(sd, "mid_block1", True)
    p["mid_attn_norm"] = _chan_norm(sd, "mid_attn.fn.norm")
    if simple:
        p["mid_attn_fn"] = _attention(sd, "mid_attn.fn.fn", cross=conditional)
    else:
        raise NotImplementedError(
            "The reference simple=False Transformer1d forward crashes "
            "(unet1d.py:822); no reference checkpoints exist for it."
        )
    p["mid_block2"] = _resnet_block(sd, "mid_block2", True)

    for i in range(n_levels):
        is_last = i == n_levels - 1
        p[f"ups_{i}_block1"] = _resnet_block(sd, f"ups.{i}.0", True)
        p[f"ups_{i}_block2"] = _resnet_block(sd, f"ups.{i}.1", True)
        p[f"ups_{i}_attn_norm"] = _chan_norm(sd, f"ups.{i}.2.fn.norm")
        p[f"ups_{i}_attn_fn"] = _linear_attention(sd, f"ups.{i}.2.fn.fn")
        if is_last:
            p[f"ups_{i}_upsample"] = _conv(sd, f"ups.{i}.3")
        else:
            p[f"ups_{i}_upsample"] = {"conv": _conv(sd, f"ups.{i}.3.1")}

    p["final_res_block"] = _resnet_block(sd, "final_res_block", True)
    p["final_conv"] = _conv(sd, "final_conv")
    return {"params": p}


def convert_custom_transformer_state_dict(
    sd: Dict[str, np.ndarray], num_layers: int, hidden_dim: int
) -> Dict[str, Any]:
    """Convert a reference CustomTransformer state_dict."""
    sd = {k: np.asarray(v, dtype=np.float32) for k, v in sd.items()}
    p: Dict[str, Any] = {
        "input_projection": _dense(sd, "input_projection"),
        "conditional_projection": _dense(sd, "conditional_projection"),
        "output_projection": _dense(sd, "output_projection"),
        "time_embedding": {
            "linear1": _dense(sd, "time_embedding.linear1"),
            "linear2": _dense(sd, "time_embedding.linear2"),
        },
    }
    h = hidden_dim
    for i in range(num_layers):
        pre = f"layers.{i}"
        w = sd[f"{pre}.attention.in_proj_weight"]  # (3h, h)
        b = sd[f"{pre}.attention.in_proj_bias"]  # (3h,)
        qw, kw, vw = w[:h], w[h : 2 * h], w[2 * h :]
        qb, kb, vb = b[:h], b[h : 2 * h], b[2 * h :]
        p[f"layers_{i}"] = {
            "q_proj": {"kernel": qw.T, "bias": qb},
            "k_proj": {"kernel": kw.T, "bias": kb},
            "v_proj": {"kernel": vw.T, "bias": vb},
            "out_proj": _dense(sd, f"{pre}.attention.out_proj"),
            "norm1": {
                "scale": sd[f"{pre}.norm1.weight"],
                "bias": sd[f"{pre}.norm1.bias"],
            },
            "norm2": {
                "scale": sd[f"{pre}.norm2.weight"],
                "bias": sd[f"{pre}.norm2.bias"],
            },
            "ff1": _dense(sd, f"{pre}.ff.0"),
            "ff2": _dense(sd, f"{pre}.ff.2"),
        }
    return {"params": p}


def load_torch_state_dict(path: str) -> Dict[str, Any]:
    """Load ``model_state_dict`` (and metadata) from a torch checkpoint."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(ckpt, dict) and "model_state_dict" in ckpt:
        sd = ckpt["model_state_dict"]
        meta = {
            "epoch": int(ckpt.get("epoch", 0)),
            "best_loss": float(ckpt.get("best_loss", float("inf"))),
        }
    else:
        sd, meta = ckpt, {"epoch": 0, "best_loss": float("inf")}
    sd = {k: v.detach().cpu().numpy() for k, v in sd.items()}
    return {"state_dict": sd, **meta}


def convert_checkpoint_file(torch_path: str, out_path: str, config_path: str) -> None:
    """Convert a reference .ckpt to this framework's msgpack format."""
    from ..train.checkpoint import save_checkpoint
    from ..utils.config import load_train_config

    config = load_train_config(config_path)
    loaded = load_torch_state_dict(torch_path)
    sd = loaded["state_dict"]
    m = config["model"]
    if m["use_model"] == "UNet1d":
        params = convert_unet1d_state_dict(
            sd,
            dim_mults=m["UNet1d"]["dim_mults"],
            conditional=m["UNet1d"]["conditional"],
            simple=m["UNet1d"]["simple"],
        )
    elif m["use_model"] == "CustomTransformer":
        params = convert_custom_transformer_state_dict(
            sd,
            num_layers=m["CustomTransformer"]["num_layers"],
            hidden_dim=m["CustomTransformer"]["hidden_dim"],
        )
    else:
        raise ValueError(f"Unknown use_model: {m['use_model']}")

    payload = {
        "epoch": np.int64(loaded["epoch"]),
        "best_loss": np.float64(loaded["best_loss"]),
        "state": {"step": np.int32(0), "params": params, "ema_params": params},
    }
    save_checkpoint(out_path, payload)
