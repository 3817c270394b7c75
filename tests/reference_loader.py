"""Load the reference PyTorch denoiser modules directly from their files.

The reference package ``__init__`` pulls in polars/duckdb (not installed
in this environment), so ``dquartic.model.unet1d`` / ``building_blocks``
are loaded by file path instead — they only need torch, einops, packaging
and ``rotary_embedding_torch``. The last one is not installed either; a
minimal, faithful stand-in is registered in ``sys.modules`` first.

The stand-in reproduces the public pip library's math exactly
(``RotaryEmbedding(dim)``: ``dim/2`` frequencies ``theta**(-2i/dim)``,
interleaved-duplicated; rotation applied to the first ``dim`` features of
each head over adjacent (even, odd) pairs, remainder passed through) —
the same contract documented at dquartic_tpu/models/attention.py
(rope_rotate), so the parity tests exercise the reference's actual RoPE
placement (unet1d.py:529, 560-561).
"""

from __future__ import annotations

import importlib.util
import sys
import types

REF_MODEL_DIR = "/root/reference/dquartic/model"


def _install_rotary_shim() -> None:
    if "rotary_embedding_torch" in sys.modules:
        return
    import torch
    from torch import nn

    class RotaryEmbedding(nn.Module):
        def __init__(self, dim: int, theta: float = 10000.0):
            super().__init__()
            freqs = 1.0 / (theta ** (torch.arange(0, dim, 2).float() / dim))
            self.register_buffer("freqs", freqs)

        def rotate_queries_or_keys(self, t, seq_dim: int = -2):
            seq = t.shape[seq_dim]
            f = torch.arange(seq, dtype=self.freqs.dtype)[:, None] * self.freqs[None, :]
            f = f.repeat_interleave(2, dim=-1)  # (seq, dim) interleaved dup
            rot = f.shape[-1]
            t_rot, t_pass = t[..., :rot], t[..., rot:]
            pairs = t_rot.reshape(*t_rot.shape[:-1], -1, 2)
            x1, x2 = pairs.unbind(-1)
            rotated = torch.stack((-x2, x1), dim=-1).reshape(t_rot.shape)
            out = t_rot * f.cos() + rotated * f.sin()
            return torch.cat((out, t_pass), dim=-1)

    mod = types.ModuleType("rotary_embedding_torch")
    mod.RotaryEmbedding = RotaryEmbedding
    sys.modules["rotary_embedding_torch"] = mod


def _install_wandb_stub() -> None:
    """model_interface.py imports wandb at module level but only *calls*
    it when use_wandb is on; a bare stub satisfies the import."""
    if "wandb" in sys.modules:
        return
    mod = types.ModuleType("wandb")
    mod.log = lambda *a, **k: None
    mod.Image = object
    mod.Table = object
    sys.modules["wandb"] = mod


def load_reference_ddim():
    """Import the reference DDIMDiffusionModel with its real package
    context (model.py's relative import of model_interface), so tests can
    *train and sample with the actual reference implementation*
    (model.py:151-406) rather than formula re-derivations."""
    _install_rotary_shim()
    _install_wandb_stub()
    if "refpkg.model" in sys.modules:
        return sys.modules["refpkg.model"]
    import importlib

    pkg = types.ModuleType("refpkg")
    pkg.__path__ = [REF_MODEL_DIR]
    sys.modules.setdefault("refpkg", pkg)
    return importlib.import_module("refpkg.model")


def load_reference_module(filename: str, modname: str):
    """Import ``/root/reference/dquartic/model/<filename>`` as ``modname``."""
    if modname in sys.modules:
        return sys.modules[modname]
    _install_rotary_shim()
    spec = importlib.util.spec_from_file_location(
        modname, f"{REF_MODEL_DIR}/{filename}"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[modname] = mod
    spec.loader.exec_module(mod)
    return mod
