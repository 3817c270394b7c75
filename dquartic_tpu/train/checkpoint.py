"""Single-file checkpointing with auto-resume.

Mirrors the reference's checkpoint semantics
(/root/reference/dquartic/model/model_interface.py:561-628): a "latest"
checkpoint named ``dquartic_latest_checkpoint.ckpt`` written next to the
configured best-model path every epoch, plus a separate best-loss file;
training auto-resumes from the latest file when present.

Serialization is flax msgpack (a single portable file, like torch.save)
holding ``{epoch, best_loss, params, opt_state, ema_params, step}``.
Device arrays are pulled to host before writing; loading returns numpy
trees which jax re-shards on first use.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization

LATEST_NAME = "dquartic_latest_checkpoint.ckpt"


def latest_path_for(checkpoint_path: str) -> str:
    """``<dirname(checkpoint_path)>/dquartic_latest_checkpoint.ckpt``
    (reference model_interface.py:386-390)."""
    d = os.path.dirname(checkpoint_path)
    return os.path.join(d, LATEST_NAME) if d else LATEST_NAME


def save_checkpoint(path: str, payload: Dict[str, Any]) -> None:
    """Atomically write a checkpoint file."""
    host = jax.tree_util.tree_map(lambda x: np.asarray(x), payload)
    data = serialization.msgpack_serialize(serialization.to_state_dict(host))
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Optional[Dict[str, Any]]:
    """Load a checkpoint, or None when the file does not exist."""
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def restore_or_init(
    checkpoint_path: str, init_payload: Dict[str, Any]
) -> Tuple[Dict[str, Any], int, float, bool]:
    """Auto-resume: load latest checkpoint if present, else the fresh state.

    Returns ``(payload, start_epoch, best_loss, resumed)``. Matches the
    reference's resume protocol (model_interface.py:583-600): epoch and
    best_loss come from the file; missing file starts from scratch.
    """
    latest = latest_path_for(checkpoint_path)
    ckpt = load_checkpoint(latest)
    if ckpt is None:
        print(f"No checkpoint ({latest}) found. Starting from scratch.")
        return init_payload, 0, float("inf"), False

    print(f"Loading checkpoint from {latest}...")
    # Restore with the init payload as the type/structure template.
    restored = serialization.from_state_dict(init_payload, ckpt)
    epoch = int(restored["epoch"])
    best_loss = float(restored["best_loss"])
    print(f"Resumed from ({latest}) epoch {epoch}, best loss {best_loss:.6f}")
    return restored, epoch, best_loss, True
