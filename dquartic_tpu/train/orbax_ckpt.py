"""Orbax checkpoint backend for at-scale training.

The default msgpack backend (:mod:`dquartic_tpu.train.checkpoint`) writes
one portable file synchronously — right for small models and for parity
with the reference's single-file torch.save semantics. For the canonical
1.2B-parameter UNet1d, per-epoch synchronous writes stall the TPU; this
backend provides:

  * async saves (training continues while the previous state serializes),
  * sharded/distributed-friendly storage (each host writes its shards),
  * the same latest/best + auto-resume protocol.

Select with ``Trainer-level`` code or CLI config
``tpu.checkpoint_backend: "orbax"``.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

LATEST_NAME = "dquartic_latest_checkpoint.orbax"


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())


class OrbaxCheckpointBackend:
    """latest/best checkpoint pair with async writes."""

    def __init__(self):
        self._ckptr = _checkpointer()

    def latest_path_for(self, checkpoint_path: str) -> str:
        d = os.path.dirname(os.path.abspath(checkpoint_path))
        return os.path.join(d, LATEST_NAME)

    def save(self, path: str, payload: Dict[str, Any]) -> None:
        path = os.path.abspath(path)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        # numpy scalars -> 0-d arrays (orbax rejects bare numpy scalars)
        payload = jax.tree_util.tree_map(
            lambda x: np.asarray(x) if isinstance(x, np.generic) else x, payload
        )
        self._ckptr.save(path, payload, force=True)

    def wait(self) -> None:
        self._ckptr.wait_until_finished()

    def load(self, path: str, template: Optional[Dict[str, Any]] = None):
        path = os.path.abspath(path)
        if not os.path.exists(path):
            return None
        self.wait()
        import orbax.checkpoint as ocp

        restore_args = None
        if template is not None:
            template = jax.tree_util.tree_map(
                lambda x: np.asarray(x) if isinstance(x, np.generic) else x, template
            )
            restore_args = ocp.checkpoint_utils.construct_restore_args(template)
            return self._ckptr.restore(
                path, args=ocp.args.PyTreeRestore(
                    item=template, restore_args=restore_args
                )
            )
        return self._ckptr.restore(path)

    def restore_or_init(
        self, checkpoint_path: str, init_payload: Dict[str, Any]
    ) -> Tuple[Dict[str, Any], int, float, bool]:
        latest = self.latest_path_for(checkpoint_path)
        restored = self.load(latest, template=init_payload)
        if restored is None:
            print(f"No checkpoint ({latest}) found. Starting from scratch.")
            return init_payload, 0, float("inf"), False
        epoch = int(np.asarray(restored["epoch"]))
        best_loss = float(np.asarray(restored["best_loss"]))
        print(f"Resumed from ({latest}) epoch {epoch}, best loss {best_loss:.6f}")
        return restored, epoch, best_loss, True
