"""Device mesh ownership.

The reference has no distributed support at all (single
``torch.device("cuda")``, SURVEY.md §2.4); here parallelism is a
first-class subsystem. This module is the single owner of mesh
construction and axis naming:

  * ``dp`` — data parallel: batch axis sharded over ICI; gradient
    all-reduce is inserted implicitly by SPMD when the loss mean crosses
    the sharded batch axis.
  * ``tp`` — tensor parallel: output/input feature axes of the wide
    bottleneck convolutions (the ~10k-channel mid blocks hold almost all
    parameters) are sharded; XLA SPMD places the matching collectives.

Within a slice both axes ride ICI; multi-slice layouts should keep ``dp``
outermost so only gradient reductions cross DCN.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    dp: Optional[int] = None,
    tp: int = 1,
    sp: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (dp[, sp], tp) mesh over the given (default: all) devices.

    ``dp=None`` uses every device not consumed by ``sp * tp``. ``sp`` is
    the sequence-parallel axis: the m/z axis of U-Net activations shards
    over it (XLA inserts conv halo exchanges), for windows too large for
    one chip's HBM. When ``sp == 1`` the mesh stays 2-axis for backward
    compatibility.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if tp < 1 or sp < 1 or n % (tp * sp) != 0:
        raise ValueError(f"sp*tp={sp}*{tp} must divide device count {n}")
    if dp is None:
        dp = n // (tp * sp)
    if dp * sp * tp != n:
        raise ValueError(f"dp*sp*tp = {dp}*{sp}*{tp} != {n} devices")
    if sp == 1:
        dev_array = np.asarray(devices).reshape(dp, tp)
        return Mesh(dev_array, ("dp", "tp"))
    dev_array = np.asarray(devices).reshape(dp, sp, tp)
    return Mesh(dev_array, ("dp", "sp", "tp"))


def mesh_axis_sizes(mesh: Optional[Mesh]) -> Dict[str, int]:
    if mesh is None:
        return {"dp": 1, "tp": 1}
    return dict(zip(mesh.axis_names, mesh.devices.shape))
