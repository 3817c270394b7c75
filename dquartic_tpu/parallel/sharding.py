"""Sharding rules: how parameter and data trees map onto the mesh.

Parameters are replicated by default; kernels with a feature axis wide
enough to split evenly over the ``tp`` axis are tensor-parallel sharded
(this captures the ~10k-channel bottleneck convolutions that hold almost
all of UNet1d's parameters). Optimizer-state leaves mirror their
parameter's sharding automatically because the rule is shape-driven.

Batch arrays shard their leading axis over ``dp``.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis data-parallel sharding."""
    return NamedSharding(mesh, P("dp"))


def _spec_for_shape(shape, tp: int, min_tp_features: int) -> P:
    """Choose a PartitionSpec for one array shape.

    Prefer sharding the last (output-feature) axis; fall back to the
    second-to-last (input-feature) axis. Arrays too small to split stay
    replicated — splitting tiny tensors only buys latency.
    """
    if tp <= 1 or len(shape) == 0:
        return P()
    nd = len(shape)
    if shape[-1] >= min_tp_features and shape[-1] % tp == 0:
        return P(*([None] * (nd - 1)), "tp")
    if nd >= 2 and shape[-2] >= min_tp_features and shape[-2] % tp == 0:
        return P(*([None] * (nd - 2)), "tp", None)
    return P()


def shardings_for_tree(
    tree: Any,
    mesh: Optional[Mesh],
    min_tp_features: int = 2048,
) -> Any:
    """NamedSharding tree for a parameter/optimizer/EMA state tree.

    ``tree`` may contain arrays or ShapeDtypeStructs (use with
    ``jax.eval_shape`` to plan shardings before allocating anything).
    """
    if mesh is None:
        return None
    tp = dict(zip(mesh.axis_names, mesh.devices.shape)).get("tp", 1)

    def leaf_sharding(x):
        shape = getattr(x, "shape", ())
        return NamedSharding(mesh, _spec_for_shape(tuple(shape), tp, min_tp_features))

    return jax.tree_util.tree_map(leaf_sharding, tree)


def shard_batch(batch: Any, mesh: Optional[Mesh]) -> Any:
    """Batch (host or device) -> leading axis split over ``dp``.

    Arrays that are already ``jax.Array``s (e.g. committed by the mesh-
    aware prefetcher) are *resharded on device* with ``jax.device_put`` —
    never pulled back through the host, which on a tunneled TPU would
    cost ~4 orders of magnitude more than the step itself (BENCH_NOTES.md
    chip calibration). Already-correctly-sharded arrays pass through
    untouched, so the hot path is a no-op.
    """
    if mesh is None:
        return batch
    sh = batch_sharding(mesh)

    def put(x):
        if isinstance(x, jax.Array):
            if x.sharding == sh:
                return x
            return jax.device_put(x, sh)
        return jax.device_put(np.asarray(x), sh)

    return jax.tree_util.tree_map(put, batch)
