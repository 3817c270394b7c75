"""Multi-host runtime initialization and per-process data feeding.

Single-slice multi-host TPU jobs (e.g. a v5e-8 is one host, but v5e-256
spans many) need the JAX distributed runtime up before any backend use;
each host then feeds only its local shard of the global batch. The
reference has no equivalent (single GPU); these helpers are the
framework's entry points for that:

  * :func:`initialize_runtime` — idempotent ``jax.distributed.initialize``
    driven by TPU environment auto-detection.
  * :func:`global_batch_from_local` — assemble a globally-sharded batch
    from process-local numpy arrays
    (``jax.make_array_from_process_local_data``), so the host-side
    pipeline only materializes its own rows.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_initialized = False


def initialize_runtime(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Bring up the distributed runtime (no-op for single-process jobs).

    Returns the process count. On TPU pods the arguments auto-detect from
    the environment; pass them explicitly elsewhere.
    """
    global _initialized
    if _initialized:
        return jax.process_count()
    if num_processes is None and coordinator_address is None:
        # single process (or TPU auto-detection not requested)
        _initialized = True
        return jax.process_count()
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True
    return jax.process_count()


def global_batch_from_local(local_batch: Any, mesh: Mesh) -> Any:
    """Assemble a dp-sharded global batch from this process's local rows.

    Each process contributes ``local_rows = global_rows / process_count``
    along axis 0; the result is a tree of globally-addressable arrays laid
    out over the mesh's ``dp`` axis.
    """
    sharding = NamedSharding(mesh, P("dp"))

    def make(x):
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree_util.tree_map(make, local_batch)
