"""Host->device streaming.

A background-thread prefetcher that keeps N batches in flight ahead of
the training loop, so host-side parquet decoding and pair sampling
overlap with device compute (the reference's DataLoader workers play this
role; here a single thread suffices because batches are a handful of
large arrays, not thousands of small ones).
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Iterable, Iterator

import jax
import numpy as np

from ..parallel.sharding import batch_sharding


class prefetch_iterator:
    """Wrap an epoch-iterable; yield device-resident batches.

    With a mesh, batches land pre-sharded over the ``dp`` axis; otherwise
    they are committed to the default device. Iteration is re-entrant: each
    ``__iter__`` spins up a fresh producer thread over the inner iterable.
    """

    _SENTINEL = object()

    def __init__(self, inner: Iterable, size: int = 2, mesh=None):
        self.inner = inner
        self.size = size
        self.mesh = mesh

    def __len__(self) -> int:
        return len(self.inner)

    def reset_epoch(self) -> None:
        if hasattr(self.inner, "reset_epoch"):
            self.inner.reset_epoch()

    def _put(self, batch: Any) -> Any:
        def to_dev(x, sh=None):
            if isinstance(x, jax.Array):  # committed already: reshard on device
                return x if sh is None else jax.device_put(x, sh)
            return jax.device_put(np.asarray(x), sh) if sh is not None else jax.device_put(np.asarray(x))

        if self.mesh is not None:
            sh = batch_sharding(self.mesh)
            return jax.tree_util.tree_map(lambda x: to_dev(x, sh), batch)
        return jax.tree_util.tree_map(to_dev, batch)

    def __iter__(self) -> Iterator[Any]:
        q: "queue.Queue" = queue.Queue(maxsize=self.size)
        err: list = []

        def producer():
            try:
                for batch in self.inner:
                    q.put(self._put(batch))
            except Exception as e:  # surfaced on the consumer side
                err.append(e)
            finally:
                q.put(self._SENTINEL)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is self._SENTINEL:
                if err:
                    raise err[0]
                return
            yield item
