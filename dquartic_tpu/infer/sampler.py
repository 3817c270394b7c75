"""Batched DDIM inference.

The reference's reverse pass is a Python loop of ``num_steps``
synchronous model calls (model.py:313-317 via
model_interface.py:1125-1150). Here the whole pass is one jitted
``lax.scan`` program (compiled once per ``num_steps``), batched over
windows, and mesh-shardable — deconvolving a full DIA run is a single
XLA computation per batch of windows.
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.diffusion import DDIMProcess
from ..parallel.sharding import shard_batch


class DDIMSampler:
    """Compiled DDIM reverse sampler for a denoiser model."""

    def __init__(self, model, process: DDIMProcess, mesh=None):
        self.model = model
        self.process = process
        self.mesh = mesh
        self._fns: Dict[int, Any] = {}

    def _sample_fn(self, num_steps: int):
        if num_steps not in self._fns:

            def fn(params, x_t, ms2_cond, ms1_cond):
                def denoise(x, t, ic, ac):
                    return self.model.apply(params, x, t, ic, ac)

                return self.process.sample(
                    denoise, x_t, ms2_cond, ms1_cond, num_steps=num_steps
                )

            self._fns[num_steps] = jax.jit(fn)
        return self._fns[num_steps]

    def sample(
        self,
        params,
        x_t: jnp.ndarray,
        ms2_cond: Optional[jnp.ndarray] = None,
        ms1_cond: Optional[jnp.ndarray] = None,
        num_steps: int = 1000,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Reverse-diffuse ``x_t`` (usually pure noise) into a clean MS2 map.

        Returns ``(x0_hat, pred_noise)`` following the reference output
        convention (model.py:319-324).
        """
        fn = self._sample_fn(num_steps)
        if self.mesh is not None:
            # Ambient mesh so model-internal sharding constraints and the
            # shard_map kernel variants (UNet1d.kernel_dp_axis) resolve.
            with jax.set_mesh(self.mesh):
                return fn(params, x_t, ms2_cond, ms1_cond)
        return fn(params, x_t, ms2_cond, ms1_cond)

    def predict_batch(
        self,
        params,
        rng: jax.Array,
        ms2_cond: jnp.ndarray,
        ms1_cond: Optional[jnp.ndarray],
        num_steps: int = 1000,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Start from N(0, I) noise, as reference _predict_one_batch
        (model_interface.py:1125-1150)."""
        x_t = jax.random.normal(rng, ms2_cond.shape, dtype=jnp.float32)
        return self.sample(params, x_t, ms2_cond, ms1_cond, num_steps)

    def predict(
        self,
        params,
        dataset: Iterable,
        mixture_weights: Tuple[float, float] = (0.5, 0.5),
        num_steps: int = 1000,
        seed: int = 0,
    ) -> List[Dict[str, np.ndarray]]:
        """Iterate a dataset of pair batches, build mixtures, deconvolve.

        Mirrors ``ModelInterface.predict`` (model_interface.py:630-667):
        each record holds the target MS2, its MS1, the simulated mixture
        and the prediction.
        """
        key = jax.random.PRNGKey(seed)
        out: List[Dict[str, np.ndarray]] = []
        for i, batch in enumerate(dataset):
            ms2_1 = jnp.asarray(batch["ms2_1"])
            ms1_1 = jnp.asarray(batch["ms1_1"])
            ms2_2 = jnp.asarray(batch["ms2_2"])
            ms2_cond = mixture_weights[0] * ms2_1 + mixture_weights[1] * ms2_2
            if self.mesh is not None:
                ms2_1, ms1_1, ms2_cond = shard_batch((ms2_1, ms1_1, ms2_cond), self.mesh)
            pred, pred_noise = self.predict_batch(
                params, jax.random.fold_in(key, i), ms2_cond, ms1_1, num_steps
            )
            out.append(
                {
                    "ms2_1": np.asarray(ms2_1),
                    "ms1_1": np.asarray(ms1_1),
                    "mixture": np.asarray(ms2_cond),
                    "pred": np.asarray(pred),
                    "pred_noise": np.asarray(pred_noise),
                }
            )
        return out


PREDICTION_SCHEMA_FIELDS = (
    ("ms2_1", "ms2_shape"),
    ("ms1_1", "ms1_shape"),
    ("mixture", "ms2_shape"),
    ("pred", "ms2_shape"),
    ("pred_noise", "ms2_shape"),
)


def save_predictions_parquet(records: List[Dict[str, np.ndarray]], path: str) -> None:
    """Write prediction records as one parquet row per batch.

    Arrays are stored flattened f32 with explicit shape columns — the same
    conventions as the training-slice schema (data/slices.SLICE_SCHEMA,
    mirroring reference data_generation.py:273-290) so downstream tooling
    reads both with one code path.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    cols: Dict[str, list] = {"batch_index": list(range(len(records)))}
    cols["ms2_shape"] = [list(np.asarray(r["ms2_1"]).shape) for r in records]
    cols["ms1_shape"] = [list(np.asarray(r["ms1_1"]).shape) for r in records]
    for name, _shape_col in PREDICTION_SCHEMA_FIELDS:
        cols[name] = [np.asarray(r[name], np.float32).ravel() for r in records]

    schema = pa.schema(
        [("batch_index", pa.int64()),
         ("ms2_shape", pa.list_(pa.int64())),
         ("ms1_shape", pa.list_(pa.int64()))]
        + [(name, pa.list_(pa.float32())) for name, _ in PREDICTION_SCHEMA_FIELDS]
    )
    table = pa.Table.from_pydict(cols, schema=schema)
    pq.write_table(table, path)


def load_predictions_parquet(path: str) -> List[Dict[str, np.ndarray]]:
    """Inverse of :func:`save_predictions_parquet`."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(path)
    out: List[Dict[str, np.ndarray]] = []
    for i in range(tbl.num_rows):
        row = {c: tbl.column(c)[i].as_py() for c in tbl.column_names}
        rec = {}
        for name, shape_col in PREDICTION_SCHEMA_FIELDS:
            rec[name] = np.asarray(row[name], np.float32).reshape(row[shape_col])
        out.append(rec)
    return out
