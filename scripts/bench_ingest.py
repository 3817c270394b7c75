"""Parquet ingest throughput: rows/s for the pair-sampling hot path.

Compares three ingest strategies on a synthetic slice directory shaped
like production data-gen output (run_data_gen.sh: rt=34 windows, wide
m/z):

  * ``pydict-random``    — round-1 behavior: random row-group access with
    ``to_pydict()`` decode (per-row Python lists) behind an 8-group LRU.
  * ``zerocopy-random``  — random access, Arrow-buffer zero-copy decode.
  * ``zerocopy-stream``  — sequential row-group streaming through a
    shuffle buffer (the current default path).

Usage: python scripts/bench_ingest.py [--rows 512] [--mz 30000] [--pairs 400]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dquartic_tpu.data.dataset import DIAMSDataset, _ParquetStore  # noqa: E402


def make_dataset_dir(path: str, rows: int, rt: int, mz: int, row_group_size: int = 16):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dquartic_tpu.data.slices import SLICE_SCHEMA

    rng = np.random.default_rng(0)
    cols = {
        "file": ["f.sqMass"] * rows,
        "slice_index": list(range(rows)),
        "mz_isolation_target": [500.0 + (i % 4) for i in range(rows)],
        "mz_start": [490.0] * rows,
        "mz_end": [510.0] * rows,
        "rt_start": [float(i) for i in range(rows)],
        "rt_end": [float(i + rt) for i in range(rows)],
        "ms1_data": [rng.uniform(0, 50, rt * 10).astype(np.float32) for _ in range(rows)],
        "ms2_data": [rng.uniform(0, 100, rt * mz).astype(np.float32) for _ in range(rows)],
        "ms1_shape": [[rt, 10]] * rows,
        "ms2_shape": [[rt, mz]] * rows,
        "rt_values": [[0.0] * rt] * rows,
        "mz_values_ms1": [[0.0] * 10] * rows,
        "mz_values_ms2": [[0.0] * mz] * rows,
    }
    table = pa.Table.from_pydict(cols, schema=SLICE_SCHEMA)
    pq.write_table(table, os.path.join(path, "slices.parquet"), row_group_size=row_group_size)


class _PydictStore(_ParquetStore):
    """Round-1 decode for comparison: to_pydict() row groups."""

    def _row_group(self, fi, gi):
        key = (fi, gi)
        if key in self._cache:
            self._cache.move_to_end(key)
            return self._cache[key]
        tbl = self._handles[fi].read_row_group(
            gi, columns=["ms1_data", "ms2_data", "ms1_shape", "ms2_shape"]
        )
        data = tbl.to_pydict()
        self._cache[key] = data
        if len(self._cache) > self._cache_groups:
            self._cache.popitem(last=False)
        return data

    @staticmethod
    def _row_from_decoded(data, off):
        ms1 = np.asarray(data["ms1_data"][off], dtype=np.float32).reshape(data["ms1_shape"][off])
        ms2 = np.asarray(data["ms2_data"][off], dtype=np.float32).reshape(data["ms2_shape"][off])
        return ms1, ms2


def time_pairs(ds: DIAMSDataset, pairs: int, warmup: int = 3) -> float:
    for _ in range(warmup):
        ds.sample_pair()
    ds.reset_epoch()
    t0 = time.perf_counter()
    done = 0
    while done < pairs:
        try:
            ds.sample_pair()
        except RuntimeError:
            ds.reset_epoch()
            continue
        done += 1
    dt = time.perf_counter() - t0
    return 2 * pairs / dt  # rows/s (two rows per pair)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=512)
    ap.add_argument("--rt", type=int, default=34)
    ap.add_argument("--mz", type=int, default=30000)
    ap.add_argument("--pairs", type=int, default=400)
    args = ap.parse_args()

    with tempfile.TemporaryDirectory() as d:
        make_dataset_dir(d, args.rows, args.rt, args.mz)
        nbytes = sum(os.path.getsize(os.path.join(d, f)) for f in os.listdir(d))
        print(f"dataset: {args.rows} rows of ({args.rt}, {args.mz}) f32, {nbytes/1e9:.2f} GB")

        # The round-1 path is orders of magnitude slower — time fewer pairs.
        ds = DIAMSDataset(parquet_directory=d, normalize="minmax", streaming=False)
        ds.store = _PydictStore(d)
        r_pydict = time_pairs(ds, max(5, args.pairs // 40), warmup=1)
        print(f"pydict-random   : {r_pydict:10.1f} rows/s")

        ds = DIAMSDataset(parquet_directory=d, normalize="minmax", streaming=False)
        r_zc = time_pairs(ds, args.pairs)
        print(f"zerocopy-random : {r_zc:10.1f} rows/s   ({r_zc / r_pydict:.1f}x)")

        ds = DIAMSDataset(parquet_directory=d, normalize="minmax", streaming=True)
        r_stream = time_pairs(ds, args.pairs)
        print(f"zerocopy-stream : {r_stream:10.1f} rows/s   ({r_stream / r_pydict:.1f}x)")

        win_bytes = args.rt * (args.mz + 10) * 4
        print(f"stream goodput  : {r_stream * win_bytes / 1e9:.2f} GB/s of window data")


if __name__ == "__main__":
    main()
