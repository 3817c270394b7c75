"""Parquet fetch performance probe.

Counterpart of the reference's DuckDB probe
(/root/reference/dquartic/utils/test_duckdb_parquet_fetching.py:7-47),
which timed metadata queries at growing LIMITs with RSS deltas. This
probe times the rebuilt access paths instead: metadata scan, sequential
row-group streaming, random point fetches through the LRU row-group
cache, and full pair-sampling throughput.

Usage: python scripts/probe_parquet_fetch.py /path/to/parquet_dir [n_fetches]
"""

import sys
import time

import numpy as np


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(1)
    directory = sys.argv[1]
    n_fetches = int(sys.argv[2]) if len(sys.argv) > 2 else 200

    from dquartic_tpu.data.dataset import DIAMSDataset, _ParquetStore
    from dquartic_tpu.utils.profiling import host_rss_mb

    rss0 = host_rss_mb()
    t0 = time.perf_counter()
    store = _ParquetStore(directory)
    t_meta = time.perf_counter() - t0
    print(
        f"metadata scan: {store.num_rows} rows / {len(store.files)} files / "
        f"{len(store.groups)} row groups in {t_meta * 1000:.1f} ms "
        f"(rss +{(host_rss_mb() or 0) - (rss0 or 0):.1f} MB)"
    )

    # sequential streaming
    t0 = time.perf_counter()
    nbytes = 0
    for i in range(min(store.num_rows, n_fetches)):
        ms1, ms2 = store.get(i)
        nbytes += ms1.nbytes + ms2.nbytes
    dt = time.perf_counter() - t0
    print(
        f"sequential fetch: {min(store.num_rows, n_fetches)} rows, "
        f"{nbytes / 1e6:.1f} MB in {dt:.2f} s ({nbytes / 1e6 / dt:.1f} MB/s)"
    )

    # random access through the LRU cache
    rng = np.random.default_rng(0)
    idxs = rng.integers(0, store.num_rows, size=min(store.num_rows, n_fetches))
    t0 = time.perf_counter()
    for i in idxs:
        store.get(int(i))
    dt = time.perf_counter() - t0
    print(f"random fetch: {len(idxs)} rows in {dt:.2f} s ({len(idxs) / dt:.0f} rows/s)")

    # full pair-sampling pipeline
    ds = DIAMSDataset(parquet_directory=directory, normalize="minmax")
    t0 = time.perf_counter()
    n_pairs = min(len(ds) // 2, n_fetches // 2) or 1
    for _ in range(n_pairs):
        ds.sample_pair()
    dt = time.perf_counter() - t0
    print(
        f"pair sampling (+minmax): {n_pairs} pairs in {dt:.2f} s "
        f"({n_pairs / dt:.0f} pairs/s, rss {host_rss_mb():.0f} MB)"
    )


if __name__ == "__main__":
    main()
