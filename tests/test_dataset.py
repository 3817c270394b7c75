"""Dataset tests: NPY/parquet backends, pair semantics, normalization."""

import numpy as np
import pytest

from dquartic_tpu.data import DIAMSDataset, PairBatches


@pytest.fixture
def npy_dataset(tmp_path):
    rng = np.random.default_rng(0)
    ms2 = rng.uniform(0, 100, size=(12, 4, 16)).astype(np.float32)
    ms1 = rng.uniform(0, 50, size=(12, 4)).astype(np.float32)
    ms2_f, ms1_f = tmp_path / "ms2.npy", tmp_path / "ms1.npy"
    np.save(ms2_f, ms2)
    np.save(ms1_f, ms1)
    return DIAMSDataset(ms2_file=str(ms2_f), ms1_file=str(ms1_f), normalize="minmax"), ms2, ms1


def _write_parquet(tmp_path, n=10, rt=4, mz=16):
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(1)
    rows = []
    for i in range(n):
        ms2 = rng.uniform(0, 100, size=(rt, mz)).astype(np.float32)
        ms1 = rng.uniform(0, 50, size=(rt, 3)).astype(np.float32)
        rows.append(
            {
                "file": "f.sqMass",
                "slice_index": i,
                "mz_isolation_target": 500.0,
                "mz_start": 490.0,
                "mz_end": 510.0,
                "rt_start": float(i),
                "rt_end": float(i + 4),
                "ms1_data": ms1.flatten().tolist(),
                "ms2_data": ms2.flatten().tolist(),
                "ms1_shape": list(ms1.shape),
                "ms2_shape": list(ms2.shape),
                "rt_values": (100.0 + 10.0 * i + np.arange(rt, dtype=np.float32)).tolist(),
                "mz_values_ms1": [0.0] * 3,
                "mz_values_ms2": np.linspace(400.0, 1200.0, mz, dtype=np.float32).tolist(),
            }
        )
    schema = pa.schema(
        [
            ("file", pa.string()),
            ("slice_index", pa.int64()),
            ("mz_isolation_target", pa.float64()),
            ("mz_start", pa.float64()),
            ("mz_end", pa.float64()),
            ("rt_start", pa.float64()),
            ("rt_end", pa.float64()),
            ("ms1_data", pa.list_(pa.float32())),
            ("ms2_data", pa.list_(pa.float32())),
            ("ms1_shape", pa.list_(pa.int64())),
            ("ms2_shape", pa.list_(pa.int64())),
            ("rt_values", pa.list_(pa.float32())),
            ("mz_values_ms1", pa.list_(pa.float32())),
            ("mz_values_ms2", pa.list_(pa.float32())),
        ]
    )
    table = pa.Table.from_pylist(rows, schema=schema)
    pq.write_table(table, tmp_path / "slices.parquet", row_group_size=3)
    return rows


def test_npy_pair_shapes_and_norm(npy_dataset):
    ds, ms2, ms1 = npy_dataset
    ms2_1, ms1_1, ms2_2, ms1_2 = ds[0]
    assert ms2_1.shape == (4, 16) and ms1_1.shape == (4,)
    # joint minmax: both splits within [0, 1], and at least one touches an extreme
    for arr in (ms2_1, ms2_2):
        assert arr.min() >= 0 - 1e-6 and arr.max() <= 1 + 1e-6
    assert max(ms2_1.max(), ms2_2.max()) == pytest.approx(1.0, abs=1e-6)
    assert min(ms2_1.min(), ms2_2.min()) == pytest.approx(0.0, abs=1e-6)
    # ms1 split 1 exactly spans [0, 1] (scale from split 1 only)
    assert ms1_1.min() == pytest.approx(0.0, abs=1e-6)
    assert ms1_1.max() == pytest.approx(1.0, abs=1e-6)


def test_pair_dedup_within_epoch(npy_dataset):
    ds, _, _ = npy_dataset
    n = len(ds)
    draws = set()
    ds.reset_epoch()
    for _ in range(20):
        before = set(ds.used_pairs)
        ds.sample_pair()
        new = set(ds.used_pairs) - before
        assert len(new) == 1
        pair = next(iter(new))
        assert pair not in draws
        draws.add(pair)
        assert pair[0] != pair[1]
    ds.reset_epoch()
    assert len(ds.used_pairs) == 0


def test_normalize_none_is_identity(tmp_path):
    rng = np.random.default_rng(0)
    ms2 = rng.uniform(0, 100, size=(5, 4, 8)).astype(np.float32)
    ms1 = rng.uniform(0, 50, size=(5, 4)).astype(np.float32)
    np.save(tmp_path / "m2.npy", ms2)
    np.save(tmp_path / "m1.npy", ms1)
    ds = DIAMSDataset(
        ms2_file=str(tmp_path / "m2.npy"), ms1_file=str(tmp_path / "m1.npy"), normalize=None
    )
    ms2_1, _, _, _ = ds.sample_pair()
    assert ms2_1.max() > 1.5  # untouched raw scale


def test_invalid_args():
    with pytest.raises(ValueError):
        DIAMSDataset()
    with pytest.raises(ValueError):
        DIAMSDataset(parquet_directory="x", ms2_file="y", ms1_file="z")


def test_parquet_backend_roundtrip(tmp_path):
    rows = _write_parquet(tmp_path)
    ds = DIAMSDataset(parquet_directory=str(tmp_path), normalize=None)
    assert len(ds) == 10
    # direct fetch parity with written data
    ms1, ms2 = ds.store.get(7)
    np.testing.assert_allclose(
        ms2.flatten(), np.asarray(rows[7]["ms2_data"], dtype=np.float32), rtol=1e-6
    )
    assert ms2.shape == tuple(rows[7]["ms2_shape"])
    assert ms1.shape == tuple(rows[7]["ms1_shape"])
    ms2_1, ms1_1, ms2_2, ms1_2 = ds.sample_pair()
    assert ms2_1.shape == (4, 16) and ms1_1.shape == (4, 3)


def test_pair_batches_shapes(npy_dataset):
    ds, _, _ = npy_dataset
    batches = PairBatches(ds, batch_size=3)
    assert len(batches) == 4
    out = list(batches)
    assert len(out) == 4
    assert out[0]["ms2_1"].shape == (3, 4, 16)
    assert out[0]["ms1_1"].shape == (3, 4)


def test_parquet_streaming_pair_semantics(tmp_path):
    """Streaming sampler: distinct pairs, per-epoch dedup, valid data."""
    _write_parquet(tmp_path, n=12)
    ds = DIAMSDataset(parquet_directory=str(tmp_path), normalize=None, shuffle_buffer=6)
    assert ds.stream is not None
    seen = set()
    for _ in range(8):
        ms2_1, ms1_1, ms2_2, ms1_2 = ds.sample_pair()
        assert ms2_1.shape == (4, 16) and ms1_1.shape == (4, 3)
        assert np.isfinite(ms2_1).all() and np.isfinite(ms2_2).all()
    assert len(ds.used_pairs) == 8
    ds.reset_epoch()
    assert len(ds.used_pairs) == 0


def test_parquet_streaming_matches_random_access_rows(tmp_path):
    """Every streamed row must be byte-identical to random-access get()."""
    _write_parquet(tmp_path, n=10)
    ds = DIAMSDataset(parquet_directory=str(tmp_path), normalize=None, shuffle_buffer=4)
    store = ds.store
    for idx, ms1, ms2 in ds.stream.buffer:
        ms1_ref, ms2_ref = store.get(idx)
        np.testing.assert_array_equal(ms1, ms1_ref)
        np.testing.assert_array_equal(ms2, ms2_ref)


def test_parquet_axes_exposed(tmp_path):
    """Real RT / m/z axis values from SLICE_SCHEMA surface via axes()."""
    _write_parquet(tmp_path, n=6, rt=4, mz=16)
    ds = DIAMSDataset(parquet_directory=str(tmp_path), normalize=None)
    axes = ds.axes()
    assert axes is not None
    rt, mz = axes
    np.testing.assert_allclose(rt, 100.0 + np.arange(4))
    np.testing.assert_allclose(mz, np.linspace(400.0, 1200.0, 16))


def test_last_indices_and_per_row_axes(tmp_path):
    """sample_pair() records the drawn global rows and axes_for() returns
    that row's physical axes — slices carry per-row RT windows, so plots
    must not use row 0's axes (advisor round-2 finding)."""
    _write_parquet(tmp_path, n=8)
    for kwargs in ({"shuffle_buffer": 4}, {"streaming": False}):
        ds = DIAMSDataset(parquet_directory=str(tmp_path), normalize=None, **kwargs)
        assert ds.last_indices is None
        ds.sample_pair()
        i, j = ds.last_indices
        assert i != j
        rt_i, mz_i = ds.axes_for(i)
        np.testing.assert_allclose(rt_i, 100.0 + 10.0 * i + np.arange(4))
        np.testing.assert_allclose(mz_i, np.linspace(400.0, 1200.0, 16))


def test_npy_axes_none(npy_dataset):
    ds, _, _ = npy_dataset
    assert ds.axes() is None


def test_parquet_streaming_minmax_norm(tmp_path):
    """Per-pair minmax semantics are preserved under streaming."""
    _write_parquet(tmp_path, n=8)
    ds = DIAMSDataset(parquet_directory=str(tmp_path), normalize="minmax", shuffle_buffer=4)
    ms2_1, ms1_1, ms2_2, ms1_2 = ds.sample_pair()
    joint = np.concatenate([ms2_1.ravel(), ms2_2.ravel()])
    assert joint.min() == pytest.approx(0.0, abs=1e-6)
    assert joint.max() == pytest.approx(1.0, abs=1e-6)
    assert ms1_1.min() == pytest.approx(0.0, abs=1e-6)
    assert ms1_1.max() == pytest.approx(1.0, abs=1e-6)
