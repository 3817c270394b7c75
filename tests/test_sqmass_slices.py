"""End-to-end data generation: synthetic sqMass SQLite -> parquet slices
-> DIAMSDataset."""

import sqlite3
import struct
import zlib

import numpy as np
import pytest

from dquartic_tpu.data import DIAMSDataset
from dquartic_tpu.data.slices import generate_data_slices, sliding_windows
from dquartic_tpu.data.sqmass import SqMassLoader


def _pack(values):
    return zlib.compress(struct.pack(f"<{len(values)}d", *values))


@pytest.fixture
def sqmass_file(tmp_path):
    """A minimal sqMass database: 1 isolation window, 6 MS1 + 6 MS2 spectra."""
    path = tmp_path / "run1.sqMass"
    conn = sqlite3.connect(path)
    cur = conn.cursor()
    cur.executescript(
        """
        CREATE TABLE SPECTRUM (ID INTEGER PRIMARY KEY, RETENTION_TIME REAL,
                               NATIVE_ID TEXT, MSLEVEL INTEGER);
        CREATE TABLE PRECURSOR (SPECTRUM_ID INTEGER, ISOLATION_TARGET REAL,
                                ISOLATION_LOWER REAL, ISOLATION_UPPER REAL);
        CREATE TABLE DATA (SPECTRUM_ID INTEGER, COMPRESSION INTEGER,
                           DATA_TYPE INTEGER, DATA BLOB);
        """
    )
    rng = np.random.default_rng(0)
    sid = 0
    for i in range(6):
        rt = 10.0 + i
        # MS1 spectrum
        sid += 1
        cur.execute(
            "INSERT INTO SPECTRUM VALUES (?,?,?,?)", (sid, rt, f"ms1_{i}", 1)
        )
        mz = np.linspace(498, 502, 20)
        inten = rng.uniform(1, 100, 20)
        cur.execute("INSERT INTO DATA VALUES (?,?,?,?)", (sid, 1, 0, _pack(mz)))
        cur.execute("INSERT INTO DATA VALUES (?,?,?,?)", (sid, 1, 1, _pack(inten)))
        # MS2 spectrum in one isolation window around 500
        sid += 1
        cur.execute(
            "INSERT INTO SPECTRUM VALUES (?,?,?,?)", (sid, rt + 0.5, f"ms2_{i}", 2)
        )
        cur.execute(
            "INSERT INTO PRECURSOR VALUES (?,?,?,?)", (sid, 500.0, 2.0, 2.0)
        )
        mz2 = np.sort(rng.uniform(100, 1000, 50))
        inten2 = rng.uniform(1, 1000, 50)
        cur.execute("INSERT INTO DATA VALUES (?,?,?,?)", (sid, 1, 0, _pack(mz2)))
        cur.execute("INSERT INTO DATA VALUES (?,?,?,?)", (sid, 1, 1, _pack(inten2)))
    conn.commit()
    conn.close()
    return str(path)


def test_loader_reads_everything(sqmass_file):
    loader = SqMassLoader(sqmass_file)
    loader.load_all_data()
    assert len(loader.iso_win_info) == 1
    row = loader.iso_win_info.iloc[0]
    assert row["ISOLATION_TARGET"] == 500.0
    assert row["mzStart"] == 498.0 and row["mzEnd"] == 502.0
    assert len(loader.spec_id_iso_map) == 6
    # 6 spectra x 20 points and 6 x 50 points
    assert len(loader.ms1_data) == 120
    assert len(loader.ms2_data) == 300
    assert set(loader.ms1_data.columns) >= {"SPECTRUM_ID", "RETENTION_TIME", "mz", "intensity"}


def test_extract_slices_binned(sqmass_file):
    loader = SqMassLoader(sqmass_file)
    loader.load_all_data()
    iso = loader.iso_win_info.iloc[0]
    ms1 = loader.extract_ms1_slice(iso, 10, True, num_bins=8)
    # fixed-count binning + padding -> exactly 8 distinct m/z values
    assert ms1["mz"].nunique() == 8
    ms2 = loader.extract_ms2_slice(iso, True, num_bins=16)
    assert ms2["mz"].nunique() == 16
    # m/z within the isolation window for MS1 (padding rows excluded)
    real = ms1[ms1["NATIVE_ID"] != "padding_right"]
    assert real["mz_org"].min() >= 498.0 - 1e-9
    assert real["mz_org"].max() <= 502.0 + 1e-9


def test_sliding_windows():
    rt = np.arange(10)
    w = sliding_windows(rt, window_size=4, sliding_step=2)
    assert len(w) == 4
    np.testing.assert_array_equal(w[0], [0, 1, 2, 3])
    np.testing.assert_array_equal(w[-1], [6, 7, 8, 9])


def test_generate_slices_to_parquet_and_load(sqmass_file, tmp_path):
    out = tmp_path / "slices" / "w0.parquet"
    out.parent.mkdir()
    n = generate_data_slices(
        sqmass_file,
        str(out),
        isolation_window_index=0,
        window_size=4,
        sliding_step=2,
        ms1_fixed_mz_size=8,
        ms2_fixed_mz_size=16,
    )
    assert n > 0

    import pyarrow.parquet as pq

    table = pq.read_table(out)
    assert table.num_rows == n
    row = table.to_pylist()[0]
    assert row["mz_isolation_target"] == 500.0
    ms2 = np.asarray(row["ms2_data"]).reshape(row["ms2_shape"])
    ms1 = np.asarray(row["ms1_data"]).reshape(row["ms1_shape"])
    assert ms2.shape[0] == 4  # rt rows
    assert ms2.shape[1] == 16  # fixed m/z bins (padded)
    assert ms1.shape[0] == 4
    assert np.isfinite(ms2).all()
    assert ms2.max() > 0

    # The generated directory feeds the training dataset directly.
    ds = DIAMSDataset(parquet_directory=str(out.parent), normalize="minmax")
    ms2_1, ms1_1, ms2_2, ms1_2 = ds.sample_pair()
    assert ms2_1.shape == (4, 16)
    assert 0.0 <= ms2_1.min() and ms2_1.max() <= 1.0
