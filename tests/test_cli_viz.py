"""CLI surface tests (click runner) and visualization hook tests."""

import json
import os

import numpy as np
import pytest
from click.testing import CliRunner

from dquartic_tpu.cli import cli


@pytest.fixture(scope="module")
def tiny_config(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("cli")
    rng = np.random.default_rng(0)
    ms2 = rng.uniform(0, 10, size=(6, 4, 16)).astype(np.float32)
    ms1 = rng.uniform(0, 5, size=(6, 4)).astype(np.float32)
    np.save(tmp_path / "ms2.npy", ms2)
    np.save(tmp_path / "ms1.npy", ms1)

    cfg = {
        "data": {
            "parquet_directory": None,
            "ms2_data_path": str(tmp_path / "ms2.npy"),
            "ms1_data_path": str(tmp_path / "ms1.npy"),
            "normalize": "minmax",
        },
        "model": {
            "checkpoint_path": str(tmp_path / "ckpt" / "best_model.ckpt"),
            "num_epochs": 2,
            "warmup_epochs": 1,
            "batch_size": 2,
            "learning_rate": 1e-3,
            "num_timesteps": 10,
            "beta_schedule_type": "cosine",
            "pred_type": "eps",
            "auto_normalize": True,
            "ms1_loss_weight": 0.0,
            "use_model": "UNet1d",
            "CustomTransformer": {
                "input_dim": 16,
                "hidden_dim": 16,
                "num_heads": 2,
                "num_layers": 1,
            },
            "UNet1d": {
                "dim": 4,
                "channels": 1,
                "dim_mults": [1, 2],
                "conditional": True,
                "init_cond_channels": 1,
                "attn_cond_channels": 1,
                "tfer_dim_mult": 620,
                "downsample_dim": 16,
                "simple": True,
            },
        },
        "wandb": {"use_wandb": False},
        "threads": 1,
        "tpu": {"log_every_n_epochs": 1000},
    }
    path = tmp_path / "config.json"
    path.write_text(json.dumps(cfg))
    return path, tmp_path


def test_generate_config_roundtrips(tmp_path):
    runner = CliRunner()
    out = tmp_path / "cfg.json"
    res = runner.invoke(cli, ["generate-config", str(out)])
    assert res.exit_code == 0, res.output
    cfg = json.loads(out.read_text())
    assert cfg["model"]["use_model"] == "UNet1d"
    assert cfg["model"]["UNet1d"]["downsample_dim"] == 40000
    assert "tpu" in cfg

    from dquartic_tpu.utils.config import load_train_config

    loaded = load_train_config(str(out), batch_size=7)
    assert loaded["model"]["batch_size"] == 7


def test_reference_config_loads_unchanged(tmp_path):
    """A config without the tpu section (i.e. a reference config file)
    must load with defaults applied."""
    cfg = {
        "data": {"parquet_directory": "data/", "normalize": "minmax"},
        "model": {"batch_size": 1},
        "wandb": {"use_wandb": True},
        "threads": 4,
    }
    p = tmp_path / "ref.json"
    p.write_text(json.dumps(cfg))
    from dquartic_tpu.utils.config import load_train_config

    loaded = load_train_config(str(p))
    assert loaded["tpu"]["compute_dtype"] == "float32"
    assert loaded["tpu"]["mesh"]["tp"] == 1
    assert loaded["data"]["ms2_data_path"] is None


@pytest.fixture(scope="module")
def trained_ckpt(tiny_config):
    """One CLI `train` shared by the predict tests (each train is a full
    jitted-step compile on the 1-core host)."""
    config_path, tmp_path = tiny_config
    res = CliRunner().invoke(cli, ["train", str(config_path)])
    assert res.exit_code == 0, res.output
    return tmp_path / "ckpt" / "best_model.ckpt"


def test_cli_train_and_predict(tiny_config, trained_ckpt):
    config_path, tmp_path = tiny_config
    runner = CliRunner()
    ckpt = trained_ckpt
    assert ckpt.exists()
    assert (tmp_path / "ckpt" / "dquartic_latest_checkpoint.ckpt").exists()

    out = tmp_path / "preds.npz"
    res = runner.invoke(
        cli,
        ["predict", "--num-steps", "3", "--num-batches", "1", str(config_path), str(ckpt), str(out)],
    )
    assert res.exit_code == 0, res.output
    data = np.load(out)
    assert any(k.startswith("pred_") for k in data.files)


def test_wandb_logger_wraps_image_paths(tmp_path, monkeypatch):
    """wandb tables render plots as wandb.Image, not filename strings
    (reference model_interface.py:757-794 parity)."""
    import sys
    import types

    logged = []

    class FakeTable:
        def __init__(self, columns):
            self.columns, self.rows = columns, []

        def add_data(self, *row):
            self.rows.append(row)

    class FakeImage:
        def __init__(self, path):
            self.path = path

    fake = types.ModuleType("wandb")
    fake.Table, fake.Image = FakeTable, FakeImage
    fake.init = lambda **k: None
    fake.log = lambda m, commit=True: logged.append(m)
    fake.finish = lambda: None
    monkeypatch.setitem(sys.modules, "wandb", fake)

    from dquartic_tpu.utils.logging import WandbLogger

    lg = WandbLogger()
    img = tmp_path / "panel.png"
    img.write_bytes(b"\x89PNG")
    lg.log_table("t", ["epoch", "img"], [[1, str(img)], [2, str(tmp_path / "missing.png")]])
    tbl = logged[0]["t"]
    assert isinstance(tbl.rows[0][1], FakeImage) and tbl.rows[0][1].path == str(img)
    assert tbl.rows[1][1] == str(tmp_path / "missing.png")  # absent file passes through


def test_ms_peakmap_backends(tmp_path):
    """pyopenms_viz-style panels (reference model_interface.py:796-976
    backend="ms_matplotlib"/"ms_plotly"): the native reimplementation
    renders all six panels as 3-D spike peakmaps / chromatograms."""
    from dquartic_tpu.utils.viz import plot_single_prediction

    rng = np.random.default_rng(0)
    mesh = rng.uniform(0, 10, size=(6, 12)).astype(np.float32)
    ms1 = rng.uniform(0, 5, size=(6,)).astype(np.float32)

    paths = plot_single_prediction(
        mesh, mesh, mesh, ms1, mesh, mesh,
        out_dir=str(tmp_path / "ms_mpl"), prefix="p_", backend="ms_matplotlib",
    )
    assert len(paths) == 6
    for pth in paths:
        assert os.path.exists(pth) and os.path.getsize(pth) > 0
        assert pth.endswith(".png")

    paths = plot_single_prediction(
        mesh, mesh, mesh, ms1, mesh, mesh,
        out_dir=str(tmp_path / "ms_plotly"), prefix="p_", backend="ms_plotly",
        rt_axis=np.linspace(100.0, 105.0, 6), mz_axis=np.linspace(400.0, 411.0, 12),
    )
    assert len(paths) == 6
    for pth in paths:
        assert os.path.exists(pth) and os.path.getsize(pth) > 0


def test_viz_hook(tmp_path):
    import jax.numpy as jnp

    from dquartic_tpu.core import DDIMProcess, make_schedule
    from dquartic_tpu.data import DIAMSDataset
    from dquartic_tpu.infer import DDIMSampler
    from dquartic_tpu.models import UNet1d
    from dquartic_tpu.train import Trainer
    from dquartic_tpu.utils.logging import JsonlLogger
    from dquartic_tpu.utils.viz import PredictionLoggingHook, plot_single_prediction

    rng = np.random.default_rng(0)
    ms2 = rng.uniform(0, 10, size=(5, 4, 16)).astype(np.float32)
    ms1 = rng.uniform(0, 5, size=(5, 4)).astype(np.float32)
    np.save(tmp_path / "ms2.npy", ms2)
    np.save(tmp_path / "ms1.npy", ms1)
    ds = DIAMSDataset(
        ms2_file=str(tmp_path / "ms2.npy"), ms1_file=str(tmp_path / "ms1.npy"), normalize="minmax"
    )

    model = UNet1d(
        dim=4, channels=1, dim_mults=(1, 2), conditional=True,
        init_cond_channels=1, attn_cond_channels=1, downsample_dim=16,
    )
    process = DDIMProcess(schedule=make_schedule(10, "cosine", "eps"))
    trainer = Trainer(model, process, seed=0)
    batch = {
        "ms2_1": ms2[:1], "ms1_1": ms1[:1], "ms2_2": ms2[1:2], "ms1_2": ms1[1:2],
    }
    state = trainer.init_state(batch)

    logger = JsonlLogger(str(tmp_path / "logs"))
    hook = PredictionLoggingHook(
        DDIMSampler(model, process), ds, logger, out_dir=str(tmp_path / "plots"),
        num_steps=(2,),
    )
    hook(0, 1.0, state)
    logger.finish()

    pngs = list((tmp_path / "plots").glob("*.png"))
    assert len(pngs) == 6
    log = (tmp_path / "logs" / "metrics.jsonl").read_text()
    assert "predictions/cosine_2steps" in log
    assert "predictions_table" in log

    # direct panel rendering
    paths = plot_single_prediction(
        ms2[0], ms2[1], 0.5 * ms2[0] + 0.5 * ms2[1], ms1[0], ms2[0], ms2[1],
        out_dir=str(tmp_path / "plots2"),
    )
    assert all(os.path.exists(p) for p in paths)

    # physical-axis panels (real RT seconds / m/z values)
    paths = plot_single_prediction(
        ms2[0], ms2[1], 0.5 * ms2[0] + 0.5 * ms2[1], ms1[0], ms2[0], ms2[1],
        out_dir=str(tmp_path / "plots3"),
        rt_axis=100.0 + np.arange(4, dtype=np.float32),
        mz_axis=np.linspace(400.0, 1200.0, 16, dtype=np.float32),
    )
    assert all(os.path.exists(p) for p in paths)

    # plotly backend falls back to matplotlib when plotly is absent
    paths = plot_single_prediction(
        ms2[0], ms2[1], 0.5 * ms2[0] + 0.5 * ms2[1], ms1[0], ms2[0], ms2[1],
        out_dir=str(tmp_path / "plots4"), backend="plotly",
    )
    assert all(os.path.exists(p) for p in paths)


def test_cli_generate_train_data(tmp_path):
    """CLI data generation end-to-end on a synthetic sqMass file."""
    import sqlite3
    import struct
    import zlib

    path = tmp_path / "run.sqMass"
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

    def pack(values):
        return zlib.compress(struct.pack(f"<{len(values)}d", *values))

    sid = 0
    for i in range(6):
        rt = 10.0 + i
        sid += 1
        cur.execute("INSERT INTO SPECTRUM VALUES (?,?,?,?)", (sid, rt, f"m1_{i}", 1))
        cur.execute("INSERT INTO DATA VALUES (?,?,?,?)", (sid, 1, 0, pack(np.linspace(498, 502, 10))))
        cur.execute("INSERT INTO DATA VALUES (?,?,?,?)", (sid, 1, 1, pack(rng.uniform(1, 100, 10))))
        sid += 1
        cur.execute("INSERT INTO SPECTRUM VALUES (?,?,?,?)", (sid, rt + 0.5, f"m2_{i}", 2))
        cur.execute("INSERT INTO PRECURSOR VALUES (?,?,?,?)", (sid, 500.0, 2.0, 2.0))
        cur.execute("INSERT INTO DATA VALUES (?,?,?,?)", (sid, 1, 0, pack(np.sort(rng.uniform(100, 1000, 30)))))
        cur.execute("INSERT INTO DATA VALUES (?,?,?,?)", (sid, 1, 1, pack(rng.uniform(1, 1000, 30))))
    conn.commit()
    conn.close()

    out = tmp_path / "slices.parquet"
    runner = CliRunner()
    res = runner.invoke(
        cli,
        [
            "generate-train-data",
            "--window-size", "4", "--sliding-step", "2",
            "--ms1-fixed-mz-size", "6", "--ms2-fixed-mz-size", "12",
            str(tmp_path / "run.sqMass"), str(out),
        ],
    )
    assert res.exit_code == 0, res.output
    import pyarrow.parquet as pq

    table = pq.read_table(out)
    assert table.num_rows > 0


def test_cli_predict_dp_mesh(tiny_config, trained_ckpt):
    """predict under a tpu.mesh config shards prediction batches over dp
    (kernel_dp_axis path) through the product surface."""
    import jax

    if jax.device_count() < 2:
        pytest.skip("needs 2 virtual devices")
    config_path, tmp_path = tiny_config
    runner = CliRunner()
    ckpt = trained_ckpt

    cfg = json.loads(config_path.read_text())
    cfg["tpu"]["mesh"] = {"dp": 2, "sp": 1, "tp": 1}
    cfg["tpu"]["fused_resnet"] = True
    dp_config = tmp_path / "config_dp.json"
    dp_config.write_text(json.dumps(cfg))

    out = tmp_path / "preds_dp.parquet"
    res = runner.invoke(
        cli,
        ["predict", "--num-steps", "3", "--num-batches", "1", "--fused-resnet",
         str(dp_config), str(ckpt), str(out)],
    )
    assert res.exit_code == 0, res.output
    assert "sampling over mesh" in res.output
    import pyarrow.parquet as pq

    t = pq.read_table(out).to_pydict()
    pred = np.asarray(t["pred"][0], dtype=np.float32)
    assert np.isfinite(pred).all() and pred.std() > 0
