"""Utility-layer tests: prefetch pipeline, profiling, builders,
distributed helpers."""

import json

import jax
import numpy as np
import pytest

from dquartic_tpu.data import prefetch_iterator
from dquartic_tpu.parallel import global_batch_from_local, initialize_runtime, make_mesh
from dquartic_tpu.utils.builder import build_mesh, build_model, build_process
from dquartic_tpu.utils.config import load_train_config, generate_train_config
from dquartic_tpu.utils.profiling import StepTimer, device_memory_stats, host_rss_mb


class FakeBatches:
    def __init__(self, n=4):
        self.n = n
        self.resets = 0

    def __len__(self):
        return self.n

    def reset_epoch(self):
        self.resets += 1

    def __iter__(self):
        for i in range(self.n):
            yield {"a": np.full((2, 3), i, np.float32)}


def test_prefetch_iterator_delivers_all_batches():
    inner = FakeBatches(5)
    it = prefetch_iterator(inner, size=2)
    assert len(it) == 5
    out = list(it)
    assert len(out) == 5
    for i, b in enumerate(out):
        np.testing.assert_array_equal(np.asarray(b["a"]), np.full((2, 3), i))
    # re-entrant: second epoch works
    out2 = list(it)
    assert len(out2) == 5
    it.reset_epoch()
    assert inner.resets == 1


def test_prefetch_iterator_propagates_errors():
    class Boom:
        def __iter__(self):
            yield {"a": np.ones(2)}
            raise RuntimeError("boom")

    it = prefetch_iterator(Boom(), size=1)
    with pytest.raises(RuntimeError, match="boom"):
        list(it)


def test_step_timer():
    t = StepTimer()
    for _ in range(5):
        with t.step():
            x = np.random.rand(100, 100) @ np.random.rand(100, 100)
            t.observe(x)
    s = t.summary()
    assert s["steps"] == 5
    assert s["mean_ms"] >= 0


def test_memory_probes():
    stats = device_memory_stats()
    assert isinstance(stats, list)
    rss = host_rss_mb()
    assert rss is None or rss > 0


def test_builders_from_canonical_config(tmp_path):
    path = tmp_path / "c.json"
    generate_train_config(str(path))
    cfg = load_train_config(str(path))
    model = build_model(cfg)
    assert model.dim == 4 and model.dim_mults == (1, 2, 2, 3, 3, 4, 4)
    process = build_process(cfg)
    assert process.schedule.num_timesteps == 1000
    assert process.schedule.pred_type == "eps"

    cfg["model"]["use_model"] = "CustomTransformer"
    ct = build_model(cfg)
    assert ct.hidden_dim == 1024

    # batch-aware default dp: batch 3 on 8 devices -> dp=1 mesh=None? dp=1,tp=1 -> None
    mesh = build_mesh(cfg, batch_size=3)
    assert mesh is None or dict(zip(mesh.axis_names, mesh.devices.shape))["dp"] in (1, 3)
    mesh8 = build_mesh(cfg, batch_size=8)
    assert dict(zip(mesh8.axis_names, mesh8.devices.shape))["dp"] == 8


def test_initialize_runtime_single_process():
    assert initialize_runtime() == jax.process_count()


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_global_batch_from_local_single_process():
    mesh = make_mesh(dp=8, tp=1)
    batch = {"x": np.arange(16, dtype=np.float32).reshape(8, 2)}
    out = global_batch_from_local(batch, mesh)
    np.testing.assert_array_equal(np.asarray(out["x"]), batch["x"])
    assert "dp" in str(out["x"].sharding.spec)


def test_build_model_passthrough_and_validation(tmp_path):
    from dquartic_tpu.utils.config import _apply_defaults

    cfg = _apply_defaults(
        {
            "model": {
                "use_model": "UNet1d",
                "num_timesteps": 10,
                "beta_schedule_type": "cosine",
                "pred_type": "eps",
                "auto_normalize": True,
                "ms1_loss_weight": 0.0,
                "UNet1d": {
                    "dim": 4, "channels": 1, "dim_mults": [1, 2],
                    "conditional": True, "init_cond_channels": 1,
                    "attn_cond_channels": 1, "downsample_dim": 16,
                    "simple": True,
                    "remat_blocks": True, "attn_heads": 2, "dropout": 0.0,
                },
            },
        }
    )
    model = build_model(cfg)
    assert model.remat_blocks is True and model.attn_heads == 2

    cfg["model"]["UNet1d"]["bogus_key"] = 1
    with pytest.raises(ValueError, match="bogus_key"):
        build_model(cfg)


def test_build_process_stepping_flag():
    from dquartic_tpu.utils.config import _apply_defaults

    base = {
        "model": {
            "num_timesteps": 10, "beta_schedule_type": "cosine",
            "pred_type": "eps", "auto_normalize": True, "ms1_loss_weight": 0.0,
        }
    }
    p1 = build_process(_apply_defaults(dict(base)))
    assert p1.parity_neighbor_stepping is True
    cfg2 = _apply_defaults(dict(base))
    cfg2["tpu"]["ddim_proper_stepping"] = True
    p2 = build_process(cfg2)
    assert p2.parity_neighbor_stepping is False


def test_clip_denoised_default_gated_on_auto_normalize():
    """The [-1, 1] clip_denoised band only makes sense for normalized
    data: with auto_normalize=false the default must flip off instead of
    silently truncating valid unnormalized values (advisor round 2)."""
    from dquartic_tpu.utils.config import _apply_defaults

    base = {
        "model": {
            "num_timesteps": 10, "beta_schedule_type": "cosine",
            "pred_type": "eps", "auto_normalize": True, "ms1_loss_weight": 0.0,
        }
    }
    assert build_process(_apply_defaults(dict(base))).clip_denoised is True

    cfg = _apply_defaults({"model": {**base["model"], "auto_normalize": False}})
    assert build_process(cfg).clip_denoised is False

    # explicit config always wins over the gate
    cfg2 = _apply_defaults({"model": {**base["model"], "auto_normalize": False}})
    cfg2["tpu"]["clip_denoised"] = True
    assert build_process(cfg2).clip_denoised is True


def test_predictions_parquet_round_trip(tmp_path):
    from dquartic_tpu.infer.sampler import (
        load_predictions_parquet,
        save_predictions_parquet,
    )

    gen = np.random.default_rng(0)
    records = []
    for _ in range(2):
        records.append(
            {
                "ms2_1": gen.normal(size=(1, 4, 8)).astype(np.float32),
                "ms1_1": gen.normal(size=(1, 4)).astype(np.float32),
                "mixture": gen.normal(size=(1, 4, 8)).astype(np.float32),
                "pred": gen.normal(size=(1, 4, 8)).astype(np.float32),
                "pred_noise": gen.normal(size=(1, 4, 8)).astype(np.float32),
            }
        )
    path = str(tmp_path / "preds.parquet")
    save_predictions_parquet(records, path)
    back = load_predictions_parquet(path)
    assert len(back) == 2
    for rec, orig in zip(back, records):
        for k in orig:
            np.testing.assert_array_equal(rec[k], orig[k])
