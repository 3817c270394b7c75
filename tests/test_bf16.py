"""bf16 compute-path regression tests: sampler scan carry dtypes and the
training step under a bf16 model."""

import jax
import jax.numpy as jnp
import numpy as np

from dquartic_tpu.core import DDIMProcess, make_schedule
from dquartic_tpu.infer import DDIMSampler
from dquartic_tpu.models import UNet1d
from dquartic_tpu.train import Trainer

TINY_BF16 = dict(
    dim=4,
    channels=1,
    dim_mults=(1, 2),
    conditional=True,
    init_cond_channels=1,
    attn_cond_channels=1,
    downsample_dim=16,
    simple=True,
    dtype=jnp.bfloat16,
)


def _setup():
    model = UNet1d(**TINY_BF16)
    process = DDIMProcess(schedule=make_schedule(10, "cosine", "eps"))
    rng = np.random.default_rng(0)
    batch = {
        "ms2_1": rng.uniform(0, 1, (1, 4, 16)).astype(np.float32),
        "ms1_1": rng.uniform(0, 1, (1, 4)).astype(np.float32),
        "ms2_2": rng.uniform(0, 1, (1, 4, 16)).astype(np.float32),
        "ms1_2": rng.uniform(0, 1, (1, 4)).astype(np.float32),
    }
    return model, process, batch


def test_bf16_sampler_scan():
    """The lax.scan carry must stay f32 even when the denoiser is bf16
    (regression: 'carry component has type bfloat16' compile error)."""
    model, process, batch = _setup()
    trainer = Trainer(model, process, seed=0)
    state = trainer.init_state(batch)
    sampler = DDIMSampler(model, process)
    ms2 = jnp.asarray(batch["ms2_1"])
    ms1 = jnp.asarray(batch["ms1_1"])
    x_t = jax.random.normal(jax.random.PRNGKey(0), ms2.shape, dtype=jnp.float32)
    x0, pred_noise = sampler.sample(state.params, x_t, ms2, ms1, num_steps=4)
    assert x0.dtype == jnp.float32
    assert np.isfinite(np.asarray(x0, np.float32)).all()


def test_bf16_train_step():
    model, process, batch = _setup()
    trainer = Trainer(model, process, seed=0)
    state = trainer.init_state(batch)
    dev = jax.tree_util.tree_map(jnp.asarray, batch)
    state, metrics = trainer.train_step(state, dev, jnp.float32(1e-3), jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    # params remain f32 master copies
    assert all(
        l.dtype == jnp.float32 for l in jax.tree_util.tree_leaves(state.params)
    )
