"""Tests for the DDIM process: closed-form q_sample, reverse-step algebra,
scan-based sampling, and the training loss."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dquartic_tpu.core import DDIMProcess, make_schedule
from dquartic_tpu.core.diffusion import sample_timesteps


def make_process(T=50, pred_type="eps", **kw):
    return DDIMProcess(schedule=make_schedule(T, "cosine", pred_type), **kw)


def test_q_sample_closed_form():
    proc = make_process()
    x0 = jnp.ones((2, 3, 4))
    noise = jnp.full((2, 3, 4), 2.0)
    t = jnp.array([0, 30])
    out = proc.q_sample(x0, t, noise)
    ab = proc.schedule.alpha_bars
    for i, ti in enumerate([0, 30]):
        expected = np.sqrt(ab[ti]) * 1.0 + np.sqrt(1 - ab[ti]) * 2.0
        np.testing.assert_allclose(out[i], expected, rtol=1e-6)


def test_sample_timesteps_matches_torch_linspace_trunc():
    # torch.linspace(T-1, 0, n, dtype=long) truncates the float grid.
    steps = sample_timesteps(1000, 50)
    assert steps[0] == 999 and steps[-1] == 0
    assert len(steps) == 50
    grid = np.linspace(999, 0, 50)
    np.testing.assert_array_equal(steps, grid.astype(np.int64))


def test_ddim_step_perfect_eps_recovers_x0():
    """If the model predicts the true eps, stepping from t=1 returns x0.

    clip_denoised off: this checks the raw DDIM algebra with an x0 drawn
    outside the normalized [-1, 1] band (the clamp is covered by
    test_ddim_step_clips_denoised)."""
    proc = make_process(T=10, clip_denoised=False)
    ab = proc.schedule.alpha_bars
    x0 = jnp.array(np.random.default_rng(0).normal(size=(1, 4, 8)).astype(np.float32))
    eps = jnp.array(np.random.default_rng(1).normal(size=(1, 4, 8)).astype(np.float32))
    t = jnp.int32(0)  # final step returns x0_pred directly
    x_t = np.sqrt(ab[0]) * x0 + np.sqrt(1 - ab[0]) * eps

    def denoise(x, tv, ic, ac):
        return eps

    x_prev, eps_pred = proc.ddim_step(denoise, x_t, t, jnp.int32(-1), None, None)
    np.testing.assert_allclose(np.asarray(x_prev), np.asarray(x0), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(eps_pred), np.asarray(eps))


def test_ddim_step_clips_denoised():
    """clip_denoised (the default) clamps the x0 estimate to [-1, 1] and
    re-derives a consistent eps — the reference's unclipped pass explodes
    at sub-sampled strides (BENCH_NOTES.md)."""
    proc = make_process(T=10)
    assert proc.clip_denoised
    x0 = jnp.full((1, 2, 4), 5.0)  # far outside the normalized band
    ab = proc.schedule.alpha_bars
    eps = jnp.zeros((1, 2, 4))
    t = jnp.int32(0)
    x_t = jnp.sqrt(ab[0]) * x0  # perfect-eps construction

    def denoise(x, tv, ic, ac):
        return eps

    x_prev, eps_pred = proc.ddim_step(denoise, x_t, t, jnp.int32(-1), None, None)
    np.testing.assert_allclose(np.asarray(x_prev), np.ones_like(x_prev), rtol=1e-6)
    # eps re-derived from the clamped x0: (x_t - sqrt(ab) * 1) / sqrt(1-ab)
    expect_eps = (np.asarray(x_t) - np.sqrt(ab[0])) / np.sqrt(1 - ab[0])
    np.testing.assert_allclose(np.asarray(eps_pred), expect_eps, rtol=1e-4)


def test_ddim_step_neighbor_vs_proper():
    """Parity mode steps to alpha_bars[t-1]; proper mode to the given t_prev."""
    sched = make_schedule(100, "cosine", "eps")
    x_t = jnp.ones((1, 2, 2))
    eps = jnp.full((1, 2, 2), 0.5)

    def denoise(x, tv, ic, ac):
        return eps

    t, t_prev = jnp.int32(50), jnp.int32(25)
    ab = sched.alpha_bars

    for parity, idx in [(True, 49), (False, 25)]:
        proc = DDIMProcess(schedule=sched, parity_neighbor_stepping=parity)
        x_prev, _ = proc.ddim_step(denoise, x_t, t, t_prev, None, None)
        x0_pred = (x_t - np.sqrt(1 - ab[50]) * eps) / np.sqrt(ab[50])
        expected = np.sqrt(ab[idx]) * x0_pred + np.sqrt(1 - ab[idx]) * eps
        np.testing.assert_allclose(np.asarray(x_prev), np.asarray(expected), rtol=1e-5)


def test_sample_scan_matches_python_loop():
    """The lax.scan sampler must equal an explicit Python-loop rollout."""
    proc = make_process(T=20)
    rng = np.random.default_rng(3)
    x_T = jnp.asarray(rng.normal(size=(1, 4, 6)).astype(np.float32))
    ms2 = jnp.asarray(rng.uniform(size=(1, 4, 6)).astype(np.float32))
    ms1 = jnp.asarray(rng.uniform(size=(1, 4)).astype(np.float32))

    # A deterministic fake denoiser that uses conds and t.
    def denoise(x, tv, ic, ac):
        tt = tv.astype(jnp.float32)[:, None, None] / 20.0
        return 0.9 * x - 0.1 * ic + 0.01 * tt + 0.001 * ac[..., None]

    num_steps = 7
    x_out, pred_noise = jax.jit(
        lambda x: proc.sample(denoise, x, ms2, ms1, num_steps=num_steps)
    )(x_T)

    # Explicit rollout
    steps = sample_timesteps(20, num_steps)
    ms2_n, ms1_n = proc.normalize(ms2), proc.normalize(ms1)
    x = x_T
    for i, t in enumerate(steps):
        t_prev = steps[i + 1] if i + 1 < len(steps) else -1
        x, eps = proc.ddim_step(
            denoise, x, jnp.int32(t), jnp.int32(t_prev), ms2_n, ms1_n
        )
    expected_x = proc.unnormalize(x)
    np.testing.assert_allclose(np.asarray(x_out), np.asarray(expected_x), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(pred_noise),
        np.asarray(proc.unnormalize(ms2_n) - expected_x),
        rtol=2e-4,
        atol=2e-5,
    )


def test_train_loss_perfect_model_is_zero():
    proc = make_process(T=30)
    x0 = jnp.asarray(np.random.default_rng(0).uniform(size=(2, 4, 8)).astype(np.float32))

    captured = {}

    def perfect(x, t, ic, ac):
        # Invert q_sample using the stored truth: not available; instead
        # check that a model returning the true noise yields ~0 loss by
        # capturing the noise via closure over the rng.
        return captured["noise"]

    rng = jax.random.PRNGKey(0)
    t_rng, noise_rng = jax.random.split(rng)
    captured["noise"] = jax.random.normal(noise_rng, x0.shape, dtype=jnp.float32)
    loss, aux = proc.train_loss(perfect, rng, x0)
    assert float(loss) < 1e-10
    assert aux["per_sample_loss"].shape == (2,)


def test_train_loss_eps_floor_near_one():
    """A zero-prediction model has E[loss] = E[eps^2] = 1 (the reference's
    well-documented ~1.0 loss floor, BASELINE.md)."""
    proc = make_process(T=30)
    x0 = jnp.zeros((4, 8, 16))

    def zero_model(x, t, ic, ac):
        return jnp.zeros_like(x)

    losses = [
        float(proc.train_loss(zero_model, jax.random.PRNGKey(i), x0)[0]) for i in range(20)
    ]
    assert np.mean(losses) == pytest.approx(1.0, rel=0.15)


def test_train_loss_x0_snr_weighting():
    proc = make_process(T=30, pred_type="x0")
    x0 = jnp.full((1, 4, 4), 0.5)

    def model(x, t, ic, ac):
        return jnp.zeros_like(x)  # predicts x0=0 in normalized space; truth is 0.0

    # normalized x0 = 0.0 (auto_normalize maps 0.5 -> 0), so loss == 0
    loss, _ = proc.train_loss(model, jax.random.PRNGKey(0), x0)
    assert float(loss) == pytest.approx(0.0, abs=1e-12)


def test_ms1_sic_loss_zero_when_consistent():
    proc = make_process(T=30)
    denoised = jnp.asarray(np.random.default_rng(0).uniform(0.1, 1.0, size=(2, 5, 7)).astype(np.float32))
    # ms1 = matching projections is impossible for all three funcs at once;
    # instead check self-consistency: identical 2-D chromatograms -> 0 loss.
    ms1 = jnp.sum(denoised, axis=-1)
    # Build a denoised whose sum/mean/max projections all equal scaled ms1:
    # use a rank-1 map: denoised[b, rt, mz] = c[b, rt] * w[mz] with w >= 0.
    w = jnp.asarray(np.random.default_rng(1).uniform(0.5, 1.0, size=(7,)).astype(np.float32))
    c = jnp.asarray(np.random.default_rng(2).uniform(0.1, 1.0, size=(2, 5)).astype(np.float32))
    rank1 = c[:, :, None] * w[None, None, :]
    loss = DDIMProcess._ms1_sic_loss(rank1, c)
    np.testing.assert_allclose(np.asarray(loss), np.zeros(2), atol=1e-10)


def test_sample_x0_pred_type():
    """x0-prediction reverse pass: a model that predicts x0 perfectly
    converges to it regardless of start point."""
    proc = DDIMProcess(schedule=make_schedule(30, "cosine", "x0"))
    x0_true = jnp.full((1, 3, 4), 0.25)

    def denoise(x, t, ic, ac):
        return proc.normalize(x0_true)

    x_T = jnp.asarray(np.random.default_rng(0).normal(size=(1, 3, 4)).astype(np.float32))
    out, _ = proc.sample(denoise, x_T, num_steps=10)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0_true), rtol=1e-4, atol=1e-4)


def test_linear_schedule_process():
    proc = DDIMProcess(schedule=make_schedule(50, "linear", "eps"))
    x0 = jnp.ones((1, 2, 4)) * 0.3

    def denoise(x, t, ic, ac):
        return jnp.zeros_like(x)

    loss, _ = proc.train_loss(denoise, jax.random.PRNGKey(0), x0)
    assert np.isfinite(float(loss))
    out, _ = proc.sample(denoise, jnp.zeros((1, 2, 4)), num_steps=5)
    assert np.isfinite(np.asarray(out)).all()


def test_train_loss_with_ms1_weight():
    proc = DDIMProcess(schedule=make_schedule(20, "cosine", "eps"), ms1_loss_weight=0.3)
    rng_np = np.random.default_rng(0)
    x0 = jnp.asarray(rng_np.uniform(size=(2, 4, 8)).astype(np.float32))
    ms2 = jnp.asarray(rng_np.uniform(size=(2, 4, 8)).astype(np.float32))
    ms1 = jnp.asarray(rng_np.uniform(size=(2, 4)).astype(np.float32))

    def denoise(x, t, ic, ac):
        return jnp.zeros_like(x)

    loss, aux = proc.train_loss(denoise, jax.random.PRNGKey(1), x0, ms2, ms1)
    assert np.isfinite(float(loss))
    # with weight>0 the loss blends primary and SIC components
    proc0 = DDIMProcess(schedule=make_schedule(20, "cosine", "eps"))
    loss0, _ = proc0.train_loss(denoise, jax.random.PRNGKey(1), x0, ms2, ms1)
    assert float(loss) != float(loss0)
