"""Unit tests for noise schedules against closed-form values."""

import math

import numpy as np
import pytest

from dquartic_tpu.core import (
    cosine_beta_schedule,
    get_alpha_bars,
    get_alphas,
    linear_beta_schedule,
    make_schedule,
)


def test_linear_endpoints():
    betas = linear_beta_schedule(1000)
    assert betas[0] == pytest.approx(1e-4)
    assert betas[-1] == pytest.approx(0.02)
    assert np.all(np.diff(betas) > 0)


def test_cosine_closed_form():
    T = 1000
    s = 0.008
    betas = cosine_beta_schedule(T, s)
    # Reconstruct alpha_bar from betas and compare with the closed form
    # ab(t) = f(t)/f(0), f(t) = cos((t/T + s)/(1+s) * pi/2)^2.
    ab = np.cumprod(1.0 - betas)

    def f(t):
        return math.cos((t / T + s) / (1 + s) * math.pi / 2) ** 2

    for t in [1, 10, 100, 500, 900]:
        assert ab[t - 1] == pytest.approx(f(t) / f(0), rel=1e-6)
    assert np.all(betas >= 0) and np.all(betas <= 0.999)


def test_alphas_and_bars():
    betas = np.array([0.1, 0.2, 0.5])
    alphas = get_alphas(betas)
    np.testing.assert_allclose(alphas, [0.9, 0.8, 0.5])
    np.testing.assert_allclose(get_alpha_bars(alphas), [0.9, 0.72, 0.36])


def test_make_schedule_loss_weights():
    sched_eps = make_schedule(100, "cosine", "eps")
    np.testing.assert_array_equal(sched_eps.loss_weight, np.ones(100, np.float32))

    sched_x0 = make_schedule(100, "cosine", "x0")
    snr = sched_x0.alpha_bars / (1 - sched_x0.alpha_bars)
    np.testing.assert_allclose(sched_x0.loss_weight, snr, rtol=1e-6)

    assert sched_eps.betas.dtype == np.float32


def test_make_schedule_invalid():
    with pytest.raises(ValueError):
        make_schedule(10, "exp", "eps")
    with pytest.raises(ValueError):
        make_schedule(10, "cosine", "v")


def test_make_schedule_weighting_options():
    """uniform and min_snr:<gamma> weightings (core/schedules.py); the
    reference rule stays the default (model.py:204-213)."""
    snr_of = lambda s: s.alpha_bars / (1 - s.alpha_bars)  # noqa: E731

    uni = make_schedule(100, "cosine", "x0", weighting="uniform")
    np.testing.assert_array_equal(uni.loss_weight, np.ones(100, np.float32))

    m_eps = make_schedule(100, "cosine", "eps", weighting="min_snr:5")
    np.testing.assert_allclose(
        m_eps.loss_weight, np.minimum(snr_of(m_eps), 5.0) / snr_of(m_eps), rtol=1e-6
    )
    m_x0 = make_schedule(100, "cosine", "x0", weighting="min_snr:5")
    np.testing.assert_allclose(m_x0.loss_weight, np.minimum(snr_of(m_x0), 5.0), rtol=1e-6)
    # the cap actually bites at low t and is inactive at high t
    assert m_x0.loss_weight[0] == np.float32(5.0)
    assert m_x0.loss_weight[-1] < 1e-6

    with pytest.raises(ValueError, match="weighting"):
        make_schedule(10, "cosine", "eps", weighting="bogus")
