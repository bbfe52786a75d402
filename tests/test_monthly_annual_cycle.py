"""MonthlyAnnualCycle (round 5, VERDICT r4 missing #2): a 12-season
cycle for daily data rotating on the first of each month — reference
SeasonalStateModel.hpp:134 (new_season(t) = day()==1) and bsts
AddMonthlyAnnualCycle (add.monthly.annual.cycle.R). Also covers the new
time-varying-transition engine path (kalman.SsmParams.t_seq)."""

import datetime

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from boom_tpu.statespace import Bsts, LocalLevel, MonthlyAnnualCycle
from boom_tpu.statespace.kalman import (
    SsmParams,
    kalman_filter,
    kalman_loglik,
    smooth_states,
)


def _llt_params(t_seq=None, t_len=None):
    d = 2
    return SsmParams(
        z=jnp.zeros((d,)).at[0].set(1.0),
        t_mat=jnp.eye(d).at[0, 1].set(1.0),
        r_mat=jnp.eye(d), q_mat=jnp.diag(jnp.asarray([0.3, 0.05])),
        h=jnp.asarray(0.4), a0=jnp.zeros((d,)), p0=jnp.eye(d) * 2.0,
        t_seq=t_seq)


def test_t_seq_constant_matches_static_path(rng_key):
    """Engine check: a t_seq that just repeats the static T must give
    identical loglik and smoothed states as the static-T fast path."""
    t_len = 60
    y = np.cumsum(np.random.default_rng(0).normal(size=t_len))
    p_static = _llt_params()
    ts = jnp.broadcast_to(p_static.t_mat, (t_len, 2, 2))
    p_seq = _llt_params(t_seq=ts)
    ll_a = kalman_loglik(p_static, y)
    ll_b = kalman_loglik(p_seq, y)
    np.testing.assert_allclose(float(ll_a), float(ll_b), rtol=1e-10)
    sa = smooth_states(p_static, y)
    sb = smooth_states(p_seq, y)
    np.testing.assert_allclose(np.asarray(sa), np.asarray(sb),
                               rtol=1e-8, atol=1e-10)
    fa = kalman_filter(p_static, y)
    fb = kalman_filter(p_seq, y)
    np.testing.assert_allclose(float(fa.loglik), float(fb.loglik),
                               rtol=1e-10)


def test_monthly_boundary_pattern():
    """Transitions rotate exactly when the NEXT day is the 1st."""
    first = datetime.date(2024, 1, 15)
    block = MonthlyAnnualCycle.default(jnp.ones(100), first)
    bnd = np.asarray(block._boundary(0, 99))
    for k in range(99):
        d = first + datetime.timedelta(days=k + 1)
        assert bnd[k] == (1.0 if d.day == 1 else 0.0), (k, d)
    ts = np.asarray(block.t_seq(100))
    eye = np.eye(11)
    rot = np.asarray(block._rotation())
    for k in range(99):
        want = rot if bnd[k] else eye
        np.testing.assert_array_equal(ts[k], want)
    # q gate equals the boundary pattern
    qs = np.asarray(block.q_scale_seq({}, 100))[:, 0]
    np.testing.assert_array_equal(qs[:99], bnd)
    # forecast continuation lines up with the calendar
    fut = np.asarray(block.future_q_scale(100, 40))[:, 0]
    for k in range(40):
        d = first + datetime.timedelta(days=100 + k)
        assert fut[k] == (1.0 if d.day == 1 else 0.0)


@pytest.mark.slow
def test_monthly_annual_cycle_recovers_pattern(rng_key):
    """Simulate ~2 years of daily data with a fixed monthly effect plus
    a slow level; the fitted monthly state contribution must track the
    true month pattern (the reference test pattern for seasonal
    models)."""
    first = datetime.date(2022, 1, 1)
    t_len = 730
    rng = np.random.default_rng(3)
    month_effect = np.array(
        [3.0, -2.0, 1.5, 0.5, -1.0, 2.0, -0.5, 0.0, 1.0, -2.5, 0.8, -2.8])
    month_effect -= month_effect.mean()
    months = np.array([(first + datetime.timedelta(days=t)).month - 1
                       for t in range(t_len)])
    level = np.cumsum(0.02 * rng.normal(size=t_len))
    y = level + month_effect[months] + 0.3 * rng.normal(size=t_len)
    y = jnp.asarray(y)

    model = Bsts(y=y, blocks=[LocalLevel.default(y),
                              MonthlyAnnualCycle.default(y, first)])
    from boom_tpu.inference import run_mcmc

    res = run_mcmc(jax.random.key(4), model.kernel(), model.init_state,
                   num_draws=150, num_chains=2, burn=150,
                   extract=lambda s: {
                       "monthly0": s["alpha"][:, 1],
                       "sig": s["blocks"]["monthly"]["sigma_monthly_sq"]})
    # the first monthly state coordinate is the active month's effect
    got = np.asarray(res.draws["monthly0"]).mean(axis=(0, 1))  # [T]
    # compare month-effect profile: average fitted monthly contribution
    # by calendar month vs truth (up to the common mean)
    prof = np.array([got[months == m].mean() for m in range(12)])
    prof -= prof.mean()
    corr = np.corrcoef(prof, month_effect)[0, 1]
    assert corr > 0.95, (corr, prof, month_effect)


@pytest.mark.slow
def test_monthly_api_fit_and_predict():
    import pandas  # noqa: F401 — only to mirror user flow if present

    from boom_tpu.api import BstsModel

    first = datetime.date(2023, 1, 1)
    t_len = 400
    rng = np.random.default_rng(5)
    months = np.array([(first + datetime.timedelta(days=t)).month - 1
                       for t in range(t_len)])
    pat = np.sin(2 * np.pi * np.arange(12) / 12) * 2.0
    y = 5.0 + pat[months] + 0.4 * rng.normal(size=t_len)

    m = (BstsModel()
         .add_local_level()
         .add_monthly_annual_cycle(first))
    m.fit(y, niter=100, burn=100, num_chains=2, seed=1)
    fc = m.predict(horizon=30)
    assert np.asarray(fc).shape[-1] == 30
    assert np.isfinite(np.asarray(fc)).all()
