"""Holiday calendar machinery + the round-2 state-model blocks
(RegressionHoliday, HierarchicalRegressionHoliday, GeneralSeasonalLLT,
DynamicRegressionAr).

Reference: Models/StateSpace/StateModels/Holiday.{hpp,cpp},
RegressionHolidayStateModel.hpp:176,
HierarchicalRegressionHolidayStateModel.hpp:72,
GeneralSeasonalStateModel.hpp:70, DynamicRegressionArStateModel.hpp.
"""

import datetime

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from boom_tpu.inference import run_mcmc
from boom_tpu.statespace import (
    Bsts,
    DynamicRegressionAr,
    GeneralSeasonalLLT,
    HierarchicalRegressionHoliday,
    LocalLevel,
    RegressionHoliday,
)
from boom_tpu.utils import (
    create_named_holiday,
    holiday_day_indices,
    holiday_window_arrays,
    named_holidays,
)
from boom_tpu.utils.dates import (
    DateRangeHoliday,
    EasterSunday,
    FixedDateHoliday,
    NthWeekdayInMonthHoliday,
)


# ---------------------------------------------------------------------------
# Calendar machinery
# ---------------------------------------------------------------------------
def test_known_holiday_dates():
    easter = EasterSunday()
    # well-known Easter dates
    assert easter.date_in_year(2024) == datetime.date(2024, 3, 31)
    assert easter.date_in_year(2025) == datetime.date(2025, 4, 20)
    assert easter.date_in_year(2000) == datetime.date(2000, 4, 23)
    thx = create_named_holiday("Thanksgiving")
    assert thx.date_in_year(2026) == datetime.date(2026, 11, 26)
    mem = create_named_holiday("MemorialDay")
    assert mem.date_in_year(2025) == datetime.date(2025, 5, 26)
    mlk = create_named_holiday("MartinLutherKingDay")
    assert mlk.date_in_year(2025) == datetime.date(2025, 1, 20)
    labor = create_named_holiday("LaborDay")
    assert labor.date_in_year(2025) == datetime.date(2025, 9, 1)
    dst = create_named_holiday("USDaylightSavingsTimeBegins")
    assert dst.date_in_year(2025) == datetime.date(2025, 3, 9)
    assert dst.date_in_year(2000) == datetime.date(2000, 4, 2)
    assert len(named_holidays()) == 18


def test_window_and_navigation():
    h = FixedDateHoliday(7, 4, days_before=2, days_after=1)
    assert h.maximum_window_width() == 4
    assert h.active_day(datetime.date(2025, 7, 2)) == 0
    assert h.active_day(datetime.date(2025, 7, 4)) == 2
    assert h.active_day(datetime.date(2025, 7, 5)) == 3
    assert h.active_day(datetime.date(2025, 7, 6)) == -1
    # cross-year window: New Year's with days_before=2 is active Dec 30
    ny = FixedDateHoliday(1, 1, days_before=2, days_after=1)
    assert ny.active_day(datetime.date(2024, 12, 30)) == 0
    assert ny.active_day(datetime.date(2025, 1, 2)) == 3
    assert h.date_on_or_after(datetime.date(2025, 7, 10)) == datetime.date(
        2026, 7, 4)
    assert h.nearest(datetime.date(2025, 7, 10)) == datetime.date(
        2025, 7, 4)


def test_day_index_arrays():
    h = FixedDateHoliday(1, 10, days_before=1, days_after=1)
    active = holiday_day_indices(h, datetime.date(2025, 1, 1), 20)
    assert list(active[:12]) == [-1] * 8 + [0, 1, 2, -1]
    h2 = FixedDateHoliday(1, 15, days_before=0, days_after=0)
    wh, wd, width = holiday_window_arrays(
        [h, h2], datetime.date(2025, 1, 1), 20)
    assert width == 3
    assert wh[9] == 0 and wd[9] == 1
    assert wh[14] == 1 and wd[14] == 0
    assert wh[0] == -1


def test_date_range_holiday():
    h = DateRangeHoliday(
        [datetime.date(2016, 2, 5)], [datetime.date(2016, 2, 8)])
    h.add_dates(datetime.date(2017, 2, 3), datetime.date(2017, 2, 6))
    assert h.maximum_window_width() == 4
    assert h.active_day(datetime.date(2016, 2, 7)) == 2
    assert h.active_day(datetime.date(2017, 2, 3)) == 0
    assert not h.active(datetime.date(2016, 2, 9))


# ---------------------------------------------------------------------------
# RegressionHoliday / HierarchicalRegressionHoliday blocks
# ---------------------------------------------------------------------------
def _simulate_holiday_series(key, t_len, which_h, which_d, patterns,
                             noise_sd=0.3):
    k1, k2 = jax.random.split(key)
    lvl = jnp.cumsum(0.05 * jax.random.normal(k1, (t_len,))) + 2.0
    flat = patterns.reshape(-1)
    idx = jnp.where(which_d >= 0, which_h * patterns.shape[1] + which_d, 0)
    effect = jnp.where(which_d >= 0, flat[idx], 0.0)
    y = lvl + effect + noise_sd * jax.random.normal(k2, (t_len,))
    return y


@pytest.mark.parametrize("hier", [False, True])
def test_regression_holiday_recovers_pattern(rng_key, hier):
    t_len = 3 * 365
    hols = [create_named_holiday("ValentinesDay", 1, 1),
            create_named_holiday("Halloween", 1, 1)]
    wh, wd, width = holiday_window_arrays(
        hols, datetime.date(2020, 1, 1), t_len)
    wh, wd = jnp.asarray(wh), jnp.asarray(wd)
    true_patterns = jnp.asarray([[1.0, 2.5, 1.2], [-0.8, -2.0, -0.6]])
    y = _simulate_holiday_series(rng_key, t_len, wh, wd, true_patterns)

    if hier:
        block = HierarchicalRegressionHoliday(
            which_holiday=wh, which_day=wd, num_holidays=2, window=width,
            b0_prior_sd=2.0, v_prior_scale=1.0)
    else:
        block = RegressionHoliday(
            which_holiday=wh, which_day=wd, num_holidays=2, window=width,
            prior_sd=2.0)
    model = Bsts(y=y, blocks=[LocalLevel.default(y), block])
    res = run_mcmc(jax.random.key(1), model.kernel(), model.init_state,
                   num_draws=200, num_chains=2, burn=200)
    post = np.asarray(jnp.mean(
        res.draws["blocks"][block.name]["pattern"], (0, 1)))
    np.testing.assert_allclose(post, np.asarray(true_patterns), atol=0.35)


def test_regression_holiday_from_holidays_and_predict(rng_key):
    # 650 days from 2020-01-01 ends 2021-10-12, so a 40-day forecast
    # horizon spans the 2021-10-30..11-01 Halloween window
    t_len = 650
    hols = [create_named_holiday("Halloween", 1, 1)]
    wh, wd, width = holiday_window_arrays(
        hols, datetime.date(2020, 1, 1), t_len)
    true_patterns = jnp.asarray([[1.0, 3.0, 1.5]])
    y = _simulate_holiday_series(
        rng_key, t_len, jnp.asarray(wh), jnp.asarray(wd), true_patterns)
    block = RegressionHoliday.from_holidays(
        y, hols, datetime.date(2020, 1, 1), prior_sd=2.0)
    model = Bsts(y=y, blocks=[LocalLevel.default(y), block])
    res = run_mcmc(jax.random.key(2), model.kernel(), model.init_state,
                   num_draws=150, num_chains=2, burn=150)
    final = jax.tree_util.tree_map(lambda a: a[0], res.final_state)
    # forecast across the next Halloween window
    horizon = 40
    wh_f, wd_f, _ = holiday_window_arrays(
        hols, datetime.date(2020, 1, 1) + datetime.timedelta(days=t_len),
        horizon)
    fz = block.future_z_rows(
        final["blocks"][block.name], wh_f, wd_f)
    preds = model.predict(jax.random.key(3), final, horizon,
                          future_z={block.name: fz})
    assert preds.shape == (horizon,)
    # the holiday bump must appear in the forecast
    bump_days = np.where(wd_f >= 0)[0]
    assert bump_days.size == 3
    base = np.delete(np.asarray(preds), bump_days).mean()
    assert float(preds[bump_days[1]]) - base > 1.0


# ---------------------------------------------------------------------------
# GeneralSeasonalLLT
# ---------------------------------------------------------------------------
def test_general_seasonal_llt_growing_amplitude(rng_key):
    """The reference's motivating case: a seasonal pattern whose
    amplitude grows over time. GSLLT should track it; per-season slopes
    should pick up the growth."""
    t_len, s = 360, 4
    t = jnp.arange(t_len)
    base = jnp.asarray([2.0, -1.0, -2.0, 1.0])
    amp = 1.0 + 0.004 * t
    signal = amp * base[t % s]
    y = signal + 0.3 * jax.random.normal(rng_key, (t_len,))
    block = GeneralSeasonalLLT.default(y, nseasons=s)
    model = Bsts(y=y, blocks=[block])
    res = run_mcmc(jax.random.key(4), model.kernel(), model.init_state,
                   num_draws=150, num_chains=2, burn=150)
    # fitted contribution tracks the signal
    final = jax.tree_util.tree_map(lambda a: a[0], res.final_state)
    contrib = model.state_contributions(final)[block.name]
    err = np.asarray(contrib - signal)
    assert np.abs(err[20:]).mean() < 0.4, np.abs(err[20:]).mean()


# ---------------------------------------------------------------------------
# DynamicRegressionAr
# ---------------------------------------------------------------------------
def test_dynamic_regression_ar_tracks_coefficient(rng_key):
    t_len = 400
    k1, k2, k3 = jax.random.split(rng_key, 3)
    x = jax.random.normal(k1, (t_len, 1)) * 2.0
    # AR(1) coefficient path with phi = 0.95
    phi_true = 0.95

    def step(b, e):
        b2 = phi_true * b + e
        return b2, b2

    innov = 0.15 * jax.random.normal(k2, (t_len,))
    _, beta_path = jax.lax.scan(step, jnp.asarray(1.0), innov)
    y = x[:, 0] * beta_path + 0.3 * jax.random.normal(k3, (t_len,))

    block = DynamicRegressionAr.default(y, x, lags=1)
    model = Bsts(y=y, blocks=[LocalLevel.default(y), block])
    res = run_mcmc(jax.random.key(5), model.kernel(), model.init_state,
                   num_draws=200, num_chains=2, burn=200)
    phi_post = float(jnp.mean(
        res.draws["blocks"][block.name]["phi"][:, :, 0, 0]))
    assert 0.8 < phi_post <= 1.0, phi_post
    # imputed coefficient path tracks the truth
    final = jax.tree_util.tree_map(lambda a: a[0], res.final_state)
    slices = dict(zip((b.name for b in model.blocks), model._slices()))
    start, dim = slices[block.name]
    path = np.asarray(final["alpha"][:, start])
    corr = np.corrcoef(path, np.asarray(beta_path))[0, 1]
    assert corr > 0.9, corr
