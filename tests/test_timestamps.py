"""Irregular/duplicate timestamp handling (VERDICT r4 missing #3) —
reference format.timestamps.R (RegularizeTimestamps :77-127, NoGaps,
HasDuplicateTimestamps) and TimeSeriesDataPolicy multiplexing, as the
TPU-native collapse-to-grid path (utils.timestamps + Bsts
observed/obs_weights/extra_obs_ss)."""

import datetime

import jax
import numpy as np
import pytest

from boom_tpu.api import BstsModel
from boom_tpu.utils.timestamps import (
    collapse_to_grid,
    is_regular,
    no_duplicates,
    no_gaps,
    regularize_timestamps,
)


def test_regularity_predicates():
    assert is_regular([1.0, 2.0, 3.0, 4.0])
    assert not no_duplicates([1.0, 2.0, 2.0, 3.0])
    assert not no_gaps([1.0, 2.0, 5.0])
    assert no_gaps([1.0, 2.0, 3.1])  # < 1.8x min delta: not a gap


def test_regularize_numeric_gaps_and_duplicates():
    ts = [0.0, 1.0, 1.0, 2.0, 5.0]
    info = regularize_timestamps(ts)
    assert not info.timestamps_are_trivial
    assert info.number_of_time_points == 6  # grid 0..5 step 1
    np.testing.assert_allclose(info.regular_timestamps,
                               np.arange(6.0))
    np.testing.assert_array_equal(info.timestamp_mapping,
                                  [0, 1, 1, 2, 5])


def test_regularize_dates():
    base = datetime.date(2024, 3, 1)
    ts = [base, base + datetime.timedelta(days=1),
          base + datetime.timedelta(days=4)]
    info = regularize_timestamps(np.asarray(ts, dtype="datetime64[D]"))
    assert info.number_of_time_points == 5
    np.testing.assert_array_equal(info.timestamp_mapping, [0, 1, 4])


def test_collapse_to_grid_means_and_extra_ss():
    ts = [0.0, 1.0, 1.0, 3.0]
    y = np.array([1.0, 2.0, 4.0, 8.0])
    info = regularize_timestamps(ts)
    g = collapse_to_grid(y, info)
    np.testing.assert_allclose(g["y_grid"], [1.0, 3.0, 0.0, 8.0])
    np.testing.assert_array_equal(g["observed"],
                                  [True, True, False, True])
    np.testing.assert_allclose(g["weights"], [1.0, 2.0, 0.0, 1.0])
    # within-timepoint SS: (2-3)^2 + (4-3)^2 = 2
    np.testing.assert_allclose(g["extra_ss"], 2.0)


@pytest.mark.slow
def test_bsts_fit_irregular_recovers_observation_sd():
    """Local-level data sampled at irregular timestamps (gaps +
    duplicates); the regularized fit must recover the observation sd
    and produce finite forecasts. This is the reference's
    bsts(y, timestamps=...) capability."""
    rng = np.random.default_rng(7)
    t_grid = 150
    level = np.cumsum(0.1 * rng.normal(size=t_grid)) + 3.0
    # observe: days 0..99 once, days 100..119 twice (duplicates),
    # days 120..149 unobserved (gap at the end trimmed by grid), plus
    # a hole at days 40..49
    ts, ys = [], []
    for t in range(t_grid):
        if 40 <= t < 50 or t >= 120:
            continue
        reps = 2 if t >= 100 else 1
        for _ in range(reps):
            ts.append(float(t))
            ys.append(level[t] + 0.5 * rng.normal())
    m = BstsModel().add_local_level()
    m.fit(np.asarray(ys), timestamps=np.asarray(ts), niter=200,
          num_chains=2, burn=200)
    info = m._timestamp_info
    assert info.number_of_time_points == 120
    s = m.summary()["observation_sd"]
    assert 0.3 < s["mean"] < 0.8, s
    fc = np.asarray(m.predict(horizon=10))
    assert np.isfinite(fc).all()
