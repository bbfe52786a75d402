"""Irregular / duplicate timestamp handling — reference
Interfaces/R/bsts/R/format.timestamps.R (HasDuplicateTimestamps :102,
NoGaps :112, IsRegular :125, RegularizeTimestamps :77-127) and the C++
``TimeSeriesDataPolicy`` multiplexing (multiple observations per time
point).

TPU-native design: rather than multiplexed per-timepoint observation
lists (dynamic shapes), the raw observations are collapsed onto the
REGULAR grid at data-preparation time:

* gaps become grid points with ``observed=False``;
* duplicate timestamps are averaged — exact for the Gaussian
  observation model with per-point variance ``sigsq / n_t`` plus the
  within-timepoint sum of squares re-entering the sigma posterior
  (``Bsts.obs_weights`` / ``Bsts.extra_obs_ss``).

Everything downstream stays fixed-shape.
"""

from __future__ import annotations

import dataclasses

import numpy as np

# a delta counts as a gap if >= 1.8x the smallest delta (the reference's
# floating-point-safe "twice", format.timestamps.R NoGaps)
_GAP_FACTOR = 1.8


@dataclasses.dataclass(frozen=True)
class TimestampInfo:
    """The reference's TimestampInfo list as a frozen record."""

    timestamps_are_trivial: bool
    number_of_time_points: int
    regular_timestamps: np.ndarray  # [T_grid]
    timestamp_mapping: np.ndarray  # [n_obs] int grid index per raw obs


def no_duplicates(timestamps) -> bool:
    t = np.asarray(timestamps)
    return len(np.unique(t)) == len(t)


def no_gaps(timestamps) -> bool:
    t = np.unique(np.asarray(timestamps))
    if len(t) < 2:
        return True
    dt = np.diff(_as_float(t))
    return bool(np.all(dt < _GAP_FACTOR * dt.min()))


def is_regular(timestamps) -> bool:
    return no_duplicates(timestamps) and no_gaps(timestamps)


def _as_float(t):
    """Numeric view of numeric / datetime64 / date-like timestamps."""
    t = np.asarray(t)
    if np.issubdtype(t.dtype, np.datetime64):
        return t.astype("datetime64[s]").astype(np.float64)
    if t.dtype == object:  # python dates / datetimes
        return np.asarray([np.datetime64(x, "s") for x in t]
                          ).astype(np.float64)
    return t.astype(np.float64)


def regularize_timestamps(timestamps) -> TimestampInfo:
    """Build the smallest regular grid covering the raw timestamps with
    step = the smallest observed delta, and the raw-obs -> grid-index
    mapping (reference RegularizeTimestamps + zoo::MATCH)."""
    raw = np.asarray(timestamps)
    tf = _as_float(raw)
    uniq = np.unique(tf)
    if len(uniq) < 2:
        grid = uniq
    else:
        step = np.diff(uniq).min()
        n = int(round((uniq[-1] - uniq[0]) / step)) + 1
        grid = uniq[0] + step * np.arange(n)
    # map each raw timestamp to its nearest grid point
    idx = np.clip(np.searchsorted(grid, tf), 0, len(grid) - 1)
    left = np.clip(idx - 1, 0, len(grid) - 1)
    mapping = np.where(
        np.abs(grid[left] - tf) < np.abs(grid[idx] - tf), left, idx)
    trivial = is_regular(raw)
    if len(grid) > 2 * len(raw):
        import warnings

        warnings.warn("Expanding the time series to a regular interval "
                      "resulted in very large amounts of missing data.")
    return TimestampInfo(
        timestamps_are_trivial=trivial,
        number_of_time_points=len(grid),
        regular_timestamps=grid,
        timestamp_mapping=mapping.astype(np.int64),
    )


def collapse_to_grid(y, info: TimestampInfo, predictors=None):
    """Collapse raw observations onto the regular grid.

    Returns dict with
      y_grid [T]: per-timepoint MEANS (0.0 at gaps),
      observed [T] bool,
      weights [T]: observation counts n_t,
      extra_ss: within-timepoint sum of squares lost by averaging,
      predictors_grid [T, p] (per-timepoint means) when predictors given.

    Duplicate-timestamp predictors are averaged too: exact when the
    duplicates share a design row (the common multiplexed case); for
    genuinely different rows this is the standard aggregated-regression
    approximation.
    """
    y = np.asarray(y, np.float64)
    t_grid = info.number_of_time_points
    m = info.timestamp_mapping
    counts = np.bincount(m, minlength=t_grid).astype(np.float64)
    sums = np.bincount(m, weights=y, minlength=t_grid)
    observed = counts > 0
    means = np.where(observed, sums / np.maximum(counts, 1.0), 0.0)
    sq = np.bincount(m, weights=y * y, minlength=t_grid)
    extra_ss = float(np.sum(sq - counts * means**2))
    out = {"y_grid": means, "observed": observed, "weights": counts,
           "extra_ss": max(extra_ss, 0.0)}
    if predictors is not None:
        x = np.asarray(predictors, np.float64)
        xg = np.zeros((t_grid, x.shape[1]))
        for j in range(x.shape[1]):
            xg[:, j] = np.bincount(m, weights=x[:, j],
                                   minlength=t_grid)
        xg = np.where(observed[:, None], xg
                      / np.maximum(counts[:, None], 1.0), 0.0)
        out["predictors_grid"] = xg
    return out
