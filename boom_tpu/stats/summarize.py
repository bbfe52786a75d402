"""Column-wise data summaries: the R `summary()` surface.

Reference: Interfaces/python/R/BayesBoom/R/summary.py (summary at :7,
NumericSummary :230, CategoricalSummary :482, is_all_nines :120) and
frequency_distribution.py. These are the exploratory-data entry points
every reference front end leans on before model fitting.

Host-side numpy: summaries run once over raw data, so there is nothing
to jit — keeping them off the device avoids tunnel round trips.
"""

from __future__ import annotations

import numpy as np

__all__ = ["summarize", "NumericSummary", "CategoricalSummary"]

_DEFAULT_QUANTILES = (0.0, 0.01, 0.025, 0.1, 0.25, 0.5,
                      0.75, 0.9, 0.975, 0.99, 1.0)


def _is_all_nines(value):
    """True for the classic missing-value codes 99, -999, 9999, ...
    (summary.py:120): all digits 9, at least two of them."""
    try:
        v = abs(float(value))
    except (TypeError, ValueError):
        return False
    if not np.isfinite(v) or v != int(v):
        return False
    digits = str(int(v))
    return len(digits) >= 2 and set(digits) == {"9"}


class NumericSummary:
    """Moments, quantiles, missingness, and suspicious-code detection
    for one numeric column (summary.py:230)."""

    def __init__(self, x, quantiles=_DEFAULT_QUANTILES):
        x = np.asarray(x, float).ravel()
        self.sample_size = x.size
        x = np.where(np.isinf(x), np.nan, x)
        obs = x[~np.isnan(x)]
        self.number_missing = self.sample_size - obs.size
        self.number_observed = obs.size
        self.number_unique = np.unique(obs).size
        # flag highly repeated all-nines values as probable missing codes
        self.potential_missing_codes = []
        if obs.size:
            vals, counts = np.unique(obs, return_counts=True)
            for v, c in zip(vals, counts):
                if _is_all_nines(v) and c / obs.size > 0.05:
                    self.potential_missing_codes.append(float(v))
        if obs.size:
            self.mean = float(obs.mean())
            self.sd = float(obs.std(ddof=1)) if obs.size > 1 else 0.0
            self.quantile_probs = tuple(quantiles)
            self.quantiles = tuple(
                float(q) for q in np.quantile(obs, quantiles))
        else:
            self.mean = self.sd = float("nan")
            self.quantile_probs = tuple(quantiles)
            self.quantiles = (float("nan"),) * len(quantiles)

    @property
    def min(self):
        return self.quantiles[0]

    @property
    def max(self):
        return self.quantiles[-1]

    @property
    def median(self):
        return self.quantiles[self.quantile_probs.index(0.5)]

    def to_dict(self):
        return {
            "type": "numeric",
            "sample_size": self.sample_size,
            "number_missing": self.number_missing,
            "number_unique": self.number_unique,
            "mean": self.mean,
            "sd": self.sd,
            "quantiles": dict(zip(self.quantile_probs, self.quantiles)),
            "potential_missing_codes": self.potential_missing_codes,
        }

    def __repr__(self):
        return (f"NumericSummary(n={self.sample_size}, "
                f"missing={self.number_missing}, mean={self.mean:.4g}, "
                f"sd={self.sd:.4g}, min={self.min:.4g}, "
                f"median={self.median:.4g}, max={self.max:.4g})")


class CategoricalSummary:
    """Level frequencies for one categorical column (summary.py:482)."""

    def __init__(self, x, max_levels=10):
        x = np.asarray(x, object).ravel()
        missing = np.array([v is None or (isinstance(v, float)
                                          and np.isnan(v)) for v in x])
        obs = x[~missing]
        self.sample_size = x.size
        self.number_missing = int(missing.sum())
        self.number_observed = obs.size
        svals = np.asarray(obs, str)
        levels, counts = np.unique(svals, return_counts=True)
        order = np.argsort(-counts)
        self.levels = [str(v) for v in levels[order]]
        self.counts = [int(c) for c in counts[order]]
        self.number_unique = len(self.levels)
        self.max_levels = max_levels

    @property
    def frequencies(self):
        return dict(zip(self.levels, self.counts))

    @property
    def proportions(self):
        tot = max(self.number_observed, 1)
        return {lv: c / tot for lv, c in zip(self.levels, self.counts)}

    def to_dict(self):
        shown = dict(list(self.frequencies.items())[:self.max_levels])
        other = self.number_observed - sum(shown.values())
        out = {
            "type": "categorical",
            "sample_size": self.sample_size,
            "number_missing": self.number_missing,
            "number_unique": self.number_unique,
            "frequencies": shown,
        }
        if other > 0:
            out["other"] = other
        return out

    def __repr__(self):
        top = ", ".join(f"{lv}:{c}" for lv, c in
                        list(self.frequencies.items())[:5])
        return (f"CategoricalSummary(n={self.sample_size}, "
                f"levels={self.number_unique}, top=[{top}])")


def _summarize_column(col, numeric_min_unique=10, max_levels=10):
    arr = np.asarray(col)
    if arr.dtype.kind in "OUSb":
        return CategoricalSummary(arr, max_levels=max_levels)
    uniq = np.unique(arr[~np.isnan(np.asarray(arr, float))]).size
    if uniq < numeric_min_unique:
        # low-cardinality numerics read as categories, ANY numeric
        # dtype: the reference dispatch (R/summary.py:42) applies the
        # unique-count test to float 0/1 indicator columns too
        return CategoricalSummary(arr, max_levels=max_levels)
    return NumericSummary(arr)


def summarize(data, max_levels=10, numeric_min_unique=10):
    """Column-wise summary of a DataFrame / dict of columns / array.

    Returns {column: NumericSummary | CategoricalSummary}. Mirrors
    R.summary (summary.py:7): numerics get moments + quantiles +
    missing-code flags, strings / low-cardinality ints get frequency
    tables.
    """
    if hasattr(data, "columns"):
        cols = {c: data[c].to_numpy() for c in data.columns}
    elif isinstance(data, dict):
        cols = data
    else:
        arr = np.atleast_2d(np.asarray(data))
        if arr.shape[0] == 1:
            arr = arr.T
        cols = {f"V{j}": arr[:, j] for j in range(arr.shape[1])}
    return {name: _summarize_column(col, numeric_min_unique, max_levels)
            for name, col in cols.items()}
