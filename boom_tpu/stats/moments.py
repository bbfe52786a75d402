"""Moments, autocorrelation, and summary statistics.

Reference: stats/moments.{hpp,cpp} (mean/var/sd/skewness/kurtosis for
vectors and matrix columns), stats/acf.cpp (autocorrelation via the
direct method), stats/summary.hpp.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mean(x, axis=0):
    return jnp.mean(x, axis=axis)


def var(x, axis=0):
    """Sample variance (n-1 denominator, matching the reference)."""
    n = x.shape[axis]
    return jnp.var(x, axis=axis) * n / jnp.maximum(n - 1, 1)


def sd(x, axis=0):
    return jnp.sqrt(var(x, axis=axis))


def skewness(x, axis=0):
    m = jnp.mean(x, axis=axis, keepdims=True)
    s = jnp.std(x, axis=axis, keepdims=True)
    return jnp.mean(((x - m) / s) ** 3, axis=axis)


def kurtosis(x, axis=0, excess=True):
    m = jnp.mean(x, axis=axis, keepdims=True)
    s = jnp.std(x, axis=axis, keepdims=True)
    k = jnp.mean(((x - m) / s) ** 4, axis=axis)
    return k - 3.0 if excess else k


def acf(x, max_lag: int, demean: bool = True):
    """Autocorrelation function for lags 0..max_lag (reference
    stats/acf.cpp; same normalization as R's acf: divide every lag's
    cross-sum by n and by the lag-0 variance)."""
    x = jnp.asarray(x)
    n = x.shape[0]
    if demean:
        x = x - jnp.mean(x)
    denom = jnp.sum(x * x) / n

    def one(lag):
        # full overlap per lag via masking: sum x[:n-lag] * x[lag:]
        mask = jnp.arange(n) < (n - lag)
        prod = x * jnp.roll(x, -lag)
        return jnp.sum(jnp.where(mask, prod, 0.0)) / n

    lags = jnp.arange(max_lag + 1)
    return jax.vmap(one)(lags) / denom


def pacf(x, max_lag: int):
    """Partial autocorrelations via Levinson-Durbin on the ACF."""
    rho = acf(x, max_lag)

    def body(carry, k):
        phi_prev, prev_pacf = carry  # phi_prev: [max_lag]
        idx = jnp.arange(max_lag)
        # rho[k - j - 1] for j < k-1
        r_rev = rho[jnp.clip(k - 1 - idx, 0, max_lag)]
        num = rho[k] - jnp.sum(
            jnp.where(idx < k - 1, phi_prev * r_rev, 0.0))
        den = 1.0 - jnp.sum(
            jnp.where(idx < k - 1, phi_prev * rho[jnp.clip(idx + 1, 0,
                                                           max_lag)], 0.0))
        a = num / den
        phi_new = jnp.where(
            idx < k - 1,
            phi_prev - a * phi_prev[jnp.clip(k - 2 - idx, 0, max_lag - 1)],
            jnp.where(idx == k - 1, a, 0.0))
        return (phi_new, a), a

    init = (jnp.zeros(max_lag, rho.dtype), jnp.zeros((), rho.dtype))
    _, pacfs = jax.lax.scan(body, init, jnp.arange(1, max_lag + 1))
    return pacfs


def quantiles(x, probs, axis=0):
    return jnp.quantile(x, jnp.asarray(probs), axis=axis)


def summary(x):
    """Six-number summary dict (reference stats/summary.hpp /
    NumericSummary)."""
    qs = jnp.quantile(x, jnp.asarray([0.0, 0.25, 0.5, 0.75, 1.0]))
    return {
        "min": qs[0], "q1": qs[1], "median": qs[2], "q3": qs[3],
        "max": qs[4], "mean": jnp.mean(x), "sd": sd(x),
    }
