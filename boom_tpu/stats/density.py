"""Empirical distributions: ECDF, KDE, frequency tables, streaming
quantiles.

Reference: stats/ECDF.hpp:28, stats/EmpiricalDensity.hpp,
stats/FreqDist.hpp, stats/IQagent.hpp:45 (incremental quantile agent for
streaming draws), stats/hexbin.hpp.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Ecdf:
    """Empirical CDF (reference stats/ECDF.hpp:28): sorted data once,
    evaluation by searchsorted."""

    sorted_x: jax.Array

    @staticmethod
    def from_data(x):
        return Ecdf(sorted_x=jnp.sort(jnp.asarray(x)))

    def __call__(self, q):
        n = self.sorted_x.shape[0]
        return jnp.searchsorted(self.sorted_x, jnp.asarray(q),
                                side="right") / n

    def quantile(self, p):
        n = self.sorted_x.shape[0]
        idx = jnp.clip((jnp.asarray(p) * n).astype(jnp.int32), 0, n - 1)
        return self.sorted_x[idx]


def kde(x, grid, bandwidth=None):
    """Gaussian kernel density estimate on a grid (reference
    EmpiricalDensity uses spline-smoothed ECDF; a Gaussian KDE is the
    batched-friendly equivalent). Silverman's rule if bandwidth None."""
    x = jnp.asarray(x)
    n = x.shape[0]
    if bandwidth is None:
        sd = jnp.std(x)
        iqr = jnp.quantile(x, 0.75) - jnp.quantile(x, 0.25)
        a = jnp.minimum(sd, iqr / 1.34)
        bandwidth = 0.9 * a * n ** (-0.2)
    z = (grid[:, None] - x[None, :]) / bandwidth
    return jnp.mean(jnp.exp(-0.5 * z * z), -1) / (
        bandwidth * jnp.sqrt(2.0 * jnp.pi))


def freq_dist(x, num_values: int):
    """Counts of integer values 0..num_values-1 (reference FreqDist)."""
    return jnp.bincount(jnp.asarray(x, jnp.int32), length=num_values)


class IQagentState(NamedTuple):
    """Streaming quantile state (reference stats/IQagent.hpp:45): fixed
    probability grid, current quantile estimates, total count."""

    probs: jax.Array  # [m]
    quantiles: jax.Array  # [m]
    n: jax.Array
    # data buffer for refresh batches
    buffer: jax.Array  # [B]
    fill: jax.Array


def iqagent_init(probs=None, buffer_size: int = 256):
    if probs is None:
        probs = jnp.concatenate([
            jnp.asarray([0.01, 0.025]),
            jnp.linspace(0.05, 0.95, 19),
            jnp.asarray([0.975, 0.99]),
        ])
    m = probs.shape[0]
    return IQagentState(
        probs=probs, quantiles=jnp.zeros((m,)),
        n=jnp.zeros(()), buffer=jnp.zeros((buffer_size,)),
        fill=jnp.zeros((), jnp.int32))


def iqagent_add(state: IQagentState, x):
    """Add one observation; merges the buffer into the quantile estimates
    when full (the reference's CDF-merging update, vectorized)."""
    buf = state.buffer.at[state.fill].set(x)
    fill = state.fill + 1

    def merge(args):
        buf, fill = args
        bs = buf.shape[0]
        sorted_buf = jnp.sort(buf)
        n_old, n_new = state.n, state.n + bs
        # empirical cdf of the buffer evaluated at current quantiles
        def buf_cdf(q):
            return jnp.searchsorted(sorted_buf, q, side="right") / bs

        # combined cdf: weighted mix of old (cdf = probs at quantiles)
        # and buffer ecdf; invert on the pooled sorted grid (duplicates
        # are fine for interp; jnp.unique-with-size pads unsorted)
        grid = jnp.sort(jnp.concatenate([state.quantiles, sorted_buf]))
        old_cdf = jnp.interp(grid, state.quantiles, state.probs,
                             left=0.0, right=1.0)
        old_cdf = jnp.where(state.n > 0, old_cdf, 0.0)
        mix = (n_old * old_cdf + bs * jax.vmap(buf_cdf)(grid)) / n_new
        new_q = jax.vmap(lambda p: jnp.interp(p, mix, grid))(state.probs)
        return IQagentState(
            probs=state.probs, quantiles=new_q, n=n_new,
            buffer=jnp.zeros_like(buf), fill=jnp.zeros((), jnp.int32))

    def no_merge(args):
        buf, fill = args
        return IQagentState(probs=state.probs, quantiles=state.quantiles,
                            n=state.n, buffer=buf, fill=fill)

    return jax.lax.cond(fill >= state.buffer.shape[0], merge, no_merge,
                        (buf, fill))


def iqagent_add_batch(state: IQagentState, xs):
    """Fold a batch of observations through the agent (scan)."""

    def body(st, x):
        return iqagent_add(st, x), None

    state, _ = jax.lax.scan(body, state, xs)
    return state


def iqagent_quantile(state: IQagentState, p):
    """Interpolated quantile estimate at probability p."""
    return jnp.interp(jnp.asarray(p), state.probs, state.quantiles)
