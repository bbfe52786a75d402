"""Marginal variance moves for Bsts (state path integrated out by the
Kalman filter): the slice variant and the batched multiple-try Metropolis
variant must both leave the posterior invariant.

These are the bench-critical kernels (bench.py bsts_llt); the reference
has no marginal move (its samplers are all conditional-on-state,
StateSpacePosteriorSampler.cpp:42-64) — this is a capability addition, so
the test standard is self-consistency: the marginal variants must agree
in distribution with the plain conditional Gibbs sweep on the same data,
and the posterior must cover the simulation truth."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from boom_tpu import testing
from boom_tpu.inference import run_mcmc
from boom_tpu.statespace import Bsts, LocalLinearTrend


def _sim(key, t_len=150):
    k1, k2, k3 = jax.random.split(key, 3)
    slope = jnp.cumsum(0.05 * jax.random.normal(k3, (t_len,)))
    level = jnp.cumsum(slope + 0.3 * jax.random.normal(k1, (t_len,))) + 2.0
    y = level + 0.5 * jax.random.normal(k2, (t_len,))
    return y


def _fit(model, key, draws=400, chains=8, burn=200):
    res = run_mcmc(
        key, model.kernel(), model.init_state, draws, num_chains=chains,
        burn=burn,
        extract=lambda s: {
            "so": s["sigsq_obs"],
            "lvl": s["blocks"]["trend"]["sigma_level_sq"],
            "slp": s["blocks"]["trend"]["sigma_slope_sq"]})
    return res.draws


def test_mtm_marginal_matches_conditional_posterior():
    y = _sim(jax.random.key(11))
    base = dict(y=y, blocks=[LocalLinearTrend.default(y)])
    plain = Bsts(**base)
    mtm = Bsts(**base, marginal_sigma_slice=True, marginal_move="mtm",
               marginal_mtm_trials=12, marginal_mtm_moves=2)
    d_plain = _fit(plain, jax.random.key(1), draws=600, burn=400)
    d_mtm = _fit(mtm, jax.random.key(2))
    for name in ("so", "lvl", "slp"):
        a = np.sqrt(np.asarray(d_plain[name]).ravel())
        b = np.sqrt(np.asarray(d_mtm[name]).ravel())
        assert testing.distributions_match(
            a[:: a.size // 400], b[:: b.size // 400], pvalue=1e-4), name


def test_slice_marginal_matches_mtm_marginal():
    y = _sim(jax.random.key(7))
    base = dict(y=y, blocks=[LocalLinearTrend.default(y)],
                marginal_sigma_slice=True)
    sl = Bsts(**base, marginal_move="slice", marginal_slice_random_dirs=1)
    mtm = Bsts(**base, marginal_move="mtm", marginal_mtm_trials=12)
    d_sl = _fit(sl, jax.random.key(3))
    d_mtm = _fit(mtm, jax.random.key(4))
    for name in ("so", "lvl", "slp"):
        a = np.sqrt(np.asarray(d_sl[name]).ravel())
        b = np.sqrt(np.asarray(d_mtm[name]).ravel())
        assert testing.distributions_match(
            a[:: a.size // 400], b[:: b.size // 400], pvalue=1e-4), name


def test_mtm_marginal_covers_truth():
    y = _sim(jax.random.key(21), t_len=300)
    model = Bsts(y=y, blocks=[LocalLinearTrend.default(y)],
                 marginal_sigma_slice=True, marginal_move="mtm")
    d = _fit(model, jax.random.key(5), draws=500, burn=300)
    so = np.sqrt(np.asarray(d["so"]).ravel())
    lvl = np.sqrt(np.asarray(d["lvl"]).ravel())
    # generous intervals: short series, weakly identified variances
    assert np.quantile(so, 0.02) < 0.5 < np.quantile(so, 0.999)
    assert np.quantile(lvl, 0.02) < 0.3 < np.quantile(lvl, 0.999)


def test_grid_marginal_matches_conditional_posterior():
    y = _sim(jax.random.key(31))
    base = dict(y=y, blocks=[LocalLinearTrend.default(y)])
    plain = Bsts(**base)
    grid = Bsts(**base, marginal_sigma_slice=True, marginal_move="grid")
    d_plain = _fit(plain, jax.random.key(8), draws=600, burn=400)
    d_grid = _fit(grid, jax.random.key(9))
    for name in ("so", "lvl", "slp"):
        a = np.sqrt(np.asarray(d_plain[name]).ravel())
        b = np.sqrt(np.asarray(d_grid[name]).ravel())
        assert testing.distributions_match(
            a[:: a.size // 400], b[:: b.size // 400], pvalue=1e-4), name


def test_tim_marginal_matches_conditional_posterior():
    y = _sim(jax.random.key(41))
    base = dict(y=y, blocks=[LocalLinearTrend.default(y)])
    plain = Bsts(**base)
    tim = Bsts(**base, marginal_sigma_slice=True, marginal_move="tim")
    d_plain = _fit(plain, jax.random.key(12), draws=600, burn=400)
    d_tim = _fit(tim, jax.random.key(13))
    for name in ("so", "lvl", "slp"):
        a = np.sqrt(np.asarray(d_plain[name]).ravel())
        b = np.sqrt(np.asarray(d_tim[name]).ravel())
        assert testing.distributions_match(
            a[:: a.size // 400], b[:: b.size // 400], pvalue=1e-4), name


@pytest.mark.slow
def test_tim_marginal_bench_scale_quantile_match():
    """Bench-regime evidence for the min-ESS ~= N claim: at T=500 (the
    bench length, bench-like DGP) the TIM-refreshed variance posteriors
    must match the r03-validated SLICE marginal variant's quantiles.
    Guards against the independence sampler quietly sampling the wrong
    marginal at scale. (The plain conditional sampler is NOT a valid
    arbiter here — its near-zero variance stickiness is the pathology
    both marginal moves exist to fix, and at T=500 its low quantiles
    sit far below both marginal variants', which agree.)"""
    k1, k2, k3 = jax.random.split(jax.random.key(4207), 3)
    t_len = 500
    slope = jnp.cumsum(0.02 * jax.random.normal(k3, (t_len,)))
    level = jnp.cumsum(slope + 0.3 * jax.random.normal(k1, (t_len,)))
    y = level + 0.5 * jax.random.normal(k2, (t_len,))
    base = dict(y=y, blocks=[LocalLinearTrend.default(y)],
                marginal_sigma_slice=True)
    sl = Bsts(**base, marginal_move="slice",
              marginal_slice_random_dirs=2)
    tim = Bsts(**base, marginal_move="tim")
    d_sl = _fit(sl, jax.random.key(21), draws=400, burn=300,
                chains=8)
    d_tim = _fit(tim, jax.random.key(22), draws=400, burn=300,
                 chains=8)
    for name in ("so", "lvl", "slp"):
        a = np.sqrt(np.asarray(d_sl[name]).ravel())
        b = np.sqrt(np.asarray(d_tim[name]).ravel())
        qa = np.quantile(a, [0.1, 0.25, 0.5, 0.75, 0.9])
        qb = np.quantile(b, [0.1, 0.25, 0.5, 0.75, 0.9])
        scale = np.maximum(qa, 1e-12)
        assert np.abs(qb / scale - 1.0).max() < 0.15, (name, qa, qb)
