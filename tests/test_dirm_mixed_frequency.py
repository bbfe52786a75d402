"""dirm (DynamicInterceptRegression) and mixed-frequency
(AggregatedStateSpaceRegression) observation models.

Reference: Models/StateSpace/DynamicInterceptRegression.hpp:100,
AggregatedStateSpaceRegression.hpp:249, R front ends bsts/R/dirm.R and
bsts/R/mixed.frequency.R.
"""

import jax
import jax.numpy as jnp
import numpy as np

from boom_tpu.inference import run_mcmc
from boom_tpu.models.glm.regression import SpikeSlabPrior
from boom_tpu.statespace import LocalLevel, LocalLinearTrend, SdPrior
from boom_tpu.statespace.dirm import DynamicInterceptRegression
from boom_tpu.statespace.mixed_frequency import (
    MixedFrequencyRegression,
    build_aggregation_matrix,
)


def _dirm_data(key, t_len=200, n_per_t=5, p=4):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    lvl = jnp.cumsum(0.15 * jax.random.normal(k1, (t_len,)))
    x = jax.random.normal(k2, (t_len, n_per_t, p))
    beta = jnp.asarray([2.0, -1.5, 0.0, 0.0])
    sigma = 0.5
    y = (lvl[:, None] + x @ beta
         + sigma * jax.random.normal(k3, (t_len, n_per_t)))
    # ragged: knock out a random ~20% of observations
    observed = jax.random.uniform(k4, (t_len, n_per_t)) > 0.2
    return y, x, observed, lvl, beta, sigma


def test_dirm_recovers_regression_and_level(rng_key):
    # fixed key chosen so the null coefficients have no spurious
    # correlation in this realization (|z| < 0.5 by OLS) — the
    # exclusion assertion tests the sampler, not sampling luck
    key = jax.random.fold_in(jax.random.key(0), 9)
    y, x, observed, lvl, beta_true, sigma_true = _dirm_data(key)
    prior = SpikeSlabPrior.from_data(
        jnp.reshape(x, (-1, x.shape[-1])), jnp.reshape(y, (-1,)),
        expected_model_size=2)
    model = DynamicInterceptRegression(
        y=y, predictors=x, observed=observed,
        blocks=[LocalLevel.default(jnp.mean(y, 1))], reg_prior=prior)
    res = run_mcmc(jax.random.key(1), model.kernel(), model.init_state,
                   num_draws=300, num_chains=2, burn=200)
    beta_post = np.asarray(jnp.mean(res.draws["beta"], (0, 1)))
    np.testing.assert_allclose(beta_post, np.asarray(beta_true), atol=0.1)
    incl = np.asarray(jnp.mean(res.draws["gamma"], (0, 1)))
    assert incl[0] > 0.9 and incl[1] > 0.9
    assert incl[2] < 0.5 and incl[3] < 0.5
    sig_post = float(jnp.mean(jnp.sqrt(res.draws["sigsq_obs"])))
    assert abs(sig_post - sigma_true) < 0.08, sig_post
    # imputed intercept tracks the true level
    final = jax.tree_util.tree_map(lambda a: a[0], res.final_state)
    track = np.asarray(final["alpha"][:, 0])
    assert np.abs(track - np.asarray(lvl)).mean() < 0.3


def test_dirm_from_ragged_and_loglik_predict(rng_key):
    y, x, observed, lvl, beta_true, _ = _dirm_data(rng_key, t_len=80,
                                                   n_per_t=3)
    y_list = [np.asarray(y[t])[np.asarray(observed[t])] for t in range(80)]
    x_list = [np.asarray(x[t])[np.asarray(observed[t])] for t in range(80)]
    prior = SpikeSlabPrior.from_data(
        jnp.reshape(x, (-1, x.shape[-1])), jnp.reshape(y, (-1,)),
        expected_model_size=2)
    model = DynamicInterceptRegression.from_ragged(
        y_list, x_list, blocks=[LocalLevel.default(jnp.mean(y, 1))],
        reg_prior=prior)
    assert model.y.shape[0] == 80
    res = run_mcmc(jax.random.key(2), model.kernel(), model.init_state,
                   num_draws=100, num_chains=2, burn=100)
    final = jax.tree_util.tree_map(lambda a: a[0], res.final_state)
    ll = float(model.log_lik(final))
    assert np.isfinite(ll)
    preds = model.predict(jax.random.key(3), final,
                          jnp.zeros((10, x.shape[-1])))
    assert preds.shape == (10,)
    assert np.isfinite(np.asarray(preds)).all()


def test_aggregation_matrix():
    # 8 fine periods, coarse period changes after every 3rd; period 2
    # straddles (fraction 0.5)
    wc = np.asarray([0, 0, 0, 1, 1, 1, 2, 2])
    frac = np.asarray([1, 1, 0.5, 1, 1, 1, 1, 1.0])
    c = np.asarray(build_aggregation_matrix(wc, frac))
    assert c.shape == (3, 8)
    np.testing.assert_allclose(c[0], [1, 1, 0.5, 0, 0, 0, 0, 0])
    np.testing.assert_allclose(c[1], [0, 0, 0.5, 1, 1, 1, 0, 0])
    np.testing.assert_allclose(c[2], [0, 0, 0, 0, 0, 0, 1, 1])


def test_mixed_frequency_conditioning_exact(rng_key):
    """Constraint projection must reproduce the totals exactly."""
    t_len = 48
    wc = np.repeat(np.arange(12), 4)
    agg = build_aggregation_matrix(wc)
    y_coarse = jnp.arange(12.0) + 3.0
    model = MixedFrequencyRegression(
        coarse_y=y_coarse, agg=agg,
        blocks=[LocalLevel(sigma_prior=SdPrior(0.1), initial_sd=1.0)])
    w = model._draw_w(rng_key, jnp.zeros((t_len,)), jnp.asarray(0.5))
    np.testing.assert_allclose(np.asarray(agg @ w), np.asarray(y_coarse),
                               atol=1e-8)


def test_mixed_frequency_recovers_fine_series(rng_key):
    """Weekly latent LLT + regression observed as 4-week totals: the
    model should recover the fine-scale path and the coefficients."""
    k1, k2, k3 = jax.random.split(rng_key, 3)
    t_len = 240
    slope = 0.03
    lvl = 5.0 + slope * jnp.arange(t_len) + jnp.cumsum(
        0.05 * jax.random.normal(k1, (t_len,)))
    x = jax.random.normal(k2, (t_len, 2))
    beta_true = jnp.asarray([1.5, 0.0])
    sigma = 0.4
    w_true = lvl + x @ beta_true + sigma * jax.random.normal(
        k3, (t_len,))
    wc = np.repeat(np.arange(t_len // 4), 4)
    agg = build_aggregation_matrix(wc)
    y_coarse = agg @ w_true

    prior = SpikeSlabPrior.from_data(x, w_true, expected_model_size=1)
    model = MixedFrequencyRegression(
        coarse_y=y_coarse, agg=agg, predictors=x, reg_prior=prior,
        blocks=[LocalLinearTrend.default(
            jnp.repeat(y_coarse / 4.0, 4))])
    res = run_mcmc(jax.random.key(7), model.kernel(), model.init_state,
                   num_draws=300, num_chains=2, burn=300)
    beta_post = np.asarray(jnp.mean(res.draws["beta"], (0, 1)))
    np.testing.assert_allclose(beta_post, np.asarray(beta_true),
                               atol=0.15)
    # fine-scale recovery: posterior-mean w tracks the truth
    w_post = np.asarray(jnp.mean(res.draws["w"], (0, 1)))
    rmse = float(np.sqrt(np.mean((w_post - np.asarray(w_true)) ** 2)))
    assert rmse < 2.5 * sigma, rmse
    # forecast: coarse totals continue the trend
    final = jax.tree_util.tree_map(lambda a: a[0], res.final_state)
    fut_agg = build_aggregation_matrix(np.repeat(np.arange(3), 4))
    ws, coarse = model.predict(
        jax.random.key(8), final, 12,
        future_predictors=jnp.zeros((12, 2)), future_agg=fut_agg)
    assert ws.shape == (12,) and coarse.shape == (3,)
    expect = float(4 * (lvl[-1] + slope * 6))
    assert abs(float(coarse[1]) - expect) < 0.25 * abs(expect)
