"""Simulate-fit-recover tests for the GLM stragglers (reference
MvtRegModel.hpp:29, IndependentRegressionModels.hpp:33,
RegressionShrinkageSampler.hpp:44, AggregatedRegressionModel.hpp:162)."""

import jax
import jax.numpy as jnp
import numpy as np

from boom_tpu.inference.driver import run_mcmc
from boom_tpu.models.glm.extras import (
    AggregatedRegression,
    IndependentRegressions,
    MvtRegression,
    RegressionShrinkage,
)


def test_mvt_regression_recovers_truth(rng_key):
    x, y, b_true = MvtRegression.simulate(rng_key, n=600, p=3, m=2,
                                          nu=4.0, noise_scale=0.5)
    model = MvtRegression.from_data(x, y)
    res = run_mcmc(jax.random.key(1), model.kernel(), model.init_state,
                   num_draws=400, num_chains=2, burn=200)
    d = res.stacked()
    b_hat = np.asarray(d["B"]).mean(0)
    np.testing.assert_allclose(b_hat, np.asarray(b_true), atol=0.15)
    nu_draws = np.asarray(d["nu"])
    # heavy tails detected: nu posterior concentrates well below gaussian
    assert 2.0 < np.median(nu_draws) < 15.0
    # error scale: Sigma ~ noise_scale^2 I
    sig = np.linalg.inv(np.asarray(d["siginv"]).mean(0))
    assert abs(sig[0, 0] - 0.25) < 0.15


def test_mvt_vs_gaussian_outlier_robustness(rng_key):
    """t regression downweights planted outliers; its coefficient error
    should beat the pure Gaussian MNIW fit."""
    from boom_tpu.models.glm.mvreg import MultivariateRegression

    k1, k2 = jax.random.split(rng_key)
    x = jax.random.normal(k1, (300, 2))
    b_true = jnp.array([[1.0], [-2.0]])
    y = x @ b_true + 0.3 * jax.random.normal(k2, (300, 1))
    y = y.at[:15].add(8.0)  # gross outliers

    mt = MvtRegression.from_data(x, y)
    rt = run_mcmc(jax.random.key(3), mt.kernel(), mt.init_state,
                  num_draws=300, num_chains=2, burn=200)
    bt = np.asarray(rt.stacked()["B"]).mean(0)

    mg = MultivariateRegression.from_data(x, y)
    rg = run_mcmc(jax.random.key(3), mg.kernel(), mg.init_state,
                  num_draws=300, num_chains=2, burn=100)
    bg = np.asarray(rg.stacked()["B"]).mean(0)

    err_t = np.abs(bt - np.asarray(b_true)).max()
    err_g = np.abs(bg - np.asarray(b_true)).max()
    assert err_t < err_g
    assert err_t < 0.15
    # the outlier rows get small latent weights
    w = np.asarray(rt.final_state["w"]).mean(0)
    assert w[:15].mean() < 0.5 * w[15:].mean()


def test_independent_regressions(rng_key):
    k1, k2, k3 = jax.random.split(rng_key, 3)
    n, p, m = 500, 3, 4
    x = jax.random.normal(k1, (n, p))
    b_true = jax.random.normal(k2, (m, p))
    sd_true = jnp.array([0.2, 0.5, 1.0, 2.0])
    y = x @ b_true.T + sd_true * jax.random.normal(k3, (n, m))

    model = IndependentRegressions(x=x, y=y)
    res = run_mcmc(jax.random.key(1), model.kernel(), model.init_state,
                   num_draws=300, num_chains=2, burn=20)
    d = res.stacked()
    np.testing.assert_allclose(np.asarray(d["beta"]).mean(0),
                               np.asarray(b_true), atol=0.3)
    np.testing.assert_allclose(
        np.sqrt(np.asarray(d["sigsq"]).mean(0)),
        np.asarray(sd_true), rtol=0.25)


def test_regression_shrinkage_pools_groups(rng_key):
    k1, k2 = jax.random.split(rng_key)
    n, p = 400, 12
    # group 0: coefs near +2; group 1: near -1; group 2: near 0
    groups = jnp.repeat(jnp.arange(3), 4)
    centers = jnp.array([2.0, -1.0, 0.0])
    b_true = centers[groups] + 0.1 * jax.random.normal(k1, (p,))
    x = jax.random.normal(k2, (n, p))
    y = x @ b_true + 0.5 * jax.random.normal(jax.random.key(9), (n,))

    model = RegressionShrinkage(x=x, y=y, coef_groups=groups,
                                num_groups=3)
    res = run_mcmc(jax.random.key(1), model.kernel(), model.init_state,
                   num_draws=400, num_chains=2, burn=200)
    d = res.stacked()
    np.testing.assert_allclose(np.asarray(d["beta"]).mean(0),
                               np.asarray(b_true), atol=0.2)
    b_hat = np.asarray(d["b"]).mean(0)
    np.testing.assert_allclose(b_hat, np.asarray(centers), atol=0.35)
    # shrinkage variances are small: groups are tight
    assert np.median(np.asarray(d["v"]), axis=0).max() < 1.0
    assert abs(np.sqrt(np.asarray(d["sigsq"]).mean()) - 0.5) < 0.15


def test_aggregated_regression_log(np_rng):
    """Only group totals observed; beta on log unit values recovered."""
    n_units, p, g = 300, 2, 60
    x = np_rng.normal(size=(n_units, p))
    beta_true = np.array([0.8, -0.5])
    group = np_rng.integers(0, g, size=n_units)
    z = x @ beta_true + 0.3 * np_rng.normal(size=n_units)
    y_unit = np.exp(z)
    totals = np.bincount(group, weights=y_unit, minlength=g)

    model = AggregatedRegression.from_units(x, group, totals,
                                            transformation="log")
    res = run_mcmc(jax.random.key(2), model.kernel(), model.init_state,
                   num_draws=300, num_chains=2, burn=300,
                   extract=lambda s: {"beta": s["beta"],
                                      "sigsq": s["sigsq"]})
    d = res.stacked()
    b_hat = np.asarray(d["beta"]).mean(0)
    np.testing.assert_allclose(b_hat, beta_true, atol=0.25)
    # group totals preserved exactly by the redistribution moves
    final_y = np.asarray(res.final_state["y"][0])
    np.testing.assert_allclose(final_y.sum(1), totals, rtol=1e-6)


def test_aggregated_regression_identity(np_rng):
    n_units, p, g = 200, 1, 40
    x = np_rng.normal(size=(n_units, p))
    beta_true = np.array([1.5])
    group = np_rng.integers(0, g, size=n_units)
    y_unit = x @ beta_true + 0.4 * np_rng.normal(size=n_units)
    totals = np.bincount(group, weights=y_unit, minlength=g)

    model = AggregatedRegression.from_units(
        x, group, totals, transformation="identity")
    res = run_mcmc(jax.random.key(2), model.kernel(), model.init_state,
                   num_draws=200, num_chains=2, burn=200,
                   extract=lambda s: {"beta": s["beta"]})
    b_hat = np.asarray(res.stacked()["beta"]).mean(0)
    np.testing.assert_allclose(b_hat, beta_true, atol=0.3)
