"""WeightedMvn / LowRankMvn / CompositeMixture (models/mvn_extras.py)
— reference Models/WeightedMvnModel.hpp:70, LowRankMvnModel.hpp:45,
CompositeModel.hpp:36."""

import numpy as np
import jax
import jax.numpy as jnp

from boom_tpu.inference import run_mcmc
from boom_tpu.models.mvn_extras import (
    CompositeMixture,
    LowRankMvn,
    WeightedMvnModel,
)


def test_weighted_mvn_recovers_truth():
    key = jax.random.key(0)
    mu_true = jnp.array([1.0, -2.0, 0.5])
    a = jnp.array([[1.0, 0.3, 0.0], [0.3, 1.5, -0.2], [0.0, -0.2, 0.8]])
    sigma_true = a @ a.T / 2.0
    y, w = WeightedMvnModel.simulate(key, 800, mu_true, sigma_true)
    model = WeightedMvnModel(y=y, w=w, kappa=0.01)
    res = run_mcmc(jax.random.key(1), model.kernel(),
                   model.init_state, num_draws=400, num_chains=2,
                   burn=200)
    mu_hat = np.asarray(res.draws["mu"]).reshape(-1, 3).mean(0)
    assert np.allclose(mu_hat, np.asarray(mu_true), atol=0.15)
    sig_hat = np.asarray(res.draws["sigma"]).reshape(-1, 3, 3).mean(0)
    assert np.allclose(sig_hat, np.asarray(sigma_true), atol=0.35)


def test_weighted_mvn_suf_and_loglik():
    key = jax.random.key(2)
    y, w = WeightedMvnModel.simulate(key, 50, jnp.zeros(2), jnp.eye(2))
    model = WeightedMvnModel(y=y, w=w)
    s, syy, n, sumw, sumlogw = model.suf()
    assert np.allclose(np.asarray(s), np.asarray((w[:, None] * y).sum(0)))
    assert float(n) == 50
    # loglik equals the sum of scipy mvn logpdfs with cov Sigma/w_i
    from scipy.stats import multivariate_normal

    mu = np.array([0.1, -0.2])
    sig = np.array([[1.2, 0.3], [0.3, 0.9]])
    want = sum(
        multivariate_normal.logpdf(np.asarray(y)[i], mu,
                                   sig / float(w[i]))
        for i in range(50))
    got = float(model.loglik(jnp.asarray(mu), jnp.asarray(sig)))
    assert np.isclose(got, want, rtol=1e-6)


def test_low_rank_mvn_simulation_and_support():
    mu = jnp.array([1.0, 2.0, 3.0, 4.0])
    b = jnp.array([[1.0, 0.0], [0.5, 1.0], [0.0, 1.0], [1.0, -1.0]])
    sigma = b @ b.T  # rank 2 in R^4
    m = LowRankMvn.from_covariance(mu, sigma)
    assert m.rank == 2
    draws = m.sim(jax.random.key(0), shape=(4000,))
    assert np.allclose(np.asarray(draws.mean(0)), np.asarray(mu),
                       atol=0.1)
    assert np.allclose(np.asarray(jnp.cov(draws.T)),
                       np.asarray(sigma), atol=0.2)
    # on-support point has finite subspace density; off-support -inf
    on = m.sim(jax.random.key(1), shape=(3,))
    lp = m.subspace_logpdf(on)
    assert np.all(np.isfinite(np.asarray(lp)))
    off = on + jnp.array([1.0, 0.0, 0.0, 0.0])  # leave the column space
    lp_off = m.subspace_logpdf(off)
    assert np.all(np.asarray(lp_off) == -np.inf)


def test_composite_mixture_recovers_clusters():
    """Mixed numeric+categorical+count clustering with a shared
    indicator — the CompositeModel-as-mixture-component use case."""
    key = jax.random.key(3)
    weights = jnp.array([0.6, 0.4])
    mu = jnp.array([[-2.0], [2.0]])
    sigsq = jnp.array([[0.5], [0.5]])
    theta = jnp.array([[[0.9, 0.1]], [[0.2, 0.8]]])  # [K, d_cat, L]
    lam = jnp.array([[1.0], [8.0]])
    sim = CompositeMixture.simulate(key, 600, weights, mu, sigsq,
                                    theta=theta, lam=lam)
    model = CompositeMixture(
        numeric=sim["numeric"], categorical=sim["categorical"],
        counts=jnp.asarray(sim["counts"], jnp.float64),
        num_levels=2, num_components=2)
    res = run_mcmc(jax.random.key(4), model.kernel(), model.init_state,
                   num_draws=300, num_chains=2, burn=150)
    # resolve label switching by sorting on mu
    mu_d = np.asarray(res.draws["mu"]).reshape(-1, 2)
    lam_d = np.asarray(res.draws["lam"]).reshape(-1, 2)
    w_d = np.asarray(res.draws["weights"]).reshape(-1, 2)
    order = np.argsort(mu_d, axis=1)
    mu_s = np.take_along_axis(mu_d, order, 1).mean(0)
    lam_s = np.take_along_axis(lam_d, order, 1).mean(0)
    w_s = np.take_along_axis(w_d, order, 1).mean(0)
    assert np.allclose(mu_s, [-2.0, 2.0], atol=0.3)
    assert np.allclose(lam_s, [1.0, 8.0], atol=0.8)
    assert np.allclose(w_s, [0.6, 0.4], atol=0.08)
    # z recovers the simulated clustering (up to the same relabeling)
    z_last = np.asarray(res.draws["z"])[0, -1]
    truth = np.asarray(sim["z"])
    agree = max((z_last == truth).mean(), (z_last != truth).mean())
    assert agree > 0.9


def test_composite_mixture_numeric_only_loglik_finite():
    key = jax.random.key(5)
    x = jax.random.normal(key, (40, 2))
    model = CompositeMixture(numeric=x, categorical=None, counts=None,
                             num_components=3)
    st = model.init_state(jax.random.key(6))
    assert np.isfinite(float(model.log_lik(st)))
    st2 = model.kernel()(jax.random.key(7), st)
    assert st2["mu"].shape == (3, 2)
