"""Scalar/matrix zoo stragglers: simulate → fit → recover truth."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.stats

from boom_tpu.inference import run_mcmc
from boom_tpu.models.scalar_zoo import (
    Lognormal,
    MatrixNormal,
    Mvt,
    ProductDirichlet,
    TruncatedGamma,
    UniformShrinkage,
)
from boom_tpu.testing import check_mcmc_matrix, check_mcmc_vector


def test_lognormal_recovers_truth():
    key = jax.random.key(0)
    y = Lognormal.simulate(key, 600, mu=1.2, sigma=0.7)
    model = Lognormal(y=y)
    res = run_mcmc(jax.random.key(1), model.kernel(), model.init_state,
                   num_draws=400, num_chains=4, burn=50)
    assert check_mcmc_vector(res.draws["mu"].reshape(-1, 1),
                             jnp.asarray([1.2]))
    assert check_mcmc_vector(res.draws["sigsq"].reshape(-1, 1),
                             jnp.asarray([0.49]))
    # density sanity vs scipy
    lp = Lognormal.logpdf(jnp.asarray(2.5), 1.2, 0.49)
    np.testing.assert_allclose(
        float(lp), scipy.stats.lognorm.logpdf(2.5, 0.7, scale=np.exp(1.2)),
        rtol=1e-6)
    np.testing.assert_allclose(
        float(Lognormal.mean(1.2, 0.49)),
        scipy.stats.lognorm.mean(0.7, scale=np.exp(1.2)), rtol=1e-6)


def test_truncated_gamma_density_and_sim():
    m = TruncatedGamma(3.0, 2.0, lo=0.5, hi=2.0)
    # density integrates to one over the truncation window
    xs = np.linspace(0.5, 2.0, 4001)
    dens = np.exp(np.asarray(m.logp(jnp.asarray(xs))))
    np.testing.assert_allclose(np.trapezoid(dens, xs), 1.0, rtol=1e-4)
    assert float(m.logp(jnp.asarray(0.3))) == -np.inf
    draws = np.asarray(m.sim(jax.random.key(0), shape=(4000,)))
    assert draws.min() >= 0.5 and draws.max() <= 2.0
    expected = float(np.trapezoid(xs * dens, xs))
    np.testing.assert_allclose(draws.mean(), expected, rtol=0.02)


def test_uniform_shrinkage_mle_and_posterior():
    key = jax.random.key(2)
    y = UniformShrinkage.simulate(key, 3000, z0=2.5)
    model = UniformShrinkage(y=y)
    z_hat = float(model.mle())
    assert abs(z_hat - 2.5) < 0.35
    res = run_mcmc(jax.random.key(3), model.kernel(), model.init_state,
                   num_draws=400, num_chains=4, burn=100)
    # with n=3000 the posterior is sharp around the REALIZED data's
    # optimum (sampling variability of the data moves it ~0.09 from the
    # simulation truth), so compare against the mle, and the mle against
    # the truth above
    assert check_mcmc_vector(res.draws["z0"].reshape(-1, 1),
                             jnp.asarray([z_hat]))


def test_product_dirichlet_mle_and_gibbs():
    nu_true = jnp.asarray([[8.0, 2.0, 1.0],
                           [1.5, 6.0, 2.5],
                           [2.0, 2.0, 9.0]])
    pi = ProductDirichlet.simulate(jax.random.key(4), 400, nu_true)
    model = ProductDirichlet(pi=pi)
    nu_hat = model.mle()
    np.testing.assert_allclose(np.asarray(nu_hat), np.asarray(nu_true),
                               rtol=0.25)
    # score is ~zero at the mle
    g = np.asarray(model.dloglike(nu_hat))
    assert np.max(np.abs(g)) < 1e-2 * model.n
    res = run_mcmc(jax.random.key(5), model.kernel(), model.init_state,
                   num_draws=300, num_chains=2, burn=100)
    post_mean = np.asarray(res.draws["nu"]).reshape(-1, 9).mean(0)
    np.testing.assert_allclose(post_mean, np.asarray(nu_true).ravel(),
                               rtol=0.3)


def test_mvt_em_and_gibbs():
    mu = jnp.asarray([1.0, -2.0])
    sigma = jnp.asarray([[1.0, 0.6], [0.6, 2.0]])
    y = Mvt.simulate(jax.random.key(6), 1500, mu, sigma, nu=6.0)
    model = Mvt(y=y)
    fit = model.em(iters=40)
    np.testing.assert_allclose(np.asarray(fit["mu"]), np.asarray(mu),
                               atol=0.15)
    np.testing.assert_allclose(np.asarray(fit["sigma"]), np.asarray(sigma),
                               rtol=0.35, atol=0.15)
    assert 3.0 < float(fit["nu"]) < 12.0
    # EM must not decrease the exact log likelihood vs the start
    ll_fit = float(model.loglike(fit["mu"], fit["sigma"], fit["nu"]))
    st0 = model.init_state(jax.random.key(0))
    ll0 = float(model.loglike(st0["mu"], st0["sigma"], st0["nu"]))
    assert ll_fit >= ll0 - 1e-6
    res = run_mcmc(jax.random.key(7), model.kernel(), model.init_state,
                   num_draws=300, num_chains=2, burn=100)
    assert check_mcmc_matrix(res.draws["mu"].reshape(-1, 2), mu)


def test_matrix_normal_flip_flop():
    u = jnp.asarray([[1.0, 0.3], [0.3, 0.8]])
    v = jnp.asarray([[1.0, -0.2, 0.1],
                     [-0.2, 1.5, 0.0],
                     [0.1, 0.0, 0.7]])
    v = v / v[0, 0]
    mean = jnp.arange(6.0).reshape(2, 3)
    y = MatrixNormal.simulate(jax.random.key(8), 800, mean, u, v)
    model = MatrixNormal(y=y)
    fit = model.mle(iters=60)
    np.testing.assert_allclose(np.asarray(fit["mean"]), np.asarray(mean),
                               atol=0.12)
    np.testing.assert_allclose(np.asarray(fit["row_cov"]), np.asarray(u),
                               rtol=0.2, atol=0.08)
    np.testing.assert_allclose(np.asarray(fit["col_cov"]), np.asarray(v),
                               rtol=0.2, atol=0.08)
    # the fit's likelihood beats identity covariances
    ll_fit = float(model.loglike(fit["mean"], fit["row_cov"],
                                 fit["col_cov"]))
    ll_id = float(model.loglike(fit["mean"], jnp.eye(2), jnp.eye(3)))
    assert ll_fit > ll_id


def test_gaussian_given_sigma():
    from boom_tpu.models.scalar_zoo import GaussianGivenSigma

    prior = GaussianGivenSigma(mean=2.0, sample_size=5.0)
    sigsq = jnp.asarray(4.0)
    assert abs(float(prior.variance(sigsq)) - 0.8) < 1e-9
    # conjugate mean draw concentrates at the weighted average
    draws = jax.vmap(
        lambda k: prior.posterior_mean_draw(
            k, suf_n=100.0, suf_sum=100.0 * 3.0, sigsq=sigsq))(
        jax.random.split(jax.random.key(0), 4000))
    want = (5.0 * 2.0 + 300.0) / 105.0
    assert abs(float(draws.mean()) - want) < 0.02
    sd_want = float(jnp.sqrt(sigsq / 105.0))
    assert abs(float(draws.std()) - sd_want) < 0.02
    # density normalizes against scipy
    from scipy.stats import norm

    x = 1.3
    assert abs(float(prior.logpdf(x, sigsq))
               - norm.logpdf(x, 2.0, np.sqrt(0.8))) < 1e-6


def test_exponential_increment():
    from boom_tpu.models.scalar_zoo import ExponentialIncrement

    rates = jnp.asarray([2.0, 0.5, 5.0])
    m0 = ExponentialIncrement(x=jnp.zeros((1, 3)))
    x = m0.simulate(jax.random.key(0), 3000, rates)
    assert bool(jnp.all(jnp.diff(x, axis=-1) >= 0))
    model = ExponentialIncrement(x=x)
    kern = jax.jit(model.kernel())
    st = model.init_state(jax.random.key(1))
    draws = []
    for i in range(200):
        st = kern(jax.random.fold_in(jax.random.key(2), i), st)
        if i >= 50:
            draws.append(np.asarray(st["rates"]))
    mean = np.stack(draws).mean(0)
    assert np.abs(mean / np.asarray(rates) - 1.0).max() < 0.1, mean
