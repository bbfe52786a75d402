"""Multivariate distribution tests (reference distributions.hpp:219-372,
Wishart.cpp, dirichlet.cpp, mvt.cpp, matrix_normal.cpp)."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.stats as sps

from boom_tpu import dists


def _spd(d, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(d, d))
    return jnp.asarray(a @ a.T + d * np.eye(d))


def test_mvn_logpdf_matches_scipy(rng_key):
    d = 4
    cov = _spd(d)
    mean = jnp.arange(d, dtype=jnp.float64)
    x = dists.mvn.sample(rng_key, mean, cov, shape=(5,))
    got = np.asarray(dists.mvn.logpdf(x, mean, cov))
    want = sps.multivariate_normal(np.asarray(mean), np.asarray(cov)).logpdf(
        np.asarray(x))
    np.testing.assert_allclose(got, want, rtol=1e-9)
    # precision parameterization agrees
    prec = jnp.linalg.inv(cov)
    got_prec = np.asarray(dists.mvn.logpdf_prec(x, mean, prec))
    np.testing.assert_allclose(got_prec, want, rtol=1e-8)


def test_mvn_sample_covariance(rng_key):
    d = 3
    cov = _spd(d, 1)
    mean = jnp.asarray([1.0, -2.0, 0.5])
    draws = np.asarray(dists.mvn.sample(rng_key, mean, cov, shape=(200_000,)))
    np.testing.assert_allclose(draws.mean(0), np.asarray(mean), atol=0.03)
    np.testing.assert_allclose(np.cov(draws.T), np.asarray(cov), rtol=0.03,
                               atol=0.03)


def test_mvn_prec_and_suf_consistent(rng_key):
    d = 3
    cov = _spd(d, 2)
    prec = jnp.linalg.inv(cov)
    mean = jnp.asarray([0.5, 1.0, -1.0])
    draws = np.asarray(dists.mvn.sample_prec(rng_key, mean, prec,
                                             shape=(200_000,)))
    np.testing.assert_allclose(draws.mean(0), np.asarray(mean), atol=0.03)
    np.testing.assert_allclose(np.cov(draws.T), np.asarray(cov), rtol=0.04,
                               atol=0.04)
    # sufficient-statistic form: b = prec @ mean
    b = prec @ mean
    draws2 = np.asarray(dists.mvn.sample_suf(rng_key, b, prec,
                                             shape=(200_000,)))
    np.testing.assert_allclose(draws2.mean(0), np.asarray(mean), atol=0.03)


def test_mvt(rng_key):
    d, df = 3, 7.0
    sigma = _spd(d, 3)
    mean = jnp.zeros(d)
    x = dists.mvt.sample(rng_key, mean, sigma, df, shape=(200_000,))
    got = np.asarray(dists.mvt.logpdf(x[:5], mean, sigma, df))
    want = sps.multivariate_t(np.zeros(d), np.asarray(sigma), df).logpdf(
        np.asarray(x[:5]))
    np.testing.assert_allclose(got, want, rtol=1e-9)
    # covariance of mvt = sigma * df/(df-2)
    np.testing.assert_allclose(np.cov(np.asarray(x).T),
                               np.asarray(sigma) * df / (df - 2),
                               rtol=0.07, atol=0.1)


def test_dirichlet(rng_key):
    alpha = jnp.asarray([2.0, 3.0, 5.0])
    x = dists.dirichlet.sample(rng_key, alpha, shape=(100_000,))
    np.testing.assert_allclose(np.asarray(x).mean(0),
                               np.asarray(alpha) / 10.0, atol=0.005)
    got = np.asarray(dists.dirichlet.logpdf(x[:5], alpha))
    want = sps.dirichlet(np.asarray(alpha)).logpdf(np.asarray(x[:5]).T)
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_wishart(rng_key):
    d, df = 3, 6.0
    scale = _spd(d, 4) / 10.0
    w = dists.wishart.sample(rng_key, df, scale, shape=(100_000,))
    np.testing.assert_allclose(np.asarray(w).mean(0),
                               df * np.asarray(scale), rtol=0.03, atol=0.03)
    got = np.asarray(dists.wishart.logpdf(w[:5], df, scale))
    want = sps.wishart(int(df), np.asarray(scale)).logpdf(
        np.moveaxis(np.asarray(w[:5]), 0, -1))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_inverse_wishart(rng_key):
    d, df = 3, 8.0
    scale = _spd(d, 5)
    w = dists.inverse_wishart.sample(rng_key, df, scale, shape=(100_000,))
    # mean = scale / (df - d - 1)
    np.testing.assert_allclose(np.asarray(w).mean(0),
                               np.asarray(scale) / (df - d - 1),
                               rtol=0.05, atol=0.05)
    got = np.asarray(dists.inverse_wishart.logpdf(w[:5], df, scale))
    want = sps.invwishart(int(df), np.asarray(scale)).logpdf(
        np.moveaxis(np.asarray(w[:5]), 0, -1))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_matrix_normal(rng_key):
    r, c = 3, 2
    u = _spd(r, 6)
    v = _spd(c, 7)
    m = jnp.zeros((r, c))
    x = dists.matrix_normal.sample(rng_key, m, u, v, shape=(5,))
    got = np.asarray(dists.matrix_normal.logpdf(x, m, u, v))
    want = sps.matrix_normal(np.zeros((r, c)), np.asarray(u),
                             np.asarray(v)).logpdf(np.asarray(x))
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_batched_mvn(rng_key):
    """Batch dims flow through logpdf and sample (chains axis)."""
    d, batch = 3, 8
    cov = jnp.stack([_spd(d, i) for i in range(batch)])
    mean = jnp.zeros((batch, d))
    x = dists.mvn.sample(rng_key, mean, cov)
    assert x.shape == (batch, d)
    lp = dists.mvn.logpdf(x, mean, cov)
    assert lp.shape == (batch,)
    for i in range(batch):
        want = sps.multivariate_normal(
            np.zeros(d), np.asarray(cov[i])).logpdf(np.asarray(x[i]))
        np.testing.assert_allclose(float(lp[i]), want, rtol=1e-9)
