"""Truncated-distribution tests (reference distributions/trun_norm.cpp,
trun_gamma.cpp, trun_logit.cpp). KS tests against scipy truncated
references, including deep-tail regimes where naive inverse-CDF fails."""

import jax.numpy as jnp
import numpy as np
import scipy.stats as sps

from boom_tpu import dists


def _ks_ok(draws, cdf, n=5000, pmin=1e-4):
    return sps.kstest(np.asarray(draws)[:n], cdf).pvalue > pmin


def test_trun_normal_central(rng_key):
    d = dists.trun_normal.sample(rng_key, 1.0, 2.0, lo=-1.0, hi=4.0,
                                 shape=(100_000,))
    a, b = (-1.0 - 1.0) / 2.0, (4.0 - 1.0) / 2.0
    ref = sps.truncnorm(a, b, loc=1.0, scale=2.0)
    assert float(jnp.min(d)) >= -1.0 and float(jnp.max(d)) <= 4.0
    assert _ks_ok(d, ref.cdf)


def test_trun_normal_one_sided(rng_key):
    # The probit data-augmentation case: truncated above/below 0
    d = dists.trun_normal.sample(rng_key, -0.7, 1.0, lo=0.0, shape=(100_000,))
    ref = sps.truncnorm(0.7, np.inf, loc=-0.7, scale=1.0)
    assert float(jnp.min(d)) >= 0.0
    assert _ks_ok(d, ref.cdf)


def test_trun_normal_deep_tail(rng_key):
    # 8-sigma lower bound: rejection path
    d = dists.trun_normal.sample(rng_key, 0.0, 1.0, lo=8.0, shape=(100_000,))
    ref = sps.truncnorm(8.0, np.inf)
    assert float(jnp.min(d)) >= 8.0
    assert np.isfinite(np.asarray(d)).all()
    assert _ks_ok(d, ref.cdf)
    # upper deep tail via mirror
    d2 = dists.trun_normal.sample(rng_key, 0.0, 1.0, hi=-8.0, shape=(100_000,))
    assert float(jnp.max(d2)) <= -8.0
    assert _ks_ok(-np.asarray(d2), ref.cdf)


def test_trun_normal_logpdf():
    x = jnp.asarray([0.5, 1.0, 2.0])
    got = np.asarray(dists.trun_normal.logpdf(x, 1.0, 2.0, lo=0.0, hi=3.0))
    a, b = (0.0 - 1.0) / 2.0, (3.0 - 1.0) / 2.0
    want = sps.truncnorm(a, b, loc=1.0, scale=2.0).logpdf(np.asarray(x))
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_trun_normal_moments():
    m, s = dists.trun_normal.mean_sd(0.0, 1.0, lo=jnp.asarray(1.0))
    ref = sps.truncnorm(1.0, np.inf)
    np.testing.assert_allclose(float(m), ref.mean(), rtol=1e-8)
    np.testing.assert_allclose(float(s), ref.std(), rtol=1e-8)


def test_trun_exponential(rng_key):
    d = dists.trun_exponential.sample(rng_key, 2.0, lo=0.5, hi=1.5,
                                      shape=(100_000,))
    assert float(jnp.min(d)) >= 0.5 and float(jnp.max(d)) <= 1.5
    ref = sps.truncexpon((1.5 - 0.5) * 2.0, loc=0.5, scale=0.5)
    assert _ks_ok(d, ref.cdf)


def test_trun_gamma_central(rng_key):
    a, b = 3.0, 2.0
    d = dists.trun_gamma.sample(rng_key, a, b, lo=0.5, hi=3.0,
                                shape=(100_000,))
    assert float(jnp.min(d)) >= 0.5 and float(jnp.max(d)) <= 3.0
    g = sps.gamma(a, scale=1 / b)
    za, zb = g.cdf(0.5), g.cdf(3.0)
    cdf = lambda x: (g.cdf(x) - za) / (zb - za)  # noqa: E731
    assert _ks_ok(d, cdf)


def test_trun_gamma_tail(rng_key):
    # deep upper tail: P(X > lo) ~ 1e-12
    a, b = 2.0, 1.0
    lo = 35.0
    d = dists.trun_gamma.sample(rng_key, a, b, lo=lo, shape=(100_000,))
    assert float(jnp.min(d)) >= lo
    assert np.isfinite(np.asarray(d)).all()
    # conditional density ~ x e^-x renormalized; check conditional mean
    # E[X | X>lo] ≈ lo + 1 + 1/(lo) approx for gamma(2) tail ~ x e^-x
    m = float(jnp.mean(d))
    assert 35.9 < m < 36.15, m


def test_trun_logistic(rng_key):
    d = dists.trun_logistic.sample(rng_key, 0.5, 1.5, lo=0.0, hi=4.0,
                                   shape=(100_000,))
    assert float(jnp.min(d)) >= 0.0 and float(jnp.max(d)) <= 4.0
    g = sps.logistic(0.5, 1.5)
    za, zb = g.cdf(0.0), g.cdf(4.0)
    cdf = lambda x: (g.cdf(x) - za) / (zb - za)  # noqa: E731
    assert _ks_ok(d, cdf)


def test_trun_logistic_tail(rng_key):
    # MLVS-style: logistic truncated to deep region
    d = dists.trun_logistic.sample(rng_key, 0.0, 1.0, lo=20.0,
                                   shape=(100_000,))
    assert float(jnp.min(d)) >= 20.0
    assert np.isfinite(np.asarray(d)).all()
    # tail of logistic is Exp(1): E[X | X>20] ≈ 21
    assert 20.9 < float(jnp.mean(d)) < 21.1
