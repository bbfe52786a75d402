"""Property tests for continuous distributions against scipy.

Mirrors the reference's distributions/tests/ strategy (moment and CDF
round-trip checks, reference distributions/tests/*_test.cc) with scipy as
the double-precision oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as sps

from boom_tpu import dists

CONT_CASES = [
    # (ours, scipy frozen, args for ours)
    (dists.normal, sps.norm(1.5, 2.0), (1.5, 2.0)),
    (dists.lognormal, sps.lognorm(0.7, scale=np.exp(0.3)), (0.3, 0.7)),
    (dists.gamma, sps.gamma(2.5, scale=1 / 1.3), (2.5, 1.3)),
    (dists.gamma, sps.gamma(0.3, scale=1 / 0.5), (0.3, 0.5)),
    (dists.inverse_gamma, sps.invgamma(3.0, scale=2.0), (3.0, 2.0)),
    (dists.chisq, sps.chi2(4.0), (4.0,)),
    (dists.exponential, sps.expon(scale=1 / 2.0), (2.0,)),
    (dists.beta, sps.beta(2.0, 3.0), (2.0, 3.0)),
    (dists.beta, sps.beta(0.5, 0.5), (0.5, 0.5)),
    (dists.uniform, sps.uniform(-1.0, 3.0), (-1.0, 2.0)),
    (dists.student_t, sps.t(5.0), (5.0,)),
    (dists.cauchy, sps.cauchy(0.5, 2.0), (0.5, 2.0)),
    (dists.logistic, sps.logistic(0.3, 1.7), (0.3, 1.7)),
    (dists.weibull, sps.weibull_min(1.5, scale=2.0), (1.5, 2.0)),
    (dists.f_dist, sps.f(4.0, 7.0), (4.0, 7.0)),
    (dists.laplace, sps.laplace(0.2, 1.5), (0.2, 1.5)),
    (dists.gumbel, sps.gumbel_r(0.5, 2.0), (0.5, 2.0)),
    (dists.inverse_gaussian, sps.invgauss(2.0 / 3.0, scale=3.0), (2.0, 3.0)),
]


@pytest.mark.parametrize("ours,ref,args", CONT_CASES,
                         ids=[c[0].__name__ + str(i) for i, c in enumerate(CONT_CASES)])
def test_logpdf_cdf_match_scipy(ours, ref, args):
    x = jnp.asarray(np.linspace(ref.ppf(0.001), ref.ppf(0.999), 41))
    got = np.asarray(ours.logpdf(x, *args))
    want = ref.logpdf(np.asarray(x))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-9)
    if hasattr(ours, "cdf"):
        got_cdf = np.asarray(ours.cdf(x, *args))
        want_cdf = ref.cdf(np.asarray(x))
        np.testing.assert_allclose(got_cdf, want_cdf, rtol=2e-6, atol=1e-9)


@pytest.mark.parametrize("ours,ref,args", CONT_CASES,
                         ids=[c[0].__name__ + str(i) for i, c in enumerate(CONT_CASES)])
def test_quantile_roundtrip(ours, ref, args):
    if not hasattr(ours, "quantile"):
        pytest.skip("no quantile")
    p = jnp.asarray([0.001, 0.01, 0.1, 0.3, 0.5, 0.7, 0.9, 0.99, 0.999])
    q = np.asarray(ours.quantile(p, *args))
    want = ref.ppf(np.asarray(p))
    np.testing.assert_allclose(q, want, rtol=5e-5, atol=1e-7)


@pytest.mark.parametrize("ours,ref,args", CONT_CASES,
                         ids=[c[0].__name__ + str(i) for i, c in enumerate(CONT_CASES)])
def test_sample_moments(ours, ref, args, rng_key):
    n = 200_000
    draws = np.asarray(ours.sample(rng_key, *args, shape=(n,)))
    assert draws.shape == (n,)
    mean, var = ref.stats("mv")
    if np.isfinite(mean):
        se = np.sqrt(var / n) if np.isfinite(var) else None
        if se is not None and np.isfinite(se):
            assert abs(draws.mean() - mean) < 6 * se + 1e-3
    # KS test against the reference CDF
    stat = sps.kstest(draws[:5000], ref.cdf).pvalue
    assert stat > 1e-4


def test_scaled_inv_chisq(rng_key):
    df, sigsq = 5.0, 2.0
    draws = np.asarray(dists.scaled_inv_chisq.sample(
        rng_key, df, sigsq, shape=(200_000,)))
    # X = df*sigsq / chisq(df)
    ref = sps.invgamma(df / 2, scale=df * sigsq / 2)
    assert sps.kstest(draws[:5000], ref.cdf).pvalue > 1e-4
    x = jnp.asarray([0.5, 1.0, 2.0, 5.0])
    np.testing.assert_allclose(
        np.asarray(dists.scaled_inv_chisq.logpdf(x, df, sigsq)),
        ref.logpdf(np.asarray(x)), rtol=1e-8)


def test_normal_logcdf_tails():
    x = jnp.asarray([-40.0, -20.0, -10.0, 0.0, 10.0])
    got = np.asarray(dists.normal.logcdf(x))
    want = sps.norm.logcdf(np.asarray(x))
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_gamma_quantile_extreme_shapes():
    for a in [0.01, 0.1, 1.0, 10.0, 1000.0]:
        p = jnp.asarray([0.01, 0.5, 0.99])
        got = np.asarray(dists.gamma.quantile(p, a, 1.0))
        want = sps.gamma(a).ppf(np.asarray(p))
        np.testing.assert_allclose(got, want, rtol=1e-4)


def test_broadcasting():
    mu = jnp.zeros((3, 1))
    sd = jnp.ones((1, 4))
    x = jnp.zeros(())
    assert dists.normal.logpdf(x, mu, sd).shape == (3, 4)
    key = jax.random.key(1)
    assert dists.normal.sample(key, mu, sd, shape=(7,)).shape == (7, 3, 4)


def test_gig_general_lambda_exact(rng_key):
    """General-lambda GIG via the log-concave rejection must match
    quadrature moments (the lam = +-1/2 cases route through exact
    inverse-Gaussian and are covered elsewhere)."""
    from scipy import integrate as sint

    from boom_tpu.dists.continuous import gig

    def true_moments(lam, chi, psi):
        f = lambda x: x ** (lam - 1) * np.exp(-0.5 * (chi / x + psi * x))
        z, _ = sint.quad(f, 0, np.inf, limit=400)
        m1, _ = sint.quad(lambda x: x * f(x), 0, np.inf, limit=400)
        m2, _ = sint.quad(lambda x: x * x * f(x), 0, np.inf, limit=400)
        return m1 / z, np.sqrt(m2 / z - (m1 / z) ** 2)

    n = 200000
    for i, (lam, chi, psi) in enumerate(
            [(2.3, 1.0, 2.0), (-1.7, 3.0, 0.5), (0.1, 0.2, 0.3),
             (5.0, 10.0, 0.1)]):
        x = np.asarray(gig.sample(jax.random.fold_in(rng_key, i),
                                  jnp.full((n,), lam), chi, psi))
        m, s = true_moments(lam, chi, psi)
        assert abs(x.mean() - m) / m < 0.01, (lam, chi, psi, x.mean(), m)
        assert abs(x.std() - s) / s < 0.03, (lam, chi, psi, x.std(), s)
