"""Discrete distribution tests against scipy (reference Bmath discrete
families and Models/BetaBinomialModel.hpp)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as sps

from boom_tpu import dists

DISC_CASES = [
    (dists.binomial, sps.binom(20, 0.3), (20.0, 0.3)),
    (dists.poisson, sps.poisson(4.5), (4.5,)),
    (dists.neg_binomial, sps.nbinom(3.0, 0.4), (3.0, 0.4)),
    (dists.geometric, sps.geom(0.3, loc=-1), (0.3,)),
]


@pytest.mark.parametrize("ours,ref,args", DISC_CASES,
                         ids=["binom", "pois", "nbinom", "geom"])
def test_logpmf_cdf(ours, ref, args):
    x = jnp.arange(0.0, 15.0)
    got = np.asarray(ours.logpmf(x, *args))
    want = ref.logpmf(np.asarray(x, int))
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-12)
    got_cdf = np.asarray(ours.cdf(x, *args))
    want_cdf = ref.cdf(np.asarray(x, int))
    np.testing.assert_allclose(got_cdf, want_cdf, rtol=1e-7)


@pytest.mark.parametrize("ours,ref,args", DISC_CASES,
                         ids=["binom", "pois", "nbinom", "geom"])
def test_quantile(ours, ref, args):
    p = jnp.asarray([0.01, 0.1, 0.5, 0.9, 0.99])
    got = np.asarray(ours.quantile(p, *args))
    want = ref.ppf(np.asarray(p))
    np.testing.assert_allclose(got, want)


@pytest.mark.parametrize("ours,ref,args", DISC_CASES,
                         ids=["binom", "pois", "nbinom", "geom"])
def test_sample_matches_pmf(ours, ref, args, rng_key):
    n = 100_000
    draws = np.asarray(ours.sample(rng_key, *args, shape=(n,)))
    mean, var = ref.stats("mv")
    se = np.sqrt(var / n)
    assert abs(draws.mean() - mean) < 6 * se
    assert abs(draws.var() / var - 1) < 0.05


def test_non_integer_masked():
    assert np.isneginf(float(dists.poisson.logpmf(jnp.asarray(2.5), 3.0)))
    assert np.isneginf(float(dists.binomial.logpmf(jnp.asarray(25.0), 20.0, 0.3)))


def test_beta_binomial(rng_key):
    n, a, b = 10.0, 2.0, 3.0
    x = jnp.arange(0.0, 11.0)
    got = np.asarray(dists.beta_binomial.pmf(x, n, a, b))
    want = sps.betabinom(10, a, b).pmf(np.arange(11))
    np.testing.assert_allclose(got, want, rtol=1e-9)
    draws = np.asarray(dists.beta_binomial.sample(rng_key, n, a, b,
                                                  shape=(100_000,)))
    mean = sps.betabinom(10, a, b).mean()
    assert abs(draws.mean() - mean) < 0.05


def test_hypergeometric():
    got = np.asarray(dists.hypergeometric.logpmf(
        jnp.arange(0.0, 6.0), 7.0, 6.0, 5.0))
    want = sps.hypergeom(13, 7, 5).logpmf(np.arange(6))
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_categorical(rng_key):
    logits = jnp.log(jnp.asarray([0.2, 0.5, 0.3]))
    draws = np.asarray(dists.categorical.sample(rng_key, logits, shape=(50_000,)))
    freq = np.bincount(draws, minlength=3) / 50_000
    np.testing.assert_allclose(freq, [0.2, 0.5, 0.3], atol=0.01)
    lp = np.asarray(dists.categorical.logpmf(jnp.asarray([0, 1, 2]), logits))
    np.testing.assert_allclose(lp, np.log([0.2, 0.5, 0.3]), rtol=1e-9)


def test_multinomial(rng_key):
    probs = jnp.asarray([0.2, 0.5, 0.3])
    draws = np.asarray(dists.multinomial.sample(rng_key, 50, probs,
                                                shape=(20_000,)))
    assert draws.shape == (20_000, 3)
    np.testing.assert_allclose(draws.sum(-1), 50.0)
    np.testing.assert_allclose(draws.mean(0), 50 * np.asarray(probs),
                               rtol=0.02)
    lp = float(dists.multinomial.logpmf(
        jnp.asarray([10.0, 25.0, 15.0]), 50.0, probs))
    want = sps.multinomial(50, np.asarray(probs)).logpmf([10, 25, 15])
    np.testing.assert_allclose(lp, want, rtol=1e-9)


def test_discrete_uniform(rng_key):
    draws = np.asarray(dists.discrete_uniform.sample(
        rng_key, 2.0, 7.0, shape=(50_000,)))
    assert draws.min() == 2.0 and draws.max() == 7.0
    np.testing.assert_allclose(
        np.bincount(draws.astype(int))[2:], 50_000 / 6, rtol=0.05)
