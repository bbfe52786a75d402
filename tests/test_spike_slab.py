"""Config #2 (BASELINE.md): Gaussian spike-and-slab regression.

Mirrors the reference's regression_spike_slab_test.cc:21-90: simulate
sparse truth, run the real sampler, check inclusion probabilities and
coefficient coverage. Adds an exact-enumeration check of the marginal
model probabilities on a tiny problem (stronger than the reference's
coverage-only test)."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from boom_tpu import testing
from boom_tpu.inference import rhat, run_mcmc
from boom_tpu.models.glm import (
    RegSuf,
    SpikeSlabPrior,
    SpikeSlabRegression,
    log_model_prob,
)


def test_log_model_prob_normalizes_against_enumeration(rng_key):
    """Gibbs one-flip conditionals derived from log_model_prob must match
    exact enumeration of all 2^p models on a small problem."""
    n, p = 50, 4
    x, y, beta = SpikeSlabRegression.simulate(rng_key, n, p, nonzero=2,
                                              sigma=0.5)
    model = SpikeSlabRegression.from_data(x, y, expected_model_size=2.0)

    masks = jnp.asarray(list(itertools.product([False, True], repeat=p)))
    logps = jax.vmap(lambda m: log_model_prob(model.suf, model.prior, m))(
        masks)
    logps = np.asarray(logps)
    w = np.exp(logps - logps.max())
    w /= w.sum()
    # exact marginal inclusion probabilities
    want_incl = (np.asarray(masks) * w[:, None]).sum(0)

    res = run_mcmc(jax.random.key(3), model.kernel(), model.init_state,
                   num_draws=3000, num_chains=4, burn=300,
                   extract=lambda s: s["gamma"])
    got_incl = np.asarray(res.draws).reshape(-1, p).mean(0)
    np.testing.assert_allclose(got_incl, want_incl, atol=0.03)


def test_spike_slab_recovers_sparse_truth(rng_key):
    n, p, k = 500, 20, 4
    x, y, beta_true = SpikeSlabRegression.simulate(rng_key, n, p, nonzero=k,
                                                   sigma=1.0)
    model = SpikeSlabRegression.from_data(x, y, expected_model_size=5.0)
    res = run_mcmc(jax.random.key(4), model.kernel(), model.init_state,
                   num_draws=1500, num_chains=4, burn=300,
                   extract=lambda s: {"gamma": s["gamma"],
                                      "beta": s["beta"],
                                      "sigsq": s["sigsq"]})
    gamma = np.asarray(res.draws["gamma"]).reshape(-1, p)
    beta = np.asarray(res.draws["beta"]).reshape(-1, p)
    sigsq = np.asarray(res.draws["sigsq"])

    # true nonzero coefficients found, zeros excluded
    incl = gamma.mean(0)
    true_nonzero = np.abs(np.asarray(beta_true)) > 0
    assert (incl[true_nonzero] > 0.9).all(), incl
    assert (incl[~true_nonzero] < 0.5).all(), incl

    assert testing.check_mcmc_matrix(beta, np.asarray(beta_true))
    assert testing.check_mcmc_vector(sigsq, 1.0)
    assert float(rhat(jnp.asarray(res.draws["sigsq"]))) < 1.1


def test_regsuf_combine_matches_full():
    key = jax.random.key(0)
    x, y, _ = SpikeSlabRegression.simulate(key, 100, 5, 2)
    full = RegSuf.from_data(x, y)
    a = RegSuf.from_data(x[:60], y[:60])
    b = RegSuf.from_data(x[60:], y[60:])
    comb = a.combine(b)
    for f, c in zip(full, comb):
        np.testing.assert_allclose(np.asarray(f), np.asarray(c), rtol=1e-10)


def test_empty_and_full_model_logprob_finite(rng_key):
    x, y, _ = SpikeSlabRegression.simulate(rng_key, 30, 3, 1)
    model = SpikeSlabRegression.from_data(x, y)
    lp0 = float(log_model_prob(model.suf, model.prior,
                               jnp.zeros(3, bool)))
    lp1 = float(log_model_prob(model.suf, model.prior, jnp.ones(3, bool)))
    assert np.isfinite(lp0) and np.isfinite(lp1)
