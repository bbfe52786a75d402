"""Config #3 (BASELINE.md): finite Gaussian mixture, data-augmentation
Gibbs. Reference test style: Models/Mixtures/tests."""

import jax
import jax.numpy as jnp
import numpy as np

from boom_tpu import testing
from boom_tpu.inference import run_mcmc
from boom_tpu.models.mixtures import GaussianMixtureModel, relabel_sorted


def test_mixture_recovers_components(rng_key):
    true_w = [0.35, 0.4, 0.25]
    true_mu = [-3.0, 0.5, 4.0]
    true_sd = [0.7, 0.5, 1.0]
    y, _ = GaussianMixtureModel.simulate(rng_key, 1500, true_w, true_mu,
                                         true_sd)
    model = GaussianMixtureModel(y=y, num_components=3)
    res = run_mcmc(jax.random.key(11), model.kernel(), model.init_state,
                   num_draws=1500, num_chains=4, burn=500,
                   extract=lambda s: s)
    mu, sigsq, w = relabel_sorted(res.draws["mu"], res.draws["sigsq"],
                                  res.draws["weights"])
    mu = np.asarray(mu).reshape(-1, 3)
    sd = np.sqrt(np.asarray(sigsq).reshape(-1, 3))
    w = np.asarray(w).reshape(-1, 3)
    assert testing.check_mcmc_matrix(mu, true_mu, confidence=0.98)
    assert testing.check_mcmc_matrix(sd, true_sd, confidence=0.98)
    assert testing.check_mcmc_matrix(w, true_w, confidence=0.98)


def test_mixture_loglik_increases_from_random(rng_key):
    y, _ = GaussianMixtureModel.simulate(rng_key, 500, [0.5, 0.5],
                                         [-2.0, 2.0], [1.0, 1.0])
    model = GaussianMixtureModel(y=y, num_components=2)
    state0 = model.init_state(jax.random.key(0))
    ll0 = float(model.log_lik(state0))
    res = run_mcmc(jax.random.key(1), model.kernel(),
                   lambda k: model.init_state(k), num_draws=200,
                   num_chains=2, burn=200, extract=lambda s: s)
    final = jax.tree_util.tree_map(lambda a: a[0, -1], res.draws)
    ll1 = float(model.log_lik(final))
    assert ll1 > ll0
