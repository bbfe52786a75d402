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


def test_beta_binomial_mixture_recovers(rng_key):
    from boom_tpu.models.mixtures import BetaBinomialMixture
    from boom_tpu import dists
    import numpy as np

    k1, k2, k3 = jax.random.split(rng_key, 3)
    n = 600
    trials = jnp.full((n,), 50)
    z = jax.random.bernoulli(k1, 0.5, (n,)).astype(jnp.int32)
    probs = jnp.where(z == 0,
                      dists.beta.sample(k2, 20.0, 80.0, shape=(n,)),
                      dists.beta.sample(k3, 60.0, 20.0, shape=(n,)))
    successes = jax.random.binomial(jax.random.key(4), trials, probs)
    model = BetaBinomialMixture(trials=trials, successes=successes,
                                num_components=2)
    kernel = model.kernel()

    @jax.jit
    def run(key):
        st = model.init_state(key)

        def step(s, k):
            s = kernel(k, s)
            return s, s

        return jax.lax.scan(step, st,
                            jax.random.split(jax.random.key(5), 400))

    _, draws = run(jax.random.key(6))
    means = np.sort(np.asarray(
        jax.nn.sigmoid(jnp.mean(draws["log_odds"][200:], 0))))
    np.testing.assert_allclose(means, [0.2, 0.75], atol=0.05)
    w = np.asarray(jnp.mean(draws["weights"][200:], 0))
    np.testing.assert_allclose(np.sort(w), [0.5, 0.5], atol=0.08)


def test_regression_mixture_recovers(rng_key):
    from boom_tpu.models.mixtures import RegressionMixture
    import numpy as np

    k1, k2, k3 = jax.random.split(rng_key, 3)
    n = 800
    x = jnp.stack([jnp.ones(n), jax.random.normal(k1, (n,))], 1)
    z = jax.random.bernoulli(k2, 0.5, (n,))
    beta0 = jnp.asarray([2.0, 1.0])
    beta1 = jnp.asarray([-2.0, -1.0])
    mean = jnp.where(z, x @ beta1, x @ beta0)
    y = mean + 0.4 * jax.random.normal(k3, (n,))
    model = RegressionMixture(x=x, y=y, num_components=2)
    kernel = model.kernel()

    @jax.jit
    def run(key):
        st = model.init_state(key)

        def step(s, k):
            s = kernel(k, s)
            return s, s

        return jax.lax.scan(step, st,
                            jax.random.split(jax.random.key(1), 400))

    _, draws = run(jax.random.key(2))
    beta_mean = np.asarray(jnp.mean(draws["beta"][200:], 0))  # [K, p]
    order = np.argsort(beta_mean[:, 0])
    np.testing.assert_allclose(beta_mean[order],
                               [[-2.0, -1.0], [2.0, 1.0]], atol=0.15)
    sig = np.asarray(jnp.mean(jnp.sqrt(draws["sigsq"][200:]), 0))
    np.testing.assert_allclose(sig, 0.4, atol=0.1)
