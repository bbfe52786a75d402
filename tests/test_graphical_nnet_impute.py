"""Graphical models (exact discrete inference), nnet, imputation."""

import jax
import jax.numpy as jnp
import numpy as np

from boom_tpu.models.graphical import DiscreteBayesNet, Node
from boom_tpu.models.impute import GaussianCopulaImputer
from boom_tpu.models.nnet import FeedForwardRegression


def sprinkler_net():
    """The classic rain/sprinkler/grass network (exact answers known)."""
    rain = Node("rain", 2, (), jnp.asarray([0.8, 0.2]))
    sprinkler = Node("sprinkler", 2, ("rain",),
                     jnp.asarray([[0.6, 0.4], [0.99, 0.01]]))
    grass = Node(
        "grass", 2, ("sprinkler", "rain"),
        jnp.asarray([[[1.0, 0.0], [0.2, 0.8]],
                     [[0.1, 0.9], [0.01, 0.99]]]))
    return DiscreteBayesNet(nodes=[rain, sprinkler, grass])


def test_bayes_net_marginal_exact():
    net = sprinkler_net()
    # P(rain | grass wet) — classic value ~ 0.3577
    p = net.marginal("rain", {"grass": 1})
    np.testing.assert_allclose(float(p[1]), 0.3577, atol=1e-3)
    # no evidence: prior
    p0 = net.marginal("rain")
    np.testing.assert_allclose(np.asarray(p0), [0.8, 0.2], atol=1e-10)


def test_bayes_net_sample_and_loglik(rng_key):
    net = sprinkler_net()
    draws = net.sample(rng_key, 20000)
    # empirical P(grass wet)
    logj = net.log_joint_tensor()
    p_wet = float(jnp.exp(
        jax.scipy.special.logsumexp(logj[:, :, 1])))
    emp = float(jnp.mean(draws[:, 2]))
    assert abs(emp - p_wet) < 0.02
    ll = net.loglik(draws[:5])
    assert ll.shape == (5,)
    assert bool(jnp.all(jnp.isfinite(ll)))


def test_bayes_net_conjugate_learning(rng_key):
    net = sprinkler_net()
    data = net.sample(rng_key, 5000)
    # learn CPTs from complete data
    learned = net.conjugate_cpt_draws(jax.random.key(1), data, prior=1.0)
    np.testing.assert_allclose(np.asarray(learned.nodes[0].cpt),
                               [0.8, 0.2], atol=0.03)
    np.testing.assert_allclose(
        np.asarray(learned.nodes[1].cpt),
        [[0.6, 0.4], [0.99, 0.01]], atol=0.05)


def test_nnet_fits_nonlinear_function(rng_key):
    k1, k2 = jax.random.split(rng_key)
    n = 300
    x = jax.random.uniform(k1, (n, 1), minval=-2.0, maxval=2.0)
    f = jnp.sin(2.0 * x[:, 0])
    y = f + 0.1 * jax.random.normal(k2, (n,))
    model = FeedForwardRegression(x=x, y=y, hidden=8)
    kernel = model.kernel()

    @jax.jit
    def run(key):
        st = model.init_state(key)

        def step(s, k):
            s = kernel(k, s)
            return s, None

        s, _ = jax.lax.scan(step, st,
                            jax.random.split(jax.random.key(1), 400))
        return s

    state = run(jax.random.key(2))
    pred = model.forward(state["weights"])
    rmse = float(jnp.sqrt(jnp.mean((pred - f) ** 2)))
    assert rmse < 0.25, rmse
    assert 0.003 < float(state["sigsq"]) < 0.1


def test_copula_imputer_recovers_correlation(rng_key):
    k1, k2, k3 = jax.random.split(rng_key, 3)
    n, d = 400, 3
    chol = jnp.linalg.cholesky(jnp.asarray(
        [[1.0, 0.8, 0.0], [0.8, 1.0, 0.3], [0.0, 0.3, 1.0]]))
    z = jax.random.normal(k1, (n, d)) @ chol.T
    y = z.at[:, 2].set(jnp.exp(z[:, 2]))  # non-Gaussian margin
    observed = jax.random.uniform(k2, (n, d)) > 0.25
    model = GaussianCopulaImputer(y=y, observed=observed)
    kernel = model.kernel()

    @jax.jit
    def run(key):
        st = model.init_state(key)

        def step(s, k):
            return kernel(k, s), None

        s, _ = jax.lax.scan(step, st,
                            jax.random.split(jax.random.key(3), 150))
        return s

    state = run(k3)
    # latent correlation should recover the copula correlation
    sigma = np.asarray(jnp.linalg.inv(state["siginv"]))
    corr = sigma / np.sqrt(np.outer(np.diag(sigma), np.diag(sigma)))
    assert abs(corr[0, 1] - 0.8) < 0.15, corr
    # imputed values are on the observed data scale
    filled = model.imputed_values(state)
    assert bool(jnp.all(jnp.isfinite(filled)))
    miss2 = ~np.asarray(observed[:, 2])
    assert np.asarray(filled)[:, 2][miss2].min() > 0.0  # lognormal scale


def test_copula_imputer_rmse_beats_mean_fill(rng_key):
    k1, k2, k3 = jax.random.split(rng_key, 3)
    n = 500
    z1 = jax.random.normal(k1, (n,))
    z2 = 0.9 * z1 + jnp.sqrt(1 - 0.81) * jax.random.normal(k2, (n,))
    y = jnp.stack([z1, z2], 1)
    observed = jnp.ones((n, 2), bool).at[:100, 1].set(False)
    model = GaussianCopulaImputer(y=y, observed=observed)
    kernel = model.kernel()
    state = model.init_state(jax.random.key(1))

    @jax.jit
    def run(state):
        def step(s, k):
            return kernel(k, s), None

        s, _ = jax.lax.scan(step, state,
                            jax.random.split(jax.random.key(2), 100))
        return s

    state = run(state)
    filled = np.asarray(model.imputed_values(state))
    truth = np.asarray(y[:100, 1])
    rmse = np.sqrt(np.mean((filled[:100, 1] - truth) ** 2))
    mean_fill_rmse = np.sqrt(np.mean(
        (np.mean(np.asarray(y[100:, 1])) - truth) ** 2))
    assert rmse < 0.7 * mean_fill_rmse, (rmse, mean_fill_rmse)
