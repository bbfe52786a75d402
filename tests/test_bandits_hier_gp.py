"""Bandits (Thompson sampling), hierarchical models, GP regression."""

import jax
import jax.numpy as jnp
import numpy as np

from boom_tpu.models.bandits import BinomialBandit, LogitBandit
from boom_tpu.models.gp import GpRegression, rbf_kernel
from boom_tpu.models.hierarchical import (
    HierarchicalGamma,
    HierarchicalGaussian,
    HierarchicalPoisson,
)


def run_chains(model, key, n_iter=400, n_chains=4, burn=150):
    ki, kr = jax.random.split(key)
    init = jax.vmap(model.init_state)(jax.random.split(ki, n_chains))
    kernel = model.kernel()

    @jax.jit
    def run(keys, state):
        def step(state, ks):
            new = jax.vmap(kernel)(ks, state)
            return new, new

        return jax.lax.scan(
            step, state,
            jax.vmap(lambda k: jax.random.split(k, n_iter))(keys).swapaxes(
                0, 1))

    _, draws = run(jax.random.split(kr, n_chains), init)
    return jax.tree_util.tree_map(lambda a: a[burn:], draws)


# -- bandits -------------------------------------------------------------------

def test_binomial_bandit_finds_best_arm(rng_key):
    bandit = BinomialBandit(num_arms=4)
    true_probs = jnp.asarray([0.2, 0.4, 0.75, 0.5])
    state, arms, rewards = jax.jit(
        lambda k: bandit.run(k, true_probs, 800))(rng_key)
    # majority of late plays should be the best arm
    late = np.asarray(arms[-300:])
    assert np.mean(late == 2) > 0.7, np.bincount(late, minlength=4)
    probs = bandit.optimal_arm_probabilities(jax.random.key(1), state)
    assert float(probs[2]) > 0.8, probs


def test_logit_bandit_learns_weights(rng_key):
    d = 3
    beta_true = jnp.asarray([1.5, -1.0, 0.5])
    bandit = LogitBandit(dim=d)
    state = bandit.init_state()
    key = rng_key
    for i in range(300):
        key, kc, ka, kr, ku = jax.random.split(key, 5)
        contexts = jax.random.normal(kc, (5, d))
        arm = bandit.draw_arm(ka, state, contexts)
        x = contexts[arm]
        p = jax.nn.sigmoid(x @ beta_true)
        reward = jnp.asarray(jax.random.uniform(kr, ()) < p, jnp.int32)
        state = jax.jit(bandit.update)(ku, state, x, reward)
    beta_hat = np.asarray(jnp.linalg.solve(state["prec"],
                                           state["prec_mean"]))
    # signs recovered and roughly proportional
    assert np.all(np.sign(beta_hat) == np.sign(np.asarray(beta_true)))
    assert abs(beta_hat[0] - 1.5) < 0.8, beta_hat


# -- hierarchical --------------------------------------------------------------

def test_hierarchical_gaussian_shrinks(rng_key):
    k1, k2 = jax.random.split(rng_key)
    g, per = 12, 20
    mu_true = 2.0 + 0.8 * jax.random.normal(k1, (g,))
    group = jnp.repeat(jnp.arange(g), per)
    y = mu_true[group] + 1.0 * jax.random.normal(k2, (g * per,))
    model = HierarchicalGaussian(y=y, group=group, num_groups=g)
    draws = run_chains(model, jax.random.key(1))
    mu_est = np.asarray(jnp.mean(draws["mu"], (0, 1)))
    raw = np.asarray(jax.ops.segment_sum(y, group, g) / per)
    # posterior means closer to truth than raw group means on average
    err_post = np.mean((mu_est - np.asarray(mu_true)) ** 2)
    err_raw = np.mean((raw - np.asarray(mu_true)) ** 2)
    assert err_post <= err_raw * 1.1, (err_post, err_raw)
    assert abs(float(jnp.mean(draws["mu0"])) - 2.0) < 0.5
    assert abs(float(jnp.mean(draws["sigsq"])) - 1.0) < 0.2


def test_hierarchical_poisson_recovers(rng_key):
    k1, k2 = jax.random.split(rng_key)
    g = 30
    lam_true = jax.random.gamma(k1, 4.0, (g,)) / 2.0  # Gamma(4, 2): mean 2
    exposure = jnp.full((g,), 50.0)
    events = jax.random.poisson(k2, lam_true * exposure)
    model = HierarchicalPoisson(events=events, exposure=exposure)
    draws = run_chains(model, jax.random.key(2))
    lam_est = np.asarray(jnp.mean(draws["lam"], (0, 1)))
    # per-group posterior sd ~ sqrt(lam/exposure); allow 4 sd
    tol = 4.0 * np.sqrt(np.asarray(lam_true) / 50.0) + 0.05
    assert np.all(np.abs(lam_est - np.asarray(lam_true)) < tol), (
        lam_est, lam_true)
    a_mean = float(jnp.mean(draws["a"]))
    b_mean = float(jnp.mean(draws["b"]))
    assert abs(a_mean / b_mean - 2.0) < 0.5, (a_mean, b_mean)


def test_hierarchical_gamma_runs(rng_key):
    k1, k2 = jax.random.split(rng_key)
    g, per = 8, 50
    mu_true = jnp.asarray([0.5, 1.0, 1.5, 2.0, 2.5, 3.0, 3.5, 4.0])
    nu_true = 3.0
    group = jnp.repeat(jnp.arange(g), per)
    y = jax.random.gamma(k2, nu_true, (g * per,)) * mu_true[group] / nu_true
    model = HierarchicalGamma(y=y, group=group, num_groups=g)
    draws = run_chains(model, jax.random.key(3))
    mu_est = np.asarray(jnp.mean(draws["mu"], (0, 1)))
    np.testing.assert_allclose(mu_est, np.asarray(mu_true), rtol=0.25)
    nu_est = float(jnp.mean(draws["nu"]))
    assert 2.0 < nu_est < 4.5, nu_est


# -- GP ------------------------------------------------------------------------

def test_gp_marginal_loglik_matches_direct(rng_key):
    k1, k2 = jax.random.split(rng_key)
    n = 30
    x = jax.random.normal(k1, (n, 1))
    y = jax.random.normal(k2, (n,))
    model = GpRegression(x=x, y=y)
    la, ll, ls = 0.3, -0.2, -0.5
    ours = float(model.marginal_loglik(la, ll, ls))
    k = np.array(rbf_kernel(x, x, np.exp(la), np.exp(ll)))
    k = k + (np.exp(2 * ls) + 1e-8) * np.eye(n)
    sign, logdet = np.linalg.slogdet(k)
    direct = float(-0.5 * np.asarray(y) @ np.linalg.solve(k, np.asarray(y))
                   - 0.5 * logdet - 0.5 * n * np.log(2 * np.pi))
    np.testing.assert_allclose(ours, direct, rtol=1e-8)


def test_gp_recovers_function(rng_key):
    k1, k2 = jax.random.split(rng_key)
    n = 80
    x = jnp.sort(jax.random.uniform(k1, (n, 1), minval=-3.0, maxval=3.0),
                 axis=0)
    f = jnp.sin(2.0 * x[:, 0])
    y = f + 0.1 * jax.random.normal(k2, (n,))
    model = GpRegression(x=x, y=y)
    draws = run_chains(model, jax.random.key(1), n_iter=200, burn=100,
                       n_chains=2)
    state = {k: jnp.mean(v) for k, v in draws.items()}
    mean, cov = model.posterior_mean_cov(state, x)
    rmse = float(jnp.sqrt(jnp.mean((mean - f) ** 2)))
    assert rmse < 0.1, rmse
    # learned noise close to 0.1
    assert abs(float(jnp.exp(state["log_sigma"])) - 0.1) < 0.07
