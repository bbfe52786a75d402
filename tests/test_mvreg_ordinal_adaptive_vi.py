"""Multivariate regression, ordinal regression, adaptive/BigAss
spike-slab, ADVI."""

import jax
import jax.numpy as jnp
import numpy as np

from boom_tpu.inference.vi import advi
from boom_tpu.models.glm.adaptive import (
    AdaptiveSpikeSlabRegression,
    BigAssSpikeSlab,
    screen_candidates,
)
from boom_tpu.models.glm.mvreg import MultivariateRegression
from boom_tpu.models.glm.ordinal import OrdinalLogitSpikeSlab
from boom_tpu.models.glm.regression import SpikeSlabRegression


def run_chains(model, key, n_iter=400, n_chains=2, burn=150):
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


def test_mvreg_recovers_coefficients(rng_key):
    x, y, b_true = MultivariateRegression.simulate(rng_key, 400, 3, 2)
    model = MultivariateRegression.from_data(x, y, prior_nobs=0.01)
    draws = run_chains(model, jax.random.key(1), n_iter=300, burn=100)
    b_est = np.asarray(jnp.mean(draws["B"], (0, 1)))
    np.testing.assert_allclose(b_est, np.asarray(b_true), atol=0.1)
    # residual covariance near truth (0.25 I)
    sig = np.linalg.inv(np.asarray(jnp.mean(draws["siginv"], (0, 1))))
    np.testing.assert_allclose(np.diag(sig), 0.25, atol=0.08)


def test_ordinal_logit_recovers(rng_key):
    x, y, beta, cuts = OrdinalLogitSpikeSlab.simulate(
        rng_key, 800, 5, num_levels=4, nonzero=2)
    model = OrdinalLogitSpikeSlab.from_data(
        x, y, num_levels=4, expected_model_size=2.0)
    draws = run_chains(model, jax.random.key(2), n_iter=400, burn=150)
    b = np.asarray(jnp.mean(draws["beta"], (0, 1)))
    true = np.asarray(beta)
    nz = np.abs(true) > 1e-8
    assert np.all(np.sign(b[nz]) == np.sign(true[nz])), (b, true)
    assert np.mean(np.abs(b[nz] - true[nz])) < 0.5, b
    # cutpoint recovery: spacing near truth (cuts = [0, 2, 4])
    spac = np.exp(np.asarray(jnp.mean(draws["log_spacing"], (0, 1))))
    np.testing.assert_allclose(spac, [2.0, 2.0], atol=0.8)


def test_adaptive_spike_slab(rng_key):
    x, y, beta = SpikeSlabRegression.simulate(rng_key, 500, 20,
                                              nonzero=3)
    model = AdaptiveSpikeSlabRegression.from_data(
        x, y, expected_model_size=3.0, steps_per_sweep=20)
    draws = run_chains(model, jax.random.key(3), n_iter=400, burn=150)
    incl = np.asarray(jnp.mean(draws["gamma"], (0, 1)))
    assert np.all(incl[:3] > 0.8), incl[:5]
    assert np.mean(incl[4:]) < 0.25, incl
    b = np.asarray(jnp.mean(draws["beta"], (0, 1)))
    np.testing.assert_allclose(b[:3], np.asarray(beta[:3]), atol=0.3)


def test_screen_candidates(rng_key):
    x, y, beta = SpikeSlabRegression.simulate(rng_key, 300, 100,
                                              nonzero=3)
    cand = screen_candidates(x, y, 20)
    assert cand.shape == (20,)
    # the true signals (cols 0..2) survive screening
    for j in range(3):
        assert j in np.asarray(cand), (j, cand)


def test_bigass_spike_slab(rng_key):
    x, y, beta = SpikeSlabRegression.simulate(rng_key, 400, 300,
                                              nonzero=3)
    model = BigAssSpikeSlab.from_data(x, y, max_candidates=30,
                                      expected_model_size=3.0)
    draws = run_chains(model, jax.random.key(4), n_iter=300, burn=100)
    beta_full = model.expand_beta(draws["beta"])
    b = np.asarray(jnp.mean(beta_full, (0, 1)))
    true = np.asarray(beta)
    nz = np.abs(true) > 1e-8
    np.testing.assert_allclose(b[nz], true[nz], atol=0.3)
    assert np.all(np.abs(b[~nz]) < 0.2)


def test_advi_gaussian_target(rng_key):
    target_mean = jnp.asarray([1.0, -2.0])
    target_sd = jnp.asarray([0.5, 2.0])

    def logp(z):
        return -0.5 * jnp.sum(((z - target_mean) / target_sd) ** 2)

    res = jax.jit(lambda k: advi(k, logp, jnp.zeros(2),
                                 num_steps=3000))(rng_key)
    # tolerance scales with the target sd (SGD noise on the wide coord)
    err = np.abs(np.asarray(res.mean()) - np.asarray(target_mean))
    assert np.all(err < 0.15 * np.asarray(target_sd) + 0.05), err
    np.testing.assert_allclose(np.asarray(res.sd()),
                               np.asarray(target_sd), rtol=0.2)
    # ELBO increased
    path = np.asarray(res.elbo_path)
    assert path[-100:].mean() > path[:100].mean()


def test_advi_posterior_regression(rng_key):
    """ADVI posterior for conjugate Bayesian regression matches the
    exact posterior mean."""
    k1, k2 = jax.random.split(rng_key)
    n, p = 200, 3
    x = jax.random.normal(k1, (n, p))
    beta_true = jnp.asarray([1.0, -0.5, 2.0])
    y = x @ beta_true + 0.5 * jax.random.normal(k2, (n,))

    def logp(beta):
        r = y - x @ beta
        return (-0.5 * jnp.sum(r * r) / 0.25
                - 0.5 * jnp.sum(beta * beta) / 100.0)

    res = jax.jit(lambda k: advi(k, logp, jnp.zeros(p),
                                 num_steps=2500))(jax.random.key(5))
    prec = x.T @ x / 0.25 + jnp.eye(p) / 100.0
    exact = jnp.linalg.solve(prec, x.T @ y / 0.25)
    np.testing.assert_allclose(np.asarray(res.mean()),
                               np.asarray(exact), atol=0.05)
