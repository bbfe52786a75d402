"""Markov model, zero-inflated models, transforms, numopt."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats as sps

from boom_tpu.inference.transforms import (
    check_jacobian,
    interval_transform,
    log_transform,
    mlogit_transform,
    simplex_transform,
    softplus_transform,
    transformed_log_target,
)
from boom_tpu.models.markov import (
    MarkovModel,
    markov_loglik,
    stationary_distribution,
    transition_counts,
)
from boom_tpu.models.zero_inflated import (
    ZeroInflatedGamma,
    ZeroInflatedLognormal,
    ZeroInflatedPoisson,
)
from boom_tpu import numopt


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


# -- Markov -------------------------------------------------------------------

def test_markov_recovers_transition_matrix(rng_key):
    trans = jnp.asarray([[0.9, 0.1], [0.3, 0.7]])
    z = MarkovModel.simulate(rng_key, 2000, trans, jnp.asarray([0.5, 0.5]))
    model = MarkovModel(z=z, num_states=2)
    draws = run_chains(model, jax.random.key(1), n_iter=200, burn=50)
    est = np.asarray(jnp.mean(draws["trans"], (0, 1)))
    np.testing.assert_allclose(est, np.asarray(trans), atol=0.05)


def test_stationary_distribution():
    trans = jnp.asarray([[0.9, 0.1], [0.3, 0.7]])
    pi = stationary_distribution(trans)
    # solve exactly: pi = pi P
    np.testing.assert_allclose(np.asarray(pi), [0.75, 0.25], atol=1e-6)


def test_markov_loglik_matches_manual(rng_key):
    trans = jnp.asarray([[0.8, 0.2], [0.4, 0.6]])
    init = jnp.asarray([0.6, 0.4])
    z = jnp.asarray([0, 0, 1, 1, 0])
    ll = float(markov_loglik(z, trans, init))
    manual = np.log(0.6) + np.log(0.8) + np.log(0.2) + np.log(
        0.6) + np.log(0.4)
    np.testing.assert_allclose(ll, manual, rtol=1e-6)


# -- zero-inflated -------------------------------------------------------------

def test_zip_recovers_params(rng_key):
    y = ZeroInflatedPoisson.simulate(rng_key, 2000, p=0.6, lam=3.0)
    model = ZeroInflatedPoisson(y=y)
    draws = run_chains(model, jax.random.key(2))
    p_est = float(jnp.mean(draws["p"]))
    lam_est = float(jnp.mean(draws["lam"]))
    assert abs(p_est - 0.6) < 0.06, p_est
    assert abs(lam_est - 3.0) < 0.3, lam_est


def test_zi_lognormal_recovers(rng_key):
    k1, k2, k3 = jax.random.split(rng_key, 3)
    n = 1500
    active = jax.random.uniform(k1, (n,)) < 0.7
    vals = jnp.exp(1.0 + 0.5 * jax.random.normal(k2, (n,)))
    y = jnp.where(active, vals, 0.0)
    model = ZeroInflatedLognormal(y=y)
    draws = run_chains(model, jax.random.key(3), n_iter=300, burn=100)
    assert abs(float(jnp.mean(draws["p"])) - 0.7) < 0.05
    assert abs(float(jnp.mean(draws["mu"])) - 1.0) < 0.1
    assert abs(float(jnp.mean(jnp.sqrt(draws["sigsq"]))) - 0.5) < 0.07


def test_zi_gamma_recovers(rng_key):
    k1, k2 = jax.random.split(rng_key)
    n = 1500
    active = jax.random.uniform(k1, (n,)) < 0.5
    vals = jax.random.gamma(k2, 3.0, (n,)) / 2.0  # Gamma(3, rate 2)
    y = jnp.where(active, vals, 0.0)
    model = ZeroInflatedGamma(y=y)
    draws = run_chains(model, jax.random.key(4), n_iter=300, burn=100)
    assert abs(float(jnp.mean(draws["p"])) - 0.5) < 0.05
    shape_est = float(jnp.mean(draws["shape"]))
    rate_est = float(jnp.mean(draws["rate"]))
    # mean = shape/rate should match 1.5 closely even if shape/rate
    # individually are softer
    assert abs(shape_est / rate_est - 1.5) < 0.15
    assert abs(shape_est - 3.0) < 1.0


# -- transforms ----------------------------------------------------------------

@pytest.mark.parametrize("t,u", [
    (log_transform, jnp.asarray([0.3, -1.2])),
    (softplus_transform, jnp.asarray([0.5, -0.7])),
    (interval_transform(-2.0, 5.0), jnp.asarray([0.9, -0.4])),
])
def test_transform_jacobians(t, u):
    assert float(check_jacobian(t, u)) < 1e-6
    np.testing.assert_allclose(np.asarray(t.inverse(t.forward(u))),
                               np.asarray(u), atol=1e-6)


def test_simplex_transform_roundtrip():
    t = simplex_transform(4)
    u = jnp.asarray([0.3, -0.5, 1.1])
    x = t.forward(u)
    np.testing.assert_allclose(float(jnp.sum(x)), 1.0, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(t.inverse(x)), np.asarray(u),
                               atol=1e-8)
    assert float(check_jacobian(t, u)) < 1e-5


def test_mlogit_transform_roundtrip():
    t = mlogit_transform(3)
    u = jnp.asarray([0.7, -0.2])
    x = t.forward(u)
    np.testing.assert_allclose(float(jnp.sum(x)), 1.0, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(t.inverse(x)), np.asarray(u),
                               atol=1e-8)


def test_transformed_target_samples_gamma(rng_key):
    """Slice-sample a Gamma(3, 2) on the log scale via the transform
    plumbing; check the moments."""
    from boom_tpu.inference.kernels.slice import slice_step
    from boom_tpu import dists

    logp = transformed_log_target(
        log_transform, lambda x: dists.gamma.logpdf(x, 3.0, 2.0))

    def step(u, k):
        return slice_step(k, u, logp, width=1.0), None

    u0 = jnp.zeros(())
    us, _ = jax.lax.scan(step, u0, jax.random.split(rng_key, 4000))
    # scan carries the last value; rerun collecting draws
    def step2(u, k):
        u = slice_step(k, u, logp, width=1.0)
        return u, u

    _, us = jax.lax.scan(step2, u0, jax.random.split(rng_key, 4000))
    xs = np.exp(np.asarray(us[500:]))
    np.testing.assert_allclose(xs.mean(), 1.5, atol=0.1)
    np.testing.assert_allclose(xs.var(), 0.75, atol=0.15)


# -- numopt --------------------------------------------------------------------

def test_bfgs_rosenbrock():
    def rosen(x):
        return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2
                       + (1.0 - x[:-1]) ** 2)

    res = jax.jit(lambda: numopt.bfgs(rosen, jnp.zeros(4)))()
    np.testing.assert_allclose(np.asarray(res.x), 1.0, atol=1e-4)


def test_newton_quadratic():
    a = jnp.asarray([[3.0, 1.0], [1.0, 2.0]])
    b = jnp.asarray([1.0, -1.0])

    def f(x):
        return 0.5 * x @ a @ x - b @ x

    res = numopt.newton_raphson(f, jnp.zeros(2))
    np.testing.assert_allclose(np.asarray(res.x),
                               np.linalg.solve(np.asarray(a),
                                               np.asarray(b)), atol=1e-8)


def test_nelder_mead():
    def f(x):
        return jnp.sum((x - jnp.asarray([2.0, -3.0])) ** 2)

    res = numopt.nelder_mead(f, jnp.zeros(2))
    np.testing.assert_allclose(np.asarray(res.x), [2.0, -3.0], atol=1e-3)


def test_brent_scalar():
    res = numopt.brent_minimize(lambda x: (x - 1.7) ** 2 + 0.5, 0.0, 5.0)
    np.testing.assert_allclose(float(res.x), 1.7, atol=1e-6)


def test_integrate_normal_density():
    val = numopt.integrate(
        lambda x: jnp.exp(-0.5 * x * x) / jnp.sqrt(2 * jnp.pi),
        -8.0, 8.0)
    np.testing.assert_allclose(float(val), 1.0, rtol=1e-10)


def test_laplace_approximation_gamma():
    """Laplace approx of a Gamma(5, 1) integrand on the log scale should
    approximate log Gamma(5) = log 4!."""
    a = 5.0

    def logf(u):
        # integrand x^{a-1} e^{-x}, x = e^u, with Jacobian e^u
        return a * u - jnp.exp(u)

    mode, cov, log_integral = numopt.laplace_approximation(
        logf, jnp.log(jnp.asarray(a)))
    exact = float(jax.scipy.special.gammaln(a))
    assert abs(float(log_integral) - exact) < 0.02, (
        float(log_integral), exact)
