"""GLM spike-slab composites: probit, logit, Poisson, student, mlogit.

Reference test pattern: simulate from known truth, run the real sampler,
check coverage / sign recovery (Models/Glm/tests/*_test.cc, e.g.
logit_spike_slab_test.cc, poisson_regression_test.cc)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from boom_tpu.models.glm import (
    LogitSpikeSlab,
    MultinomialLogitSpikeSlab,
    PoissonSpikeSlab,
    ProbitSpikeSlab,
    StudentSpikeSlab,
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


def check_beta_recovery(draws_beta, true_beta, tol_mult=1.0):
    """Posterior mean close to truth; nonzero coefs have right sign."""
    post_mean = np.asarray(jnp.mean(draws_beta, (0, 1)))
    true = np.asarray(true_beta)
    nz = np.abs(true) > 1e-8
    assert np.all(np.sign(post_mean[nz]) == np.sign(true[nz])), (
        post_mean, true)
    sd = np.asarray(jnp.std(draws_beta, (0, 1)))
    err = np.abs(post_mean - true)
    # coverage-flavored: within 6 posterior sds (loose, multiple coords)
    assert np.all(err <= 6.0 * tol_mult * (sd + 0.15)), (
        post_mean, true, sd)


def test_probit_recovers_truth(rng_key):
    x, y, beta = ProbitSpikeSlab.simulate(rng_key, 600, 8, nonzero=3)
    model = ProbitSpikeSlab.from_data(x, y, expected_model_size=3.0)
    draws = run_chains(model, jax.random.key(1))
    check_beta_recovery(draws["beta"], beta)
    # spurious coords rarely included
    incl = np.asarray(jnp.mean(draws["gamma"], (0, 1)))
    assert np.all(incl[4:] < 0.5), incl


def test_logit_recovers_truth(rng_key):
    x, y, beta = LogitSpikeSlab.simulate(rng_key, 800, 8, nonzero=3)
    model = LogitSpikeSlab.from_data(x, y, expected_model_size=3.0)
    draws = run_chains(model, jax.random.key(2))
    check_beta_recovery(draws["beta"], beta)
    incl = np.asarray(jnp.mean(draws["gamma"], (0, 1)))
    assert np.all(incl[:3] > 0.5), incl


def test_logit_latent_is_logistic(rng_key):
    """Truncated-logistic imputation marginalizes back to the logit
    likelihood: E[1{z>0}] with eta fixed equals sigmoid(eta)."""
    from boom_tpu.models.glm import impute_logit_latent

    eta = jnp.array(0.7)
    keys = jax.random.split(rng_key, 20000)
    # unconditional latent: logistic(eta); sample both branches via y drawn
    # from the model then z | y: z marginal should be Logistic(eta, 1)
    ky, kz = jax.random.split(rng_key)
    y = (jax.random.uniform(ky, (20000,)) <
         jax.nn.sigmoid(eta)).astype(jnp.int32)
    z = jax.vmap(lambda k, yi: impute_logit_latent(k, eta, yi))(keys, y)
    # moments of Logistic(0.7, 1): mean 0.7, var pi^2/3
    assert abs(float(jnp.mean(z)) - 0.7) < 0.05
    assert abs(float(jnp.var(z)) - np.pi**2 / 3) < 0.15


def test_poisson_recovers_truth(rng_key):
    x, y, beta = PoissonSpikeSlab.simulate(rng_key, 800, 6, nonzero=2,
                                           beta_scale=0.7)
    model = PoissonSpikeSlab.from_data(x, y, expected_model_size=2.0)
    draws = run_chains(model, jax.random.key(3))
    check_beta_recovery(draws["beta"], beta)


def test_poisson_with_exposure(rng_key):
    kx, ky = jax.random.split(rng_key)
    n = 500
    x = jnp.ones((n, 1))
    exposure = jnp.full((n,), 7.0)
    lam = 2.0  # rate per unit exposure; intercept = log 2
    y = jax.random.poisson(ky, lam * exposure)
    model = PoissonSpikeSlab.from_data(
        x, y, exposure=exposure, expected_model_size=1.0)
    draws = run_chains(model, jax.random.key(4), n_iter=300, burn=100)
    post_mean = float(jnp.mean(draws["beta"][..., 0]))
    assert abs(post_mean - np.log(2.0)) < 0.1, post_mean


def test_student_recovers_truth(rng_key):
    x, y, beta = StudentSpikeSlab.simulate(rng_key, 500, 6, nonzero=2,
                                           nu=4.0)
    model = StudentSpikeSlab.from_data(x, y, expected_model_size=2.0)
    draws = run_chains(model, jax.random.key(5))
    check_beta_recovery(draws["beta"], beta)
    # nu stays in a sane region (truth 4)
    nu_mean = float(jnp.mean(draws["nu"]))
    assert 2.0 < nu_mean < 30.0, nu_mean


def test_student_outlier_robustness(rng_key):
    """A gross outlier should move the t fit less than its leverage."""
    kx, ke = jax.random.split(rng_key)
    n = 200
    x = jnp.stack([jnp.ones(n), jax.random.normal(kx, (n,))], 1)
    y = 2.0 * x[:, 1] + 0.5 * jax.random.normal(ke, (n,))
    y = y.at[0].set(80.0)  # gross outlier
    model = StudentSpikeSlab.from_data(x, y, expected_model_size=2.0)
    draws = run_chains(model, jax.random.key(6), n_iter=300, burn=100)
    slope = float(jnp.mean(draws["beta"][..., 1]))
    assert abs(slope - 2.0) < 0.2, slope


def test_mlogit_recovers_truth(rng_key):
    x, choice, beta = MultinomialLogitSpikeSlab.simulate(
        rng_key, 900, 5, num_classes=3, nonzero=2)
    model = MultinomialLogitSpikeSlab.from_data(
        x, choice, num_classes=3, expected_model_size=2.0)
    draws = run_chains(model, jax.random.key(7))
    post_mean = np.asarray(jnp.mean(draws["beta"], (0, 1)))
    true = np.asarray(beta)
    nz = np.abs(true) > 1e-8
    assert np.all(np.sign(post_mean[nz]) == np.sign(true[nz])), (
        post_mean, true)
    # mean absolute error modest relative to signal
    assert np.mean(np.abs(post_mean[nz] - true[nz])) < 0.6


def test_mnl_utilities_marginal(rng_key):
    """-log T for the chosen class given eta=0,K=2 should be Gumbel-ish:
    check the imputer's race construction reproduces choice probs."""
    from boom_tpu.models.glm import impute_mnl_utilities

    eta = jnp.tile(jnp.array([[0.0, 1.0]]), (20000, 1))
    kc, ku = jax.random.split(rng_key)
    choice = jax.random.categorical(kc, eta, axis=-1)
    nlt = impute_mnl_utilities(ku, eta, choice)
    # chosen utility is the max by construction
    chosen = jnp.take_along_axis(nlt, choice[:, None], 1)[:, 0]
    assert bool(jnp.all(chosen >= nlt.min(-1))), "impute shape"
    assert bool(jnp.all(
        jnp.argmax(nlt, -1) == choice)), "argmax must equal choice"
    # marginal of all utilities: mean of -log T_j ~ eta_j + euler gamma
    euler = 0.5772156649
    means = jnp.mean(nlt, 0)
    np.testing.assert_allclose(
        np.asarray(means), np.asarray(eta[0] + euler), atol=0.06)


@pytest.mark.parametrize("count,expected_kl_bound", [(1, 1e-4), (10, 1e-4)])
def test_neg_log_gamma_table_moments(count, expected_kl_bound):
    """Mixture tables reproduce the first two moments of -log Gamma(nu)."""
    from boom_tpu.models.glm.poisson import _neg_log_gamma_table
    from scipy import special as sp

    w, m, s = _neg_log_gamma_table(jnp.asarray([count]))
    w, m, s = np.asarray(w[0]), np.asarray(m[0]), np.asarray(s[0])
    mean = (w * m).sum()
    var = (w * (s**2 + m**2)).sum() - mean**2
    np.testing.assert_allclose(mean, -sp.digamma(count), atol=2e-2)
    np.testing.assert_allclose(var, sp.polygamma(1, count), rtol=4e-2)


def test_neg_log_gamma_large_count_normal():
    from boom_tpu.models.glm.poisson import _neg_log_gamma_table
    from scipy import special as sp

    w, m, s = _neg_log_gamma_table(jnp.asarray([500]))
    assert float(w[0, 0]) == 1.0
    np.testing.assert_allclose(float(m[0, 0]), -sp.digamma(500.0),
                               rtol=1e-6)
    np.testing.assert_allclose(float(s[0, 0]),
                               np.sqrt(sp.polygamma(1, 500.0)), rtol=1e-6)
