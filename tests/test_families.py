"""Non-Gaussian bsts families: logit, Poisson, student observations.

Reference pattern: Models/StateSpace/tests/state_space_logit_test.cc,
state_space_poisson_test.cc, state_space_student_test.cc — simulate a
latent path, observe through the family, fit, check the latent path and
params are recovered."""

import jax
import jax.numpy as jnp
import numpy as np

from boom_tpu.models.glm.regression import SpikeSlabPrior
from boom_tpu.statespace import LocalLevel, SdPrior
from boom_tpu.statespace.families import NonGaussianBsts


def run(model, key, n_iter=300, n_chains=3, burn=120):
    ki, kr = jax.random.split(key)
    init = jax.vmap(model.init_state)(jax.random.split(ki, n_chains))
    kernel = model.kernel()

    @jax.jit
    def go(keys, state):
        def step(state, ks):
            new = jax.vmap(kernel)(ks, state)
            return new, new

        all_keys = jax.vmap(lambda k: jax.random.split(k, n_iter))(
            keys).swapaxes(0, 1)
        return jax.lax.scan(step, state, all_keys)

    _, draws = go(jax.random.split(kr, n_chains), init)
    return jax.tree_util.tree_map(lambda a: a[burn:], draws)


def test_logit_bsts_recovers_latent_prob(rng_key):
    k1, k2 = jax.random.split(rng_key)
    t_len = 300
    lvl = jnp.cumsum(0.15 * jax.random.normal(k1, (t_len,)))
    y = (jax.random.uniform(k2, (t_len,))
         < jax.nn.sigmoid(lvl)).astype(jnp.int32)
    model = NonGaussianBsts(
        y=y, blocks=[LocalLevel(
            sigma_prior=SdPrior(sigma_guess=0.1, upper_limit=2.0),
            initial_mean=0.0, initial_sd=2.0)],
        family="logit")
    draws = run(model, jax.random.key(1))
    est = np.asarray(jnp.mean(draws["alpha"][..., 0], (0, 1)))
    true = np.asarray(lvl)
    # latent path correlated with truth and small RMSE in prob space
    p_est = 1.0 / (1.0 + np.exp(-est))
    p_true = 1.0 / (1.0 + np.exp(-true))
    rmse = np.sqrt(np.mean((p_est - p_true) ** 2))
    assert rmse < 0.2, rmse
    assert np.corrcoef(est, true)[0, 1] > 0.6


def test_poisson_bsts_recovers_latent_rate(rng_key):
    k1, k2 = jax.random.split(rng_key)
    t_len = 300
    lvl = jnp.cumsum(0.1 * jax.random.normal(k1, (t_len,))) + 1.5
    y = jax.random.poisson(k2, jnp.exp(lvl))
    model = NonGaussianBsts(
        y=y, blocks=[LocalLevel(
            sigma_prior=SdPrior(sigma_guess=0.05, upper_limit=1.0),
            initial_mean=1.5, initial_sd=2.0)],
        family="poisson")
    draws = run(model, jax.random.key(2))
    est = np.asarray(jnp.mean(draws["alpha"][..., 0], (0, 1)))
    true = np.asarray(lvl)
    rmse = np.sqrt(np.mean((est - true) ** 2))
    assert rmse < 0.35, rmse
    assert np.corrcoef(est, true)[0, 1] > 0.8


def test_poisson_bsts_with_exposure(rng_key):
    k2 = rng_key
    t_len = 200
    exposure = jnp.full((t_len,), 20.0)
    rate = 0.5  # log rate = -0.693
    y = jax.random.poisson(k2, rate * exposure)
    model = NonGaussianBsts(
        y=y, blocks=[LocalLevel(
            sigma_prior=SdPrior(sigma_guess=0.02, upper_limit=0.3),
            initial_mean=0.0, initial_sd=2.0)],
        family="poisson", exposure=exposure)
    draws = run(model, jax.random.key(3), n_iter=250, burn=100)
    est = float(jnp.mean(draws["alpha"][..., :, 0]))
    assert abs(est - np.log(rate)) < 0.2, (est, np.log(rate))


def test_student_bsts_robust_to_outliers(rng_key):
    k1, k2 = jax.random.split(rng_key)
    t_len = 250
    lvl = jnp.cumsum(0.1 * jax.random.normal(k1, (t_len,)))
    noise = 0.3 * jax.random.t(k2, 3.0, (t_len,))
    y = lvl + noise
    model = NonGaussianBsts(
        y=y, blocks=[LocalLevel.default(y)], family="student")
    draws = run(model, jax.random.key(4))
    est = np.asarray(jnp.mean(draws["alpha"][..., 0], (0, 1)))
    rmse = np.sqrt(np.mean((est - np.asarray(lvl)) ** 2))
    assert rmse < 0.4, rmse
    nu_mean = float(jnp.mean(draws["nu"]))
    assert 1.5 < nu_mean < 30.0, nu_mean


def test_logit_bsts_with_regression(rng_key):
    k1, k2, k3 = jax.random.split(rng_key, 3)
    t_len = 400
    x = jax.random.normal(k1, (t_len, 3))
    beta = jnp.asarray([1.5, 0.0, 0.0])
    lvl = jnp.cumsum(0.05 * jax.random.normal(k2, (t_len,)))
    eta = lvl + x @ beta
    y = (jax.random.uniform(k3, (t_len,))
         < jax.nn.sigmoid(eta)).astype(jnp.int32)
    prior = SpikeSlabPrior.from_data(
        x, jnp.asarray(y, jnp.float64), expected_model_size=1.0,
        prior_information_weight=0.01)
    model = NonGaussianBsts(
        y=y, blocks=[LocalLevel(
            sigma_prior=SdPrior(sigma_guess=0.05, upper_limit=1.0),
            initial_mean=0.0, initial_sd=1.0)],
        family="logit", predictors=x, reg_prior=prior)
    draws = run(model, jax.random.key(5))
    b_est = np.asarray(jnp.mean(draws["beta"], (0, 1)))
    assert abs(b_est[0] - 1.5) < 0.5, b_est
    incl = np.asarray(jnp.mean(draws["gamma"], (0, 1)))
    assert incl[0] > 0.8, incl


def test_predict_poisson(rng_key):
    t_len = 100
    y = jax.random.poisson(rng_key, jnp.full((t_len,), 5.0))
    model = NonGaussianBsts(
        y=y, blocks=[LocalLevel(
            sigma_prior=SdPrior(sigma_guess=0.02, upper_limit=0.5),
            initial_mean=jnp.log(5.0), initial_sd=1.0)],
        family="poisson")
    state = model.init_state(jax.random.key(1))
    kern = jax.jit(model.kernel())
    for i in range(40):
        state = kern(jax.random.key(10 + i), state)
    ys = model.predict(jax.random.key(2), state, horizon=12)
    assert ys.shape == (12,)
    assert bool(jnp.all(ys >= 0))
    # forecast mean in a sane band around 5
    assert 1.0 < float(jnp.mean(jnp.asarray(ys, jnp.float64))) < 15.0
