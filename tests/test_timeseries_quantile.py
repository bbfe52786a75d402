"""Time-series models (AR, ARMA, AR1) and quantile regression."""

import jax
import jax.numpy as jnp
import numpy as np

from boom_tpu.models.glm.quantile import QuantileSpikeSlab
from boom_tpu.models.timeseries import (
    ArmaModel,
    ArModel,
    NonzeroMeanAr1,
    arma_loglik,
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


def test_ar_recovers_coefficients(rng_key):
    y = ArModel.simulate(rng_key, 1500, [0.6, -0.3], sigma=1.0)
    model = ArModel(y=y, lags=2)
    draws = run_chains(model, jax.random.key(1), n_iter=300, burn=100)
    phi = np.asarray(jnp.mean(draws["phi"], (0, 1)))
    np.testing.assert_allclose(phi, [0.6, -0.3], atol=0.07)
    sig = float(jnp.mean(jnp.sqrt(draws["sigsq"])))
    assert abs(sig - 1.0) < 0.1


def test_ar_spike_slab_prunes(rng_key):
    y = ArModel.simulate(rng_key, 2000, [0.7, 0.0, 0.0, 0.0], sigma=1.0)
    model = ArModel(y=y, lags=4, spike_slab=True,
                    expected_model_size=1.0)
    draws = run_chains(model, jax.random.key(2), n_iter=300, burn=100)
    incl = np.asarray(jnp.mean(draws["gamma"], (0, 1)))
    assert incl[0] > 0.9, incl
    assert np.all(incl[2:] < 0.4), incl
    phi1 = float(jnp.mean(draws["phi"][..., 0]))
    assert abs(phi1 - 0.7) < 0.07


def test_arma_loglik_matches_ar1_closed_form(rng_key):
    """ARMA(1,0) likelihood == stationary AR(1) exact likelihood."""
    phi = 0.6
    sig = 1.2
    y = ArModel.simulate(rng_key, 200, [phi], sigma=sig)
    ours = float(arma_loglik(y, jnp.asarray([phi]), jnp.zeros((0,)),
                             sig**2))
    # closed form: y1 ~ N(0, sig^2/(1-phi^2)); y_t | y_{t-1} ~ N(phi y, sig^2)
    v1 = sig**2 / (1 - phi**2)
    ll = -0.5 * (np.log(2 * np.pi * v1) + float(y[0]) ** 2 / v1)
    resid = np.asarray(y[1:]) - phi * np.asarray(y[:-1])
    ll += np.sum(-0.5 * (np.log(2 * np.pi * sig**2) + resid**2 / sig**2))
    np.testing.assert_allclose(ours, ll, rtol=1e-6)


def test_arma_mle(rng_key):
    y = ArmaModel.simulate(rng_key, 1200, [0.5], [0.4], sigma=1.0)
    model = ArmaModel(y=y, p=1, q=1)
    res = jax.jit(model.mle)()
    phi = float(res.x["phi"][0])
    theta = float(res.x["theta"][0])
    assert abs(phi - 0.5) < 0.12, (phi, theta)
    assert abs(theta - 0.4) < 0.15, (phi, theta)


def test_arma_mcmc_runs(rng_key):
    y = ArmaModel.simulate(rng_key, 600, [0.5], [0.3], sigma=1.0)
    model = ArmaModel(y=y, p=1, q=1)
    draws = run_chains(model, jax.random.key(3), n_iter=800, burn=400,
                       n_chains=2)
    phi = float(jnp.mean(draws["phi"]))
    assert abs(phi - 0.5) < 0.25, phi


def test_nonzero_mean_ar1(rng_key):
    mu, phi, sig = 5.0, 0.7, 0.8
    eps = sig * jax.random.normal(rng_key, (2000,))

    def step(prev, e):
        y = mu + phi * (prev - mu) + e
        return y, y

    _, y = jax.lax.scan(step, jnp.asarray(mu), eps)
    model = NonzeroMeanAr1(y=y)
    draws = run_chains(model, jax.random.key(4), n_iter=300, burn=100)
    assert abs(float(jnp.mean(draws["mu"])) - mu) < 0.3
    assert abs(float(jnp.mean(draws["phi"])) - phi) < 0.05
    assert abs(float(jnp.mean(jnp.sqrt(draws["sigsq"]))) - sig) < 0.05


def test_quantile_regression_median(rng_key):
    x, y, beta = QuantileSpikeSlab.simulate(rng_key, 800, 6, nonzero=2,
                                            tau=0.5)
    model = QuantileSpikeSlab.from_data(x, y, tau=0.5,
                                        expected_model_size=2.0)
    draws = run_chains(model, jax.random.key(5), n_iter=400, burn=150)
    b = np.asarray(jnp.mean(draws["beta"], (0, 1)))
    nz = np.abs(np.asarray(beta)) > 1e-8
    np.testing.assert_allclose(b[nz], np.asarray(beta)[nz], atol=0.25)
    assert np.all(np.abs(b[~nz][1:]) < 0.15)


def test_quantile_regression_tau90(rng_key):
    """tau=0.9: intercept should hit the 90th percentile of the noise."""
    k1, k2 = jax.random.split(rng_key)
    n = 2000
    x = jnp.ones((n, 1))
    y = 1.0 * jax.random.normal(k2, (n,))
    model = QuantileSpikeSlab.from_data(x, y, tau=0.9,
                                        expected_model_size=1.0)
    draws = run_chains(model, jax.random.key(6), n_iter=400, burn=150)
    q90 = float(jnp.mean(draws["beta"][..., 0]))
    from scipy import stats as sps

    assert abs(q90 - sps.norm.ppf(0.9)) < 0.12, q90
