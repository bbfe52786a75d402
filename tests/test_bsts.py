"""Config #5 (BASELINE.md): bsts local-linear-trend + seasonal +
spike-slab regression with the Kalman simulation smoother.

Mirrors the reference's StateSpaceTestFramework pattern
(Models/StateSpace/tests): simulate from known components, fit the full
Gibbs program, check component recovery and posterior coverage."""

import jax
import jax.numpy as jnp
import numpy as np

from boom_tpu import testing
from boom_tpu.inference import run_mcmc
from boom_tpu.models.glm import SpikeSlabPrior
from boom_tpu.statespace import (
    ArState,
    Bsts,
    LocalLevel,
    LocalLinearTrend,
    Seasonal,
)
from boom_tpu.statespace.state_models import _jury_stationary


def test_jury_stationarity_test():
    rng = np.random.default_rng(0)
    for _ in range(200):
        p = rng.integers(1, 5)
        phi = rng.normal(size=p) * 0.7
        # stationarity via companion roots
        comp = np.zeros((p, p))
        comp[0] = phi
        if p > 1:
            comp[1:, :-1] = np.eye(p - 1)
        want = bool(np.all(np.abs(np.linalg.eigvals(comp)) < 1.0))
        got = bool(_jury_stationary(jnp.asarray(phi)))
        assert got == want, (phi, got, want)


def _simulate_llt_seasonal(key, t_len=300, nseasons=4):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    slope = 0.05
    level = 2.0 + slope * jnp.arange(t_len) \
        + 0.3 * jnp.cumsum(jax.random.normal(k1, (t_len,)))
    pattern = jnp.asarray([1.5, -0.5, -1.2, 0.2])
    seas = jnp.tile(pattern, t_len // nseasons + 1)[:t_len]
    noise = 0.5 * jax.random.normal(k2, (t_len,))
    return level + seas + noise, level, seas


def test_bsts_local_level_recovers_level(rng_key):
    t_len = 250
    k1, k2 = jax.random.split(rng_key)
    true_level = jnp.cumsum(0.4 * jax.random.normal(k1, (t_len,))) + 3.0
    y = true_level + 0.6 * jax.random.normal(k2, (t_len,))
    model = Bsts(y=y, blocks=[LocalLevel.default(y)])
    res = run_mcmc(jax.random.key(31), model.kernel(), model.init_state,
                   num_draws=800, num_chains=4, burn=300,
                   extract=lambda s: {
                       "level": s["alpha"][:, 0],
                       "sigsq_obs": s["sigsq_obs"],
                       "sigma_level_sq": s["blocks"]["local_level"][
                           "sigma_level_sq"]})
    level_draws = np.asarray(res.draws["level"]).reshape(-1, t_len)
    assert testing.check_stochastic_process(level_draws,
                                            np.asarray(true_level))
    assert testing.check_mcmc_vector(
        np.asarray(res.draws["sigsq_obs"]), 0.36, confidence=0.98)
    assert testing.check_mcmc_vector(
        np.asarray(res.draws["sigma_level_sq"]), 0.16, confidence=0.98)


def test_bsts_llt_seasonal_regression_full(rng_key):
    """The full config #5: LLT + seasonal + spike-slab regression."""
    t_len, p = 300, 8
    k1, k2, k3 = jax.random.split(rng_key, 3)
    y_ts, level, seas = _simulate_llt_seasonal(k1, t_len)
    x = jax.random.normal(k2, (t_len, p))
    beta_true = jnp.zeros(p).at[0].set(2.0).at[3].set(-1.5)
    y = y_ts + x @ beta_true

    reg_prior = SpikeSlabPrior.from_data(x, y, expected_model_size=3.0)
    model = Bsts(
        y=y,
        blocks=[LocalLinearTrend.default(y), Seasonal.default(y, 4)],
        predictors=x,
        reg_prior=reg_prior,
    )
    res = run_mcmc(jax.random.key(33), model.kernel(), model.init_state,
                   num_draws=600, num_chains=4, burn=300,
                   extract=lambda s: {"gamma": s["gamma"],
                                      "beta": s["beta"],
                                      "sigsq_obs": s["sigsq_obs"]})
    gamma = np.asarray(res.draws["gamma"]).reshape(-1, p)
    beta = np.asarray(res.draws["beta"]).reshape(-1, p)
    incl = gamma.mean(0)
    assert incl[0] > 0.9 and incl[3] > 0.9, incl
    assert (incl[[1, 2, 4, 5, 6, 7]] < 0.5).all(), incl
    assert testing.check_mcmc_matrix(beta, np.asarray(beta_true),
                                     confidence=0.98)
    # sigma_obs^2 and sigma_level^2 trade off (weakly identified — the
    # same posterior geometry as the reference); check the total is sane
    # rather than exact coverage of the simulation value.
    so = np.asarray(res.draws["sigsq_obs"])
    assert 0.15 < so.mean() < 0.6, so.mean()


def test_bsts_prediction_shapes_and_sanity(rng_key):
    t_len = 120
    k1, k2 = jax.random.split(rng_key)
    y = (jnp.cumsum(0.2 * jax.random.normal(k1, (t_len,)))
         + 0.3 * jax.random.normal(k2, (t_len,)))
    model = Bsts(y=y, blocks=[LocalLevel.default(y)])
    res = run_mcmc(jax.random.key(35), model.kernel(), model.init_state,
                   num_draws=100, num_chains=2, burn=100,
                   extract=lambda s: s)
    final = jax.tree_util.tree_map(lambda a: a[:, -1], res.draws)
    horizon = 12
    preds = jax.vmap(
        lambda k, s: model.predict(k, s, horizon))(
        jax.random.split(jax.random.key(36), 2), final)
    assert preds.shape == (2, horizon)
    assert np.isfinite(np.asarray(preds)).all()
    # forecasts start near the last level
    assert abs(float(preds[:, 0].mean() - y[-1])) < 2.0


def test_bsts_ar_block(rng_key):
    t_len = 400
    k1, k2 = jax.random.split(rng_key)
    # AR(1) latent with phi=0.8
    def ar_step(x, e):
        x_next = 0.8 * x + e
        return x_next, x_next

    _, lat = jax.lax.scan(ar_step, 0.0,
                          0.5 * jax.random.normal(k1, (t_len,)))
    y = lat + 0.3 * jax.random.normal(k2, (t_len,))
    model = Bsts(y=y, blocks=[ArState.default(y, 1)])
    res = run_mcmc(jax.random.key(37), model.kernel(), model.init_state,
                   num_draws=600, num_chains=4, burn=300,
                   extract=lambda s: s["blocks"]["ar1"]["phi"])
    phi = np.asarray(res.draws).reshape(-1)
    assert testing.check_mcmc_vector(phi, 0.8, confidence=0.98)


def test_marginal_sigma_slice_preserves_posterior(rng_key):
    """The marginal variance slice composes with the conditional sweep
    without changing the stationary distribution: posteriors with and
    without the move must agree within MC error."""
    k1, k2, k3 = jax.random.split(rng_key, 3)
    t_len = 300
    slope = jnp.cumsum(0.02 * jax.random.normal(k3, (t_len,)))
    lvl = jnp.cumsum(slope + 0.25 * jax.random.normal(k1, (t_len,)))
    y = lvl + 0.5 * jax.random.normal(k2, (t_len,))

    results = {}
    for use_slice in (False, True):
        model = Bsts(y=y, blocks=[LocalLinearTrend.default(y)],
                     marginal_sigma_slice=use_slice)
        res = run_mcmc(jax.random.key(11), model.kernel(),
                       model.init_state, num_draws=400, num_chains=4,
                       burn=400)
        results[use_slice] = {
            "so": float(jnp.mean(res.draws["sigsq_obs"])),
            "lvl": float(jnp.mean(jnp.sqrt(
                res.draws["blocks"]["trend"]["sigma_level_sq"]))),
            "slp": float(jnp.mean(jnp.sqrt(
                res.draws["blocks"]["trend"]["sigma_slope_sq"]))),
        }
    a, b = results[False], results[True]
    assert abs(a["so"] - b["so"]) < 0.05, (a, b)
    assert abs(a["lvl"] - b["lvl"]) < 0.06, (a, b)
    assert abs(a["slp"] - b["slp"]) < 0.02, (a, b)
