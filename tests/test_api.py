"""User-facing API layer (lm.spike / bsts analogs)."""

import jax
import jax.numpy as jnp
import numpy as np

from boom_tpu.api import (
    BstsModel,
    LmSpike,
    LogitSpike,
    QregSpike,
    suggest_burn,
)
from boom_tpu.models.glm import SpikeSlabRegression


def test_lm_spike_end_to_end(rng_key):
    x, y, beta = SpikeSlabRegression.simulate(rng_key, 400, 8, nonzero=3)
    fit = LmSpike(expected_model_size=3.0).fit(
        x, y, niter=300, num_chains=2, burn=100)
    coefs = fit.coefficients()
    assert len(coefs) == 8
    # nonzero coefficients found, spurious excluded
    for j in range(3):
        assert coefs[j]["inclusion_prob"] > 0.8, coefs[j]
        assert abs(coefs[j]["mean"] - float(beta[j])) < 0.3
    for j in range(4, 8):
        assert coefs[j]["inclusion_prob"] < 0.5, coefs[j]
    s = fit.summary()
    assert 0.7 < s["residual_sd"]["mean"] < 1.4
    pred = fit.predict(x[:10])
    assert pred.shape[1] == 10


def test_logit_spike_end_to_end(rng_key):
    from boom_tpu.models.glm import LogitSpikeSlab

    x, y, beta = LogitSpikeSlab.simulate(rng_key, 600, 6, nonzero=2)
    fit = LogitSpike(expected_model_size=2.0).fit(
        x, y, niter=300, num_chains=2, burn=100)
    coefs = fit.coefficients()
    assert coefs[0]["inclusion_prob"] > 0.7
    p = fit.predict_prob(x[:5])
    assert p.shape[1] == 5
    assert bool(jnp.all((p >= 0) & (p <= 1)))


def test_qreg_spike_api(rng_key):
    from boom_tpu.models.glm.quantile import QuantileSpikeSlab

    x, y, beta = QuantileSpikeSlab.simulate(rng_key, 500, 5, nonzero=2)
    fit = QregSpike(tau=0.5, expected_model_size=2.0).fit(
        x, y, niter=300, num_chains=2, burn=100)
    coefs = fit.coefficients()
    assert abs(coefs[0]["mean"] - float(beta[0])) < 0.4


def test_bsts_model_builder(rng_key):
    k1, k2 = jax.random.split(rng_key)
    t_len = 200
    trend = jnp.cumsum(0.05 * jax.random.normal(k1, (t_len,)))
    season = jnp.tile(jnp.asarray([2.0, -1.0, 0.5, -1.5]), t_len // 4)
    y = trend + season + 0.3 * jax.random.normal(k2, (t_len,))
    model = (BstsModel()
             .add_local_linear_trend()
             .add_seasonal(nseasons=4))
    model.fit(y, niter=300, num_chains=2, burn=150)
    s = model.summary()
    assert "observation_sd" in s
    assert s["observation_sd"]["mean"] < 1.0
    preds = model.predict(horizon=8, max_draws=50)
    assert preds.shape == (50, 8)
    assert bool(jnp.all(jnp.isfinite(preds)))
    contrib = model.state_contribution_draws()
    assert "seasonal_4" in contrib
    assert contrib["trend"].shape[-1] == t_len


def test_bsts_model_with_regression(rng_key):
    k1, k2, k3 = jax.random.split(rng_key, 3)
    t_len = 250
    x = jax.random.normal(k1, (t_len, 3))
    beta = jnp.asarray([2.0, 0.0, 0.0])
    trend = jnp.cumsum(0.05 * jax.random.normal(k2, (t_len,)))
    y = trend + x @ beta + 0.4 * jax.random.normal(k3, (t_len,))
    model = BstsModel().add_local_level()
    model.fit(y, predictors=x, expected_model_size=1.0, niter=300,
              num_chains=2, burn=150)
    coefs = model.coefficients()
    assert coefs[0]["inclusion_prob"] > 0.9, coefs
    assert abs(coefs[0]["mean"] - 2.0) < 0.3
    preds = model.predict(horizon=5, future_predictors=x[:5],
                          max_draws=20)
    assert preds.shape == (20, 5)


def test_suggest_burn():
    ll = np.concatenate([np.linspace(-500, -100, 50),
                         -100 + np.random.default_rng(0).normal(
                             0, 1, 450)])
    b = suggest_burn(ll)
    assert 20 <= b <= 120, b
