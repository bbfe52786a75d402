"""Fitted-model serialization (save/load on every front end; reference
python bsts pickling, bsts.py:1155) and the r4 bsts diagnostics plot
kinds (PlotBstsPredictionErrors / PlotBstsForecastDistribution /
qqdist / AcfDist)."""

import matplotlib

matplotlib.use("Agg")

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from boom_tpu.api import BstsModel, LmSpike
from boom_tpu.models.glm import SpikeSlabRegression


@pytest.fixture(autouse=True)
def _close_all():
    yield
    import matplotlib.pyplot as plt

    plt.close("all")


@pytest.fixture(scope="module")
def bsts_fit():
    k1, k2 = jax.random.split(jax.random.key(3))
    t_len = 120
    trend = jnp.cumsum(0.05 * jax.random.normal(k1, (t_len,)))
    y = trend + 0.3 * jax.random.normal(k2, (t_len,))
    model = BstsModel().add_local_level()
    model.fit(y, niter=150, num_chains=2, burn=100)
    return model


def test_lm_spike_save_load_predict_equal(tmp_path):
    x, y, _ = SpikeSlabRegression.simulate(jax.random.key(0), 400, 10, 3)
    fit = LmSpike(expected_model_size=3.0).fit(
        np.asarray(x), np.asarray(y), niter=100, num_chains=2, burn=50)
    path = tmp_path / "lmspike.pkl"
    fit.save(path)
    fit2 = LmSpike.load(path)
    p1 = np.asarray(fit.predict(np.asarray(x[:7])))
    p2 = np.asarray(fit2.predict(np.asarray(x[:7])))
    assert np.allclose(p1, p2)
    assert fit2.coefficients()[0]["inclusion_prob"] > 0.5


def test_load_wrong_class_raises(tmp_path):
    x, y, _ = SpikeSlabRegression.simulate(jax.random.key(1), 200, 6, 2)
    fit = LmSpike().fit(np.asarray(x), np.asarray(y), niter=50,
                        num_chains=2, burn=20)
    path = tmp_path / "fit.pkl"
    fit.save(path)
    with pytest.raises(TypeError):
        BstsModel.load(path)


def test_bsts_save_load_predict_equal(tmp_path, bsts_fit):
    path = tmp_path / "bsts.pkl"
    bsts_fit.save(path)
    loaded = BstsModel.load(path)
    p1 = np.asarray(bsts_fit.predict(horizon=6, max_draws=10, seed=4))
    p2 = np.asarray(loaded.predict(horizon=6, max_draws=10, seed=4))
    assert np.allclose(p1, p2)


def test_bsts_prediction_error_plots(bsts_fit):
    ax = bsts_fit.plot(kind="prediction.errors")
    assert ax is not None
    ax = bsts_fit.plot(kind="forecast.distribution")
    assert len(ax.lines) >= 1  # actuals overlay
    ax = bsts_fit.plot(kind="qq")
    assert ax.get_xlabel() == "Quantiles of Standard Normal"
    ax = bsts_fit.plot(kind="acf")
    assert ax.get_xlabel() == "Lag"


def test_bsts_prediction_errors_holdout(bsts_fit):
    errs = bsts_fit.prediction_errors(cutpoints=[90], max_draws=8)
    assert set(errs) == {"in.sample", "90"}
    for v in errs.values():
        arr = np.asarray(v)
        assert arr.shape[-1] == 120
        assert np.isfinite(arr).all()


@pytest.mark.slow
def test_mbsts_front_end():
    """MbstsModel: the R mbsts() user surface (mbsts.R:86) —
    fit/summary/plot/predict/save round trip."""
    import matplotlib.pyplot as plt

    from boom_tpu.api import MbstsModel

    key = jax.random.key(12)
    k1, k2, k3 = jax.random.split(key, 3)
    t_len, k_dim = 120, 3
    factor = jnp.cumsum(0.4 * jax.random.normal(k1, (t_len,)))
    load = jnp.asarray([1.0, 0.6, -0.8])
    y = (factor[:, None] * load[None, :]
         + 0.4 * jax.random.normal(k2, (t_len, k_dim)))
    fit = MbstsModel(num_factors=1).fit(np.asarray(y), niter=150,
                                        num_chains=2, burn=150)
    s = fit.summary()
    assert len(s["observation_sd"]["mean"]) == k_dim
    means = np.asarray(fit.series_mean_draws(max_draws=20))
    assert means.shape[1:] == (t_len, k_dim)
    # conditional means track the factor signal
    corr = np.corrcoef(means.mean(0)[:, 0], np.asarray(y)[:, 0])[0, 1]
    assert corr > 0.9, corr
    fig, axes = fit.plot(kind="means")
    assert axes.size == k_dim
    plt.close("all")
    preds = np.asarray(fit.predict(horizon=5, max_draws=10))
    assert preds.shape == (10, 5, k_dim)
    assert np.isfinite(preds).all()
