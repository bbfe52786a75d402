"""Round-5 plot-surface tail (VERDICT r4 missing #4-#6): plot kinds
'predictors' and 'size' (PlotBstsPredictors plots.R:261, PlotBstsSize
plots.R:399), per-season effect panels (PlotSeasonalEffect,
plot_seasonal_effect.R), and mbsts forecast fan charts
(plot.mbsts.prediction, mbsts.plots.R:177)."""

import matplotlib

matplotlib.use("Agg")

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from boom_tpu.api import BstsModel, MbstsModel


@pytest.fixture(autouse=True)
def _close_all():
    yield
    import matplotlib.pyplot as plt

    plt.close("all")


@pytest.fixture(scope="module")
def reg_fit():
    key = jax.random.key(9)
    k1, k2, k3 = jax.random.split(key, 3)
    t_len, p = 100, 6
    x = jax.random.normal(k1, (t_len, p))
    trend = jnp.cumsum(0.05 * jax.random.normal(k2, (t_len,)))
    y = trend + 2.0 * x[:, 0] - 1.5 * x[:, 1] \
        + 0.3 * jax.random.normal(k3, (t_len,))
    model = BstsModel().add_local_level()
    model.fit(y, predictors=np.asarray(x), expected_model_size=3.0,
              niter=150, num_chains=2, burn=100)
    return model


def test_plot_predictors(reg_fit):
    ax = reg_fit.plot(kind="predictors", inclusion_threshold=0.5)
    # the two real predictors plus the original-series overlay
    assert len(ax.lines) >= 3
    labels = [ln.get_label() for ln in ax.lines]
    assert any("x0" in l for l in labels)
    assert any("x1" in l for l in labels)


def test_plot_size(reg_fit):
    ax = reg_fit.plot(kind="size")
    assert len(ax.patches) >= 1  # histogram bars
    ax2 = reg_fit.plot(kind="size", style="ts")
    assert len(ax2.lines) == 1


@pytest.fixture(scope="module")
def seasonal_fit():
    key = jax.random.key(11)
    k1, k2 = jax.random.split(key)
    t_len, s = 21 * 8, 7
    pat = jnp.asarray([2.0, -1.0, 0.5, 0.0, -0.5, 1.5, -2.5])
    y = (pat[jnp.arange(t_len) % s]
         + jnp.cumsum(0.02 * jax.random.normal(k1, (t_len,)))
         + 0.2 * jax.random.normal(k2, (t_len,)))
    model = BstsModel().add_local_level().add_seasonal(nseasons=7)
    model.fit(y, niter=150, num_chains=2, burn=100)
    return model


def test_plot_seasonal_panels(seasonal_fit):
    axes = seasonal_fit.plot(kind="seasonal")
    assert len(axes) >= 7
    assert axes[0].get_title() == "season 0"


def test_plot_seasonal_requires_component(reg_fit):
    with pytest.raises(ValueError, match="no seasonal component"):
        reg_fit.plot(kind="seasonal")


@pytest.mark.slow
def test_mbsts_prediction_plot():
    key = jax.random.key(5)
    k1, k2, k3 = jax.random.split(key, 3)
    t_len, k_dim = 80, 3
    factor = jnp.cumsum(0.3 * jax.random.normal(k1, (t_len,)))
    load = jnp.asarray([1.0, 0.7, 1.4])
    y = (factor[:, None] * load[None, :]
         + 0.4 * jax.random.normal(k2, (t_len, k_dim)))
    m = MbstsModel(num_factors=1)
    m.fit(np.asarray(y), niter=100, num_chains=2, burn=100)
    fig, axes = m.plot(kind="prediction", horizon=12, seed=3)
    flat = list(np.ravel(axes))
    # median + two interval lines + original points per panel
    assert len(flat[0].lines) >= 3
    pred = m.predict(horizon=12, max_draws=20)
    fig2, _ = m.plot(kind="prediction", prediction=pred)
    assert fig2 is not None
