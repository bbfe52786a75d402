"""Plotting layer (rplots.py) — the R-graphics emulation surface of the
reference (Interfaces/python/R/BayesBoom/R/plots.py) and the plot.bsts /
plot.lm.spike dispatches."""

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

from boom_tpu import rplots


@pytest.fixture(autouse=True)
def _close_all():
    yield
    import matplotlib.pyplot as plt

    plt.close("all")


def test_plot_grid_shape():
    assert rplots.plot_grid_shape(1) == (1, 1)
    assert rplots.plot_grid_shape(4) == (2, 2)
    assert rplots.plot_grid_shape(5) == (2, 3)
    assert rplots.plot_grid_shape(10) == (3, 4)


def test_plot_dynamic_distribution_shades_bands():
    rng = np.random.default_rng(0)
    curves = rng.normal(size=(200, 30)).cumsum(axis=1)
    ax = rplots.plot_dynamic_distribution(curves)
    # ~24 quantile bands + median line
    assert len(ax.collections) > 10
    assert len(ax.lines) == 1


def test_compare_dynamic_distributions_same_scale():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(50, 20))
    b = 5.0 + rng.normal(size=(50, 20))
    fig, axes = rplots.compare_dynamic_distributions(
        [a, b], names=["a", "b"], actuals=np.zeros(20))
    assert axes.shape == (2, 1)
    # same y-limits across panels
    assert axes[0, 0].get_ylim() == axes[1, 0].get_ylim()


def test_time_series_boxplot_and_many_ts():
    rng = np.random.default_rng(2)
    ax = rplots.time_series_boxplot(rng.normal(size=(100, 12)))
    assert ax is not None
    fig, axes = rplots.plot_many_ts(rng.normal(size=(40, 5)),
                                    truth=np.zeros(5),
                                    names=list("abcde"))
    assert axes.shape == (2, 3)
    assert axes[0, 0].get_title() == "a"


def test_boxplot_true_marks_truth():
    rng = np.random.default_rng(3)
    draws = rng.normal(size=(300, 4)) + np.arange(4)
    ax = rplots.boxplot_true(draws, truth=np.arange(4),
                             names=list("wxyz"))
    assert len(ax.collections) >= 1  # truth stars


def test_hosmer_lemeshow_calibrated():
    rng = np.random.default_rng(4)
    p = rng.uniform(size=2000)
    y = (rng.uniform(size=2000) < p).astype(float)
    ax = rplots.hosmer_lemeshow_plot(y, p)
    pts = ax.collections[0].get_offsets()
    # calibrated: bucket frequencies track predicted probabilities
    assert np.max(np.abs(pts[:, 0] - pts[:, 1])) < 0.15


def test_plot_density_matches_histogram_mode():
    rng = np.random.default_rng(5)
    x = rng.normal(size=4000)
    ax = rplots.plot_density(x, rug=False)
    line = ax.lines[0]
    grid, dens = line.get_xdata(), line.get_ydata()
    assert abs(grid[np.argmax(dens)]) < 0.3


def test_inclusion_probs_plot():
    coefs = [
        {"name": "a", "inclusion_prob": 0.95, "mean_given_inclusion": 1.0},
        {"name": "b", "inclusion_prob": 0.10, "mean_given_inclusion": -2.0},
    ]
    ax = rplots.plot_inclusion_probs(coefs)
    assert len(ax.patches) == 2
    widths = sorted(p.get_width() for p in ax.patches)
    assert np.allclose(widths, [0.10, 0.95])


def test_mosaic_and_abline():
    counts = np.array([[10, 5], [20, 15]])
    ax = rplots.mosaic_plot(counts, row_names=["r0", "r1"],
                            col_names=["c0", "c1"])
    assert len(ax.patches) == 4
    ax2 = rplots.abline(None if False else ax, h=0.5)
    assert ax2 is ax


def test_bsts_plot_dispatch():
    """BstsModel.plot drives the full path on a tiny model."""
    from boom_tpu.api import BstsModel

    rng = np.random.default_rng(6)
    y = np.cumsum(rng.normal(size=60) * 0.2) + rng.normal(size=60) * 0.1
    m = BstsModel().add_local_level()
    m.fit(y, niter=100, num_chains=2, burn=50)
    ax = m.plot("state")
    assert len(ax.lines) >= 2  # median + data dots
    fig, axes = m.plot("components")
    assert axes.shape[0] >= 1
    ax = m.plot("residuals")
    assert ax is not None


def test_lm_spike_plot_dispatch():
    from boom_tpu.api import LmSpike

    rng = np.random.default_rng(7)
    x = rng.normal(size=(150, 5))
    x[:, 0] = 1.0
    y = 2.0 * x[:, 1] + rng.normal(size=150) * 0.5
    m = LmSpike(expected_model_size=2).fit(x, y, niter=200,
                                           num_chains=2, burn=50)
    ax = m.plot("inclusion")
    assert len(ax.patches) == 5
    ax = m.plot("coefficients")
    assert ax is not None
    with pytest.raises(ValueError):
        m.plot("nope")


def test_qqdist_and_acf_dist():
    rng = np.random.default_rng(5)
    draws = rng.normal(size=(80, 60)) + rng.normal(size=(1, 60))
    ax = rplots.qqdist(draws)
    assert len(ax.collections) > 5  # fan bands
    assert len(ax.lines) >= 2  # reference line + points
    ax2 = rplots.acf_dist(draws, lag_max=8)
    assert ax2.get_xlabel() == "Lag"
