"""R-style plotting and posterior-visualization helpers.

The reference ships an R-graphics emulation layer used by every Python
front end (`Interfaces/python/R/BayesBoom/R/plots.py`: plot at :191,
plot_dynamic_distribution at :699, compare_dynamic_distributions at
:815, plot_many_ts at :610, time_series_boxplot at :404, BoxplotTrue at
:348, hosmer_lemeshow_plot at :909, plot_grid_shape at :116) and the
bsts R package's plot.bsts dispatch (state / components / coefficients /
residuals / prediction.errors). This module is the boom_tpu analog,
written directly against matplotlib; all statistical summaries (ESS,
quantiles, KDE) come from boom_tpu.stats / inference.diagnostics.

matplotlib is imported lazily so headless library use never requires it.
Every function accepts and returns a matplotlib Axes.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "plot_dynamic_distribution", "compare_dynamic_distributions",
    "plot_many_ts", "time_series_boxplot", "boxplot_true",
    "hosmer_lemeshow_plot", "plot_grid_shape", "plot_inclusion_probs",
    "plot_density", "abline", "lines", "points", "mosaic_plot",
    "qqdist", "acf_dist",
]


def _plt():
    import matplotlib
    if matplotlib.get_backend().lower() not in ("agg", "module://"):
        try:
            matplotlib.use("Agg", force=False)
        except Exception:
            pass
    import matplotlib.pyplot as plt
    return plt


def _ensure_ax(ax):
    if ax is None:
        _, ax = _plt().subplots()
    return ax


def plot_grid_shape(nplots):
    """(nrows, ncols) for a near-square grid — plots.py:116."""
    ncols = int(np.ceil(np.sqrt(nplots)))
    nrows = int(np.ceil(nplots / ncols))
    return nrows, ncols


def abline(ax, a=0.0, b=1.0, h=None, v=None, **kw):
    """R's abline: intercept/slope line, or horizontal/vertical rules."""
    kw.setdefault("color", "k")
    kw.setdefault("linewidth", 1.0)
    if h is not None:
        for y in np.atleast_1d(h):
            ax.axhline(y, **kw)
    elif v is not None:
        for x in np.atleast_1d(v):
            ax.axvline(x, **kw)
    else:
        ax.axline((0.0, a), slope=b, **kw)
    return ax


def lines(x, y=None, ax=None, **kw):
    ax = _ensure_ax(ax)
    if y is None:
        x, y = np.arange(len(x)), x
    ax.plot(x, y, **kw)
    return ax


def points(x, y=None, ax=None, **kw):
    ax = _ensure_ax(ax)
    if y is None:
        x, y = np.arange(len(x)), x
    ax.scatter(x, y, s=kw.pop("s", 12), **kw)
    return ax


def plot_dynamic_distribution(curves, timestamps=None, ax=None,
                              quantile_step=0.02, xlab="Time", ylab="",
                              color="C0", highlight_median=True, **kw):
    """Pointwise posterior distribution of a family of curves over time
    (plots.py:699): nested central quantile bands shaded so darkness is
    proportional to pointwise density.

    Args:
      curves: [ndraws, T] array of sampled curves.
      quantile_step: band resolution; smaller = smoother shading.
    """
    ax = _ensure_ax(ax)
    curves = np.asarray(curves).reshape(-1, np.shape(curves)[-1])
    t = (np.arange(curves.shape[1]) if timestamps is None
         else np.asarray(timestamps))
    levels = np.arange(quantile_step, 0.5, quantile_step)
    for q in levels:
        lo = np.quantile(curves, q, axis=0)
        hi = np.quantile(curves, 1.0 - q, axis=0)
        ax.fill_between(t, lo, hi, color=color,
                        alpha=min(2.5 * quantile_step, 1.0), linewidth=0)
    if highlight_median:
        ax.plot(t, np.median(curves, axis=0), color=color, linewidth=1.0)
    ax.set_xlabel(xlab)
    ax.set_ylabel(ylab)
    return ax


def compare_dynamic_distributions(curve_list, timestamps=None, names=None,
                                  actuals=None, same_scale=True, **kw):
    """Stacked plot_dynamic_distribution panels (plots.py:815)."""
    plt = _plt()
    n = len(curve_list)
    fig, axes = plt.subplots(n, 1, sharex=True, squeeze=False)
    ylim = None
    if same_scale:
        allc = np.concatenate(
            [np.asarray(c).ravel() for c in curve_list])
        pad = 0.05 * (allc.max() - allc.min() + 1e-12)
        ylim = (allc.min() - pad, allc.max() + pad)
    for i, curves in enumerate(curve_list):
        ax = axes[i, 0]
        plot_dynamic_distribution(curves, timestamps, ax=ax, **kw)
        if actuals is not None:
            t = (np.arange(np.shape(actuals)[-1]) if timestamps is None
                 else np.asarray(timestamps))
            ax.plot(t, np.asarray(actuals), color="k", linewidth=0.8)
        if ylim is not None:
            ax.set_ylim(*ylim)
        if names is not None:
            ax.set_ylabel(str(names[i]))
    return fig, axes


def plot_many_ts(series, same_scale=True, truth=None, names=None, **kw):
    """Grid of time-series panels (plots.py:610). series: [T, k]."""
    plt = _plt()
    series = np.asarray(series)
    k = series.shape[1]
    nrows, ncols = plot_grid_shape(k)
    fig, axes = plt.subplots(nrows, ncols, sharex=True,
                             sharey=same_scale, squeeze=False)
    for j in range(nrows * ncols):
        ax = axes[j // ncols, j % ncols]
        if j >= k:
            ax.axis("off")
            continue
        ax.plot(series[:, j], **kw)
        if truth is not None:
            abline(ax, h=np.asarray(truth)[j], color="r",
                   linestyle="--")
        if names is not None:
            ax.set_title(str(names[j]), fontsize=8)
    return fig, axes


def time_series_boxplot(curves, time=None, ax=None, width=0.6, **kw):
    """Boxplot of a curve distribution at each time point (plots.py:404).
    curves: [ndraws, T]."""
    ax = _ensure_ax(ax)
    curves = np.asarray(curves)
    t = np.arange(curves.shape[1]) if time is None else np.asarray(time)
    ax.boxplot([curves[:, i] for i in range(curves.shape[1])],
               positions=np.arange(len(t)), widths=width,
               showfliers=False, **kw)
    step = max(len(t) // 8, 1)
    ax.set_xticks(np.arange(len(t))[::step])
    ax.set_xticklabels([str(v) for v in t[::step]], rotation=45)
    return ax


def boxplot_true(draws, truth=None, names=None, ax=None, **kw):
    """Boxplots of posterior draws with true values overlaid
    (plots.py:348 BoxplotTrue) — the simulate-fit-recover visual."""
    ax = _ensure_ax(ax)
    draws = np.asarray(draws).reshape(-1, np.shape(draws)[-1])
    p = draws.shape[1]
    ax.boxplot([draws[:, j] for j in range(p)],
               positions=np.arange(p), showfliers=False, **kw)
    if truth is not None:
        ax.scatter(np.arange(p), np.asarray(truth), color="r",
                   marker="*", zorder=3, s=60)
    if names is not None:
        ax.set_xticks(np.arange(p))
        ax.set_xticklabels([str(n) for n in names], rotation=45)
    return ax


def hosmer_lemeshow_plot(actual, predicted, nbuckets=10, ax=None, **kw):
    """Calibration plot for binary predictions (plots.py:909): bucket by
    predicted probability, plot observed frequency per bucket."""
    ax = _ensure_ax(ax)
    actual = np.asarray(actual, float)
    predicted = np.asarray(predicted, float)
    edges = np.quantile(predicted, np.linspace(0, 1, nbuckets + 1))
    edges[0], edges[-1] = -np.inf, np.inf
    which = np.digitize(predicted, edges[1:-1])
    centers, freqs, ns = [], [], []
    for b in range(nbuckets):
        m = which == b
        if m.sum() == 0:
            continue
        centers.append(predicted[m].mean())
        freqs.append(actual[m].mean())
        ns.append(m.sum())
    ax.scatter(centers, freqs,
               s=20 * np.sqrt(np.asarray(ns) / max(sum(ns), 1)) * 10)
    abline(ax, a=0, b=1, linestyle="--", color=".5")
    ax.set_xlabel("predicted probability")
    ax.set_ylabel("observed frequency")
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1)
    return ax


def plot_inclusion_probs(coefficients, ax=None, threshold=0.0, **kw):
    """Horizontal barplot of spike-slab inclusion probabilities, signed
    by the coefficient's conditional mean — BoomSpikeSlab's
    plot.lm.spike(\"inclusion\")."""
    ax = _ensure_ax(ax)
    rows = [r for r in coefficients if r["inclusion_prob"] >= threshold]
    rows = sorted(rows, key=lambda r: r["inclusion_prob"])
    names = [r["name"] for r in rows]
    probs = np.array([r["inclusion_prob"] for r in rows])
    sign = np.array([1.0 if r["mean_given_inclusion"] >= 0 else -1.0
                     for r in rows])
    colors = np.where(sign > 0, "C0", "C3")
    ax.barh(np.arange(len(rows)), probs, color=colors, **kw)
    ax.set_yticks(np.arange(len(rows)))
    ax.set_yticklabels(names, fontsize=8)
    ax.set_xlabel("inclusion probability")
    ax.set_xlim(0, 1)
    return ax


def plot_density(x, ax=None, bw=None, gridsize=256, rug=False, **kw):
    """Kernel density plot (R's plot(density(x)); R/density.py)."""
    from boom_tpu.stats.density import kde

    ax = _ensure_ax(ax)
    x = np.asarray(x).ravel()
    lo, hi = x.min(), x.max()
    pad = 0.1 * (hi - lo + 1e-12)
    grid = np.linspace(lo - pad, hi + pad, gridsize)
    dens = np.asarray(kde(x, grid, bandwidth=bw))
    ax.plot(grid, dens, **kw)
    if rug:
        ax.plot(x, np.zeros_like(x), "|", color="k", markersize=8)
    return ax


def mosaic_plot(counts, row_names=None, col_names=None, ax=None):
    """Mosaic plot of a two-way contingency table (plots.py:490)."""
    ax = _ensure_ax(ax)
    counts = np.asarray(counts, float)
    col_tot = counts.sum(axis=0)
    widths = col_tot / counts.sum()
    x0 = 0.0
    for j in range(counts.shape[1]):
        if col_tot[j] == 0:
            continue
        props = counts[:, j] / col_tot[j]
        y0 = 0.0
        for i in range(counts.shape[0]):
            ax.bar(x0 + widths[j] / 2, props[i], width=widths[j] * 0.97,
                   bottom=y0, color=f"C{i % 10}",
                   edgecolor="white")
            y0 += props[i]
        if col_names is not None:
            ax.text(x0 + widths[j] / 2, -0.04, str(col_names[j]),
                    ha="center", va="top", fontsize=8)
        x0 += widths[j]
    if row_names is not None:
        ax.legend([str(r) for r in row_names], fontsize=7)
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1)
    ax.set_xticks([])
    return ax


def qqdist(draws, ax=None, **kw):
    """Posterior QQ plot for noisy observations thought normal
    (reference bsts/R/plots.R:17 qqdist): a dynamic-distribution fan of
    the draws sorted by posterior mean against standard-normal
    quantiles, an IQR-fit reference line, and the posterior means as
    points. draws: [ndraws, n]."""
    np_ = np
    draws = np_.asarray(draws)
    post_mean = draws.mean(0)
    n = post_mean.shape[0]
    order = np_.argsort(post_mean)
    sorted_draws = draws[:, order]
    # R's ppoints
    a = 3.0 / 8.0 if n <= 10 else 0.5
    probs = (np_.arange(1, n + 1) - a) / (n + 1 - 2 * a)
    from scipy.stats import norm as _norm  # scipy is baked in

    expected = _norm.ppf(probs)
    ax = plot_dynamic_distribution(sorted_draws, timestamps=expected,
                                   ax=ax, **kw)
    x25, x75 = _norm.ppf([0.25, 0.75])
    y25, y75 = np_.quantile(post_mean, [0.25, 0.75])
    slope = (y75 - y25) / (x75 - x25)
    ax.axline((x25, y25), slope=slope, color="green")
    ax.plot(expected, post_mean[order], ".", color="blue", markersize=3)
    ax.set_xlabel("Quantiles of Standard Normal")
    ax.set_ylabel("Distribution")
    return ax


def acf_dist(draws, lag_max=None, ax=None, **kw):
    """Posterior distribution of the ACF of a time-series quantity
    (reference plots.R:54 AcfDist): one box per lag over the per-draw
    autocorrelations. draws: [ndraws, T]."""
    from boom_tpu.stats.moments import acf as _acf

    draws = np.asarray(draws)
    t_len = draws.shape[1]
    if lag_max is None:
        lag_max = min(int(10 * np.log10(t_len)), t_len - 1)
    import jax

    rows = np.asarray(jax.vmap(lambda x: _acf(x, lag_max))(
        jnp_asarray(draws)))
    ax = _ensure_ax(ax)
    ax.boxplot([rows[:, k] for k in range(rows.shape[1])],
               positions=np.arange(rows.shape[1]), widths=0.6, **kw)
    ax.axhline(0.0, color="k", linewidth=0.8)
    ax.set_xlabel("Lag")
    ax.set_ylabel("Autocorrelation")
    return ax


def jnp_asarray(a):
    import jax.numpy as jnp

    return jnp.asarray(a)
