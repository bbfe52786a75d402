"""stats/ layer: moments, acf/pacf, ECDF/KDE/IQagent, splines, encoders,
metrics — validated against scipy/statsmodels-style closed forms."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats as sps

from boom_tpu import stats as bstats


def test_moments_match_numpy(np_rng):
    x = jnp.asarray(np_rng.normal(2.0, 3.0, 500))
    np.testing.assert_allclose(float(bstats.mean(x)), np.mean(x), rtol=1e-12)
    np.testing.assert_allclose(float(bstats.var(x)),
                               np.var(np.asarray(x), ddof=1), rtol=1e-10)
    np.testing.assert_allclose(float(bstats.skewness(x)),
                               sps.skew(np.asarray(x)), rtol=1e-8)
    np.testing.assert_allclose(float(bstats.kurtosis(x)),
                               sps.kurtosis(np.asarray(x)), rtol=1e-6,
                               atol=1e-8)


def test_acf_matches_direct(np_rng):
    x = np_rng.normal(size=300)
    # AR-ify for nontrivial acf
    for i in range(1, 300):
        x[i] += 0.7 * x[i - 1]
    r = np.asarray(bstats.acf(jnp.asarray(x), 10))
    xc = x - x.mean()
    denom = np.sum(xc * xc)
    for lag in range(11):
        direct = np.sum(xc[: 300 - lag] * xc[lag:]) / denom
        np.testing.assert_allclose(r[lag], direct, atol=1e-10)


def test_pacf_ar1(np_rng):
    x = np.zeros(5000)
    eps = np_rng.normal(size=5000)
    for i in range(1, 5000):
        x[i] = 0.6 * x[i - 1] + eps[i]
    p = np.asarray(bstats.pacf(jnp.asarray(x), 5))
    assert abs(p[0] - 0.6) < 0.05
    assert np.all(np.abs(p[1:]) < 0.08), p


def test_ecdf(np_rng):
    x = np_rng.normal(size=1000)
    e = bstats.Ecdf.from_data(jnp.asarray(x))
    np.testing.assert_allclose(float(e(0.0)), np.mean(x <= 0.0), atol=1e-9)
    q = float(e.quantile(0.5))
    assert abs(q - np.median(x)) < 0.1


def test_kde_integrates_to_one(np_rng):
    x = jnp.asarray(np_rng.normal(size=400))
    grid = jnp.linspace(-6.0, 6.0, 500)
    dens = bstats.kde(x, grid)
    integral = float(jnp.trapezoid(dens, grid))
    np.testing.assert_allclose(integral, 1.0, atol=0.01)


def test_iqagent_streaming_quantiles(np_rng):
    xs = jnp.asarray(np_rng.normal(size=4096))
    state = bstats.iqagent_init()
    state = jax.jit(bstats.iqagent_add_batch)(state, xs)
    med = float(bstats.iqagent_quantile(state, 0.5))
    q90 = float(bstats.iqagent_quantile(state, 0.9))
    assert abs(med - np.median(np.asarray(xs))) < 0.08, med
    assert abs(q90 - np.quantile(np.asarray(xs), 0.9)) < 0.15, q90


def test_bspline_partition_of_unity():
    knots = jnp.linspace(0.0, 1.0, 6)
    x = jnp.linspace(0.01, 0.99, 50)
    b = bstats.bspline_basis(x, knots, degree=3)
    np.testing.assert_allclose(np.asarray(jnp.sum(b, -1)), 1.0, atol=1e-10)
    assert b.shape == (50, 8)
    assert bool(jnp.all(b >= 0))


def test_bspline_matches_scipy():
    from scipy.interpolate import BSpline

    knots = np.linspace(0.0, 2.0, 5)
    degree = 3
    t = np.concatenate([[knots[0]] * degree, knots, [knots[-1]] * degree])
    x = np.linspace(0.05, 1.95, 25)
    ours = np.asarray(bstats.bspline_basis(jnp.asarray(x),
                                           jnp.asarray(knots), degree))
    n_basis = len(knots) + degree - 1
    for j in range(n_basis):
        c = np.zeros(n_basis)
        c[j] = 1.0
        ref = BSpline(t, c, degree, extrapolate=False)(x)
        np.testing.assert_allclose(ours[:, j], ref, atol=1e-10)


def test_natural_spline_linear_outside():
    knots = jnp.asarray([0.0, 1.0, 2.0, 3.0])
    x = jnp.asarray([-1.0, -0.5, 3.5, 4.0])
    b = bstats.natural_spline_basis(x, knots)
    # second differences along far-out points should be ~0 (linearity)
    left = np.asarray(b[:2])
    slope = (left[1] - left[0]) / 0.5
    assert b.shape == (4, 4)
    # basis is linear in x beyond boundaries: check exact linearity
    x2 = jnp.asarray([-2.0, -1.0, 0.0])
    b2 = np.asarray(bstats.natural_spline_basis(x2, knots))
    d1 = b2[1] - b2[0]
    d2 = b2[2] - b2[1]
    np.testing.assert_allclose(d1, d2, atol=1e-8)


def test_encoders_and_design():
    tbl = bstats.DataTable.from_dict({
        "x": [1.0, 2.0, 3.0, 4.0],
        "g": ["a", "b", "a", "c"],
    })
    assert tbl.is_categorical("g") and tbl.nlevels("g") == 3
    m, names = bstats.build_design(tbl, ["x", "g"])
    assert m.shape == (4, 4)  # intercept + x + 2 dummies
    assert names[0] == "(Intercept)"
    # effects coding sums to zero over balanced levels
    e = np.asarray(bstats.effects_encode(jnp.asarray([0, 1, 2]), 3))
    np.testing.assert_allclose(e.sum(0), 0.0, atol=1e-12)
    m2, names2 = bstats.build_design(tbl, [("x", "g")], intercept=False)
    assert m2.shape == (4, 2)


def test_chi_square_matches_scipy(np_rng):
    obs = np.asarray([25, 30, 20, 25])
    stat, df, p = bstats.chi_square_test(jnp.asarray(obs))
    ref = sps.chisquare(obs)
    np.testing.assert_allclose(float(stat), ref.statistic, rtol=1e-10)
    np.testing.assert_allclose(float(p), ref.pvalue, rtol=1e-8)


def test_ks_matches_scipy(np_rng):
    x = np_rng.normal(size=200)
    y = np_rng.normal(0.3, 1.0, size=250)
    d, p = bstats.two_sample_ks(jnp.asarray(x), jnp.asarray(y))
    ref = sps.ks_2samp(x, y)
    np.testing.assert_allclose(float(d), ref.statistic, atol=1e-10)
    assert abs(float(p) - ref.pvalue) < 0.05  # asymptotic vs exact


def test_roc_auc_matches_sklearn_formula(np_rng):
    scores = np_rng.normal(size=300)
    labels = (np_rng.uniform(size=300) < 1 / (1 + np.exp(-scores))).astype(
        int)
    auc = float(bstats.roc_auc(jnp.asarray(scores), jnp.asarray(labels)))
    # rank-based reference
    from scipy.stats import rankdata

    r = rankdata(scores)
    n1 = labels.sum()
    ref = (r[labels == 1].sum() - n1 * (n1 + 1) / 2) / (
        n1 * (len(labels) - n1))
    np.testing.assert_allclose(auc, ref, rtol=1e-10)


def test_kl_divergence():
    p = jnp.asarray([0.5, 0.3, 0.2])
    np.testing.assert_allclose(float(bstats.kl_divergence(p, p)), 0.0,
                               atol=1e-12)
    q = jnp.asarray([0.2, 0.3, 0.5])
    kl = float(bstats.kl_divergence(p, q))
    ref = float(np.sum(np.asarray(p) * np.log(np.asarray(p)
                                              / np.asarray(q))))
    np.testing.assert_allclose(kl, ref, rtol=1e-10)
