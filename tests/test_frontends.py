"""End-user front-end tests: every class in boom_tpu.frontends drives
the full user path (numpy in -> fit -> summaries/predictions out),
mirroring the reference python-package smoke tests
(Interfaces/python/{mixtures,impute,factormodels,bandits}/.../test_*.py).

Kept small: these are API-contract tests; statistical recovery for the
underlying engines lives in the per-model test files.
"""

import jax
import numpy as np
import pytest

from boom_tpu import frontends


def test_mlm_spike_recovers_signal(np_rng):
    n, p, k = 400, 4, 3
    x = np_rng.normal(size=(n, p))
    beta = np.zeros((k - 1, p))
    beta[0, 0] = 2.0
    beta[1, 1] = -2.0
    eta = np.concatenate([np.zeros((n, 1)), x @ beta.T], axis=1)
    probs = np.exp(eta) / np.exp(eta).sum(1, keepdims=True)
    choice = np.array([np_rng.choice(k, p=pr) for pr in probs])

    m = frontends.MlmSpike(expected_model_size=2.0).fit(
        x, choice, num_classes=k, niter=150, burn=100, num_chains=2)
    inc = m.inclusion_probs()
    assert inc.shape == (k - 1, p)
    assert inc[0, 0] > 0.8 and inc[1, 1] > 0.8
    assert inc[0, 2] < 0.5 and inc[1, 3] < 0.5
    pp = m.predict_probs(x[:10])
    assert pp.shape == (10, k)
    np.testing.assert_allclose(pp.sum(1), 1.0, atol=1e-6)
    assert m.coefficient_draws().shape[1:] == (k - 1, p)


def test_finite_mixture_components(np_rng):
    y = np.concatenate([np_rng.normal(-3.0, 0.5, 300),
                        np_rng.normal(3.0, 0.5, 200)])
    m = frontends.FiniteMixture(num_components=2).fit(
        y, niter=300, burn=200, num_chains=2)
    comps = m.components()
    assert len(comps) == 2
    means = sorted(c["mean"] for c in comps)
    assert abs(means[0] - (-3.0)) < 0.4
    assert abs(means[1] - 3.0) < 0.4
    w = sorted(c["weight"] for c in comps)
    assert abs(w[0] - 0.4) < 0.1
    resp = m.cluster_probs()
    assert resp.shape == (500, 2)
    np.testing.assert_allclose(resp.sum(1), 1.0, atol=1e-6)


def test_dp_mvn_frontend(np_rng):
    y = np.concatenate([
        np_rng.normal([-4, -4], 0.5, size=(60, 2)),
        np_rng.normal([4, 4], 0.5, size=(60, 2)),
    ])
    m = frontends.DirichletProcessMvn(max_components=10).fit(
        y, niter=60, burn=40)
    ks = m.num_cluster_draws()
    assert ks.shape == (20,)
    assert 1 <= np.median(ks) <= 5
    z = m.cluster_labels()
    # the two true groups should mostly land in different clusters
    assert (z[:60] == np.bincount(z[:60]).argmax()).mean() > 0.8


def test_mixed_data_imputer_frontend(np_rng):
    n = 150
    truth = np_rng.normal(2.0, 1.0, size=(n, 2))
    truth[:, 1] = 0.5 * truth[:, 0] + np_rng.normal(0, 0.3, n)
    numeric = truth.copy()
    numeric[np_rng.random((n, 2)) < 0.2] = np.nan
    cat = np_rng.integers(0, 3, size=(n, 1))
    cat_m = cat.copy()
    cat_m[np_rng.random((n, 1)) < 0.2] = -1

    m = frontends.MixedDataImputer(num_clusters=2).fit(
        numeric, cat_m, num_levels=[3], niter=150, burn=150,
        num_chains=2)
    num, catf = m.imputed_frame()
    assert num.shape == (n, 2) and catf.shape == (n, 1)
    assert np.isfinite(num).all() and (catf >= 0).all()
    # observed cells pass through untouched
    obs = np.isfinite(numeric)
    np.testing.assert_allclose(num[obs], numeric[obs], atol=1e-8)
    # imputations land near the data distribution
    miss = ~obs
    assert abs(num[miss].mean() - truth[miss].mean()) < 1.0


def test_poisson_factor_model_frontend(np_rng):
    v, s, k = 80, 12, 2
    lam = np_rng.gamma(1.0, 1.0, size=(s, k)) * np.array([[4.0, 0.5]] * s).T.T
    lam = np.abs(np_rng.normal(1.0, 0.5, size=(s, k))) + 0.1
    lam[:6, 0] *= 6.0
    lam[6:, 1] *= 6.0
    z = np_rng.integers(0, k, size=v)
    counts = np_rng.poisson(lam[:, z].T)

    m = frontends.PoissonFactorModel(num_classes=k).fit(
        counts, niter=150, burn=100, num_chains=2)
    draws = m.site_rate_draws()
    assert draws.shape[1:] == (s, k)
    probs = m.class_membership_probs()
    assert probs.shape == (v, k)
    np.testing.assert_allclose(probs.sum(1), 1.0, atol=1e-6)
    # hard assignments should separate the two true classes
    hard = probs.argmax(1)
    agree = max((hard == z).mean(), (hard == 1 - z).mean())
    assert agree > 0.85


def test_multinomial_factor_model_frontend(np_rng):
    v, s, k = 60, 10, 2
    prof = np_rng.dirichlet(np.ones(s), size=k)  # [k, s]
    prof[0, :5] *= 8
    prof[1, 5:] *= 8
    prof /= prof.sum(1, keepdims=True)
    z = np_rng.integers(0, k, size=v)
    counts = np.stack([np_rng.multinomial(30, prof[zi]) for zi in z])

    m = frontends.MultinomialFactorModel(num_classes=k).fit(
        counts, niter=150, burn=100, num_chains=2)
    draws = m.site_profile_draws()
    assert draws.shape[1:] == (s, k) or draws.shape[1:] == (k, s)
    probs = m.class_membership_probs()
    hard = probs.argmax(1)
    agree = max((hard == z).mean(), (hard == 1 - z).mean())
    assert agree > 0.85


def test_binomial_bandit_frontend():
    rng = np.random.default_rng(0)
    truth = [0.2, 0.5, 0.8]
    b = frontends.BinomialBandit(num_arms=3, seed=1)
    for t in range(300):
        arm = b.draw_arm()
        b.update(arm, float(rng.random() < truth[arm]))
    probs = b.optimal_arm_probabilities(num_draws=1000)
    assert probs.shape == (3,)
    assert probs.argmax() == 2 and probs[2] > 0.7


def test_linear_bandit_frontend():
    rng = np.random.default_rng(0)
    b = frontends.LinearBandit(factor_levels=[2, 2], seed=1)
    # reward depends on first factor only; best arms have factor0=1
    arms = np.asarray(b._model.arms)  # [n_arms, n_factors] level indices
    effects = np.array([1.0 if a[0] == 1 else 0.0 for a in arms])
    for t in range(200):
        arm = b.draw_arm()
        b.update(arm, float(effects[arm] + 0.3 * rng.normal()))
    probs = b.optimal_arm_probabilities(num_draws=1000)
    assert probs.argmax() in np.flatnonzero(effects == effects.max())


def test_nnet_regression_frontend(np_rng):
    n = 200
    x = np_rng.uniform(-2, 2, size=(n, 1))
    y = np.sin(2 * x[:, 0]) + 0.1 * np_rng.normal(size=n)
    m = frontends.NnetRegression(hidden=6).fit(
        x, y, niter=300, burn=300, num_chains=2)
    pred, sd = m.predict(x)
    assert pred.shape == (n,) and sd.shape == (n,)
    rmse = np.sqrt(np.mean((pred - np.sin(2 * x[:, 0])) ** 2))
    assert rmse < 0.35
    assert np.median(m.residual_sd_draws()) < 0.5


def test_frontends_reexported_from_api():
    import boom_tpu.api as api

    for name in ["MlmSpike", "FiniteMixture", "DirichletProcessMvn",
                 "ShrinkageRegression",
                 "MixedDataImputer", "PoissonFactorModel",
                 "MultinomialFactorModel", "BinomialBandit",
                 "LinearBandit", "NnetRegression"]:
        assert hasattr(api, name)


def test_shrinkage_regression_frontend(np_rng):
    n, p = 300, 8
    groups = [[0, 1, 2, 3], [4, 5, 6, 7]]
    b_true = np.concatenate([np.full(4, 1.5), np.full(4, -1.0)])
    b_true += 0.1 * np_rng.normal(size=p)
    x = np_rng.normal(size=(n, p))
    y = x @ b_true + 0.5 * np_rng.normal(size=n)

    m = frontends.ShrinkageRegression(coefficient_groups=groups).fit(
        x, y, niter=300, burn=200, num_chains=2)
    gm = m.group_mean_draws().mean(0)
    assert abs(gm[0] - 1.5) < 0.3 and abs(gm[1] + 1.0) < 0.3
    assert np.abs(m.coefficient_draws().mean(0) - b_true).max() < 0.25
    pred, sd = m.predict(x[:10])
    assert pred.shape == (10,) and (sd > 0).all()
