"""GP front ends (frontends.py GaussianProcessRegression /
HierarchicalGaussianProcessRegression) — the reference bayesreg package
surface (gaussian_process.py:15, kernels.py, mean_function.py)."""

import numpy as np
import pytest

from boom_tpu.frontends import (
    GaussianProcessRegression,
    HierarchicalGaussianProcessRegression,
)


def test_gp_rbf_zero_mean_interpolates():
    rng = np.random.default_rng(0)
    x = np.sort(rng.uniform(-2, 2, size=50))[:, None]
    y = np.sin(2.0 * x[:, 0]) + 0.05 * rng.normal(size=50)
    gp = GaussianProcessRegression().fit(
        x, y, niter=200, num_chains=2, burn=100)
    xg = np.linspace(-1.8, 1.8, 25)[:, None]
    mean, sd = gp.predict(xg, max_draws=50)
    assert np.max(np.abs(mean - np.sin(2.0 * xg[:, 0]))) < 0.25
    hyp = gp.hyperparameter_draws()
    assert float(np.median(hyp["residual_sd"])) < 0.25


def test_gp_linear_mean_recovers_trend():
    """With mean='linear' the GP should recover the linear trend in
    beta and extrapolate it (a zero-mean GP reverts to 0)."""
    rng = np.random.default_rng(1)
    x = np.sort(rng.uniform(-2, 2, size=60))[:, None]
    y = (1.0 + 2.0 * x[:, 0]
         + 0.3 * np.sin(3.0 * x[:, 0])
         + 0.05 * rng.normal(size=60))
    gp = GaussianProcessRegression(mean="linear").fit(
        x, y, niter=250, num_chains=2, burn=120)
    beta = gp.hyperparameter_draws()["beta"].reshape(-1, 2)
    assert abs(np.median(beta[:, 0]) - 1.0) < 0.5
    assert abs(np.median(beta[:, 1]) - 2.0) < 0.5
    # extrapolation beyond the data follows the trend
    mean, _ = gp.predict(np.array([[4.0]]), max_draws=50)
    assert abs(mean[0] - 9.0) < 2.0


def test_gp_mahalanobis_ard_downweights_irrelevant_dim():
    rng = np.random.default_rng(2)
    x = rng.uniform(-2, 2, size=(70, 2))
    y = np.sin(2.0 * x[:, 0]) + 0.05 * rng.normal(size=70)
    gp = GaussianProcessRegression(kernel="mahalanobis").fit(
        x, y, niter=250, num_chains=2, burn=120)
    scales = gp.hyperparameter_draws()["scales"].reshape(-1, 2)
    med = np.median(scales, axis=0)
    # irrelevant dim gets a larger per-dimension lengthscale
    assert med[1] > med[0]
    mean, _ = gp.predict(x[:10], max_draws=50)
    assert np.max(np.abs(mean - y[:10])) < 0.5


def test_hgp_frontend_ragged_groups():
    rng = np.random.default_rng(3)
    xs, ys, gs = [], [], []
    offsets = {"a": 0.0, "b": 1.5, "c": -1.0}
    for g, off in offsets.items():
        n = {"a": 30, "b": 22, "c": 26}[g]
        xg = np.sort(rng.uniform(-2, 2, size=n))
        yg = np.sin(xg) + off + 0.1 * rng.normal(size=n)
        xs.append(xg[:, None])
        ys.append(yg)
        gs.extend([g] * n)
    x = np.concatenate(xs)
    y = np.concatenate(ys)
    hgp = HierarchicalGaussianProcessRegression().fit(
        x, y, gs, niter=200, num_chains=2, burn=100)
    for g, off in offsets.items():
        mean, sd = hgp.predict_group(np.array([[0.0]]), g, max_draws=50)
        assert abs(mean[0] - off) < 0.5, (g, mean)
