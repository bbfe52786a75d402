"""Wide dynamic regression (SparseDynamicRegression + dynreg api).

Reference: Models/StateSpace/DynamicRegression.hpp:32,
PosteriorSamplers/DynamicRegressionDirectGibbs.cpp, and
Interfaces/python/dynreg/BayesBoom/dynreg/dynreg.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from boom_tpu.statespace.dynreg import SparseDynamicRegression


def _simulate(key, t_len=120, n=30, p=8, sigma=0.5):
    """Coefficient 0 always active and drifting; coefficient 1 enters
    at t_len/2; the rest are never active."""
    k1, k2 = jax.random.split(key)
    rng = np.random.default_rng(0)
    beta = np.zeros((t_len, p))
    beta[:, 0] = 1.5 + np.cumsum(0.03 * rng.standard_normal(t_len))
    half = t_len // 2
    beta[half:, 1] = 1.0 + np.cumsum(0.05 * rng.standard_normal(half))
    if n == 1:
        x = jax.random.normal(k1, (t_len, p))
        y = (jnp.einsum("tp,tp->t", x, jnp.asarray(beta))
             + sigma * jax.random.normal(k2, (t_len,)))
    else:
        x = jax.random.normal(k1, (t_len, n, p))
        y = (jnp.einsum("tnp,tp->tn", x, jnp.asarray(beta))
             + sigma * jax.random.normal(k2, (t_len, n)))
    return x, y, jnp.asarray(beta)


def _run(model, key, n_iter=300, keep_from=150):
    kern = jax.jit(model.kernel())
    st = model.init_state(key)
    gs, bs = [], []
    for i in range(n_iter):
        st = kern(jax.random.fold_in(key, i), st)
        if i >= keep_from:
            gs.append(np.asarray(st["gamma"]))
            bs.append(np.asarray(st["beta"]))
    return np.stack(gs), np.stack(bs), st


@pytest.mark.slow
def test_dynreg_recovers_entering_exiting_coefficients(rng_key):
    """The VERDICT-2 'Done' criterion: coefficients that enter/exit are
    tracked, spurious predictors are excluded."""
    x, y, beta_true = _simulate(rng_key, t_len=120, n=30)
    model = SparseDynamicRegression(x=x, y=y)
    gs, bs, st = _run(model, jax.random.key(1))
    incl = gs.mean(0)
    beta_est = bs.mean(0)
    # truly active coefficient found everywhere
    assert incl[:, 0].mean() > 0.95, incl[:, 0].mean()
    # entering coefficient found after entry
    assert incl[60:, 1].mean() > 0.95, incl[60:, 1].mean()
    # spurious predictors excluded
    assert incl[:, 2:].mean() < 0.10, incl[:, 2:].mean()
    # coefficient paths tracked
    rmse0 = np.sqrt(np.mean((beta_est[:, 0] - np.asarray(
        beta_true[:, 0])) ** 2))
    assert rmse0 < 0.2, rmse0
    rmse1 = np.sqrt(np.mean((beta_est[60:, 1] - np.asarray(
        beta_true[60:, 1])) ** 2))
    assert rmse1 < 0.2, rmse1
    # residual variance recovered
    assert 0.15 < float(st["sigsq"]) < 0.40, st["sigsq"]


@pytest.mark.slow
def test_dynreg_single_observation_per_time(rng_key):
    """n_t = 1 regime (where the reference's zero-centered local
    approximation breaks; the exact collapsed sampler here stays
    honest)."""
    x, y, beta_true = _simulate(rng_key, t_len=150, n=1, p=6)
    model = SparseDynamicRegression(x=x, y=y)
    gs, bs, st = _run(model, jax.random.key(2), n_iter=400,
                      keep_from=200)
    incl = gs.mean(0)
    assert incl[:, 0].mean() > 0.9
    assert incl[:, 2:].mean() < 0.25, incl[:, 2:].mean()
    beta_est = bs.mean(0)
    rmse0 = np.sqrt(np.mean((beta_est[:, 0] - np.asarray(
        beta_true[:, 0])) ** 2))
    assert rmse0 < 0.45, rmse0


@pytest.mark.slow
def test_dynreg_holdout_prediction(rng_key):
    """Fit on [0, T-h), predict the held-out tail: the dynamic model
    must beat the null (predict-the-mean) predictor."""
    t_len, h, n = 140, 10, 20
    x, y, beta_true = _simulate(rng_key, t_len=t_len, n=n)
    x_tr, y_tr = x[:-h], y[:-h]
    model = SparseDynamicRegression(x=x_tr, y=y_tr)
    _, _, st = _run(model, jax.random.key(3), n_iter=250, keep_from=249)
    # one-draw forecast of the mean path: use predicted coefficients
    preds = []
    for s in range(20):
        yh = model.predict(jax.random.key(100 + s), st, x[-h:, 0, :])
        preds.append(np.asarray(yh))
    pred = np.mean(preds, 0)
    truth = np.asarray(y[-h:, 0])
    rmse = np.sqrt(np.mean((pred - truth) ** 2))
    null = np.sqrt(np.mean((truth - float(jnp.mean(y_tr))) ** 2))
    assert rmse < 0.7 * null, (rmse, null)


def test_dynreg_smoke_ragged(rng_key):
    """Ragged time points via obs_mask compile and stay finite."""
    k1, k2 = jax.random.split(rng_key)
    t_len, n, p = 40, 5, 4
    x = jax.random.normal(k1, (t_len, n, p))
    y = x[..., 0] + 0.5 * jax.random.normal(k2, (t_len, n))
    mask = jnp.arange(n)[None, :] < (2 + jnp.arange(t_len)[:, None] % 3)
    model = SparseDynamicRegression(x=x, y=y, obs_mask=mask)
    st = model.init_state(jax.random.key(1))
    kern = jax.jit(model.kernel())
    for i in range(5):
        st = kern(jax.random.key(10 + i), st)
    for leaf in jax.tree_util.tree_leaves(st):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            assert bool(jnp.all(jnp.isfinite(leaf)))


@pytest.mark.slow
def test_dynreg_api_front_end(rng_key):
    """DynregModel: long-format timestamps in, summaries and forecasts
    out (the reference dynreg.py user path)."""
    from boom_tpu.api import DynregModel

    t_len, n, p = 80, 10, 5
    x, y, beta_true = _simulate(rng_key, t_len=t_len, n=n, p=p)
    # long format
    x_long = np.asarray(x).reshape(t_len * n, p)
    y_long = np.asarray(y).reshape(t_len * n)
    ts = np.repeat(np.arange(t_len), n)
    fit = DynregModel(prior_inclusion_prob=0.2).fit(
        x_long, y_long, timestamps=ts, niter=150, num_chains=2,
        burn=100)
    incl = fit.inclusion_probs()
    assert incl.shape == (t_len, p)
    assert incl[:, 0].mean() > 0.9
    assert incl[:, 2:].mean() < 0.3
    cd = fit.coefficient_draws()
    assert cd.shape[1:] == (t_len, p)
    s = fit.summary()
    assert 0.2 < s["residual_sd_mean"] < 1.0
    pred = fit.predict(np.zeros((4, p)))
    assert pred.shape[-1] == 4
    assert np.all(np.isfinite(np.asarray(pred)))


@pytest.mark.slow
def test_dynreg_parallel_column_moves_match_sequential(rng_key):
    """The batched wide-p column move (column_move_style="parallel")
    must agree in distribution with the exact serial scan on the same
    data — the staleness-exact acceptance rule is a correctness claim,
    not an approximation."""
    x, y, beta_true = _simulate(rng_key, t_len=100, n=20, p=8)
    seq = SparseDynamicRegression(x=x, y=y,
                                  column_move_style="sequential")
    par = SparseDynamicRegression(x=x, y=y, column_move_style="parallel",
                                  column_pass_repeats=3)
    gs_s, bs_s, _ = _run(seq, jax.random.key(1), n_iter=400,
                         keep_from=200)
    gs_p, bs_p, _ = _run(par, jax.random.key(2), n_iter=400,
                         keep_from=200)
    # inclusion probabilities agree
    incl_s = gs_s.mean((0, 1))
    incl_p = gs_p.mean((0, 1))
    assert np.abs(incl_s - incl_p).max() < 0.12, (incl_s, incl_p)
    # active-coefficient paths agree
    err_s = np.abs(bs_s.mean(0) - np.asarray(beta_true))[:, :2].mean()
    err_p = np.abs(bs_p.mean(0) - np.asarray(beta_true))[:, :2].mean()
    assert err_p < max(2.0 * err_s, 0.15), (err_s, err_p)


@pytest.mark.slow
def test_dynreg_wide_p(rng_key):
    """Genuinely wide config (p=120): the parallel column move + the
    red-black pass recover the active set without the serial column
    scan (which would do 3*p sequential T-scans per sweep)."""
    x, y, beta_true = _simulate(rng_key, t_len=80, n=40, p=120)
    model = SparseDynamicRegression(x=x, y=y)  # auto -> parallel
    gs, bs, _ = _run(model, jax.random.key(3), n_iter=250,
                     keep_from=120)
    incl = gs.mean((0, 1))
    assert incl[0] > 0.7, incl[:4]
    assert incl[1] > 0.35, incl[:4]
    assert np.delete(incl, [0, 1]).max() < 0.35, np.sort(incl)[-5:]
    err0 = np.abs(bs.mean(0)[:, 0] - np.asarray(beta_true)[:, 0]).mean()
    assert err0 < 0.4, err0
