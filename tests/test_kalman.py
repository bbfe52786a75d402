"""Kalman filter / smoother / simulation smoother vs brute-force joint
Gaussian (the filter is exact, so we can verify against dense formulas on
short series). Reference: Models/StateSpace/Filters tests."""

import jax
import jax.numpy as jnp
import numpy as np

from boom_tpu.statespace.kalman import (
    SsmParams,
    kalman_filter,
    simulate,
    simulation_smoother,
    smooth_states,
)


def _llt_params(dtype=jnp.float64):
    """Local linear trend: state = (level, slope)."""
    z = jnp.asarray([1.0, 0.0], dtype)
    t_mat = jnp.asarray([[1.0, 1.0], [0.0, 1.0]], dtype)
    r_mat = jnp.eye(2, dtype=dtype)
    q_mat = jnp.diag(jnp.asarray([0.3, 0.05], dtype))
    return SsmParams(z=z, t_mat=t_mat, r_mat=r_mat, q_mat=q_mat,
                     h=jnp.asarray(0.7, dtype),
                     a0=jnp.asarray([1.0, 0.2], dtype),
                     p0=jnp.diag(jnp.asarray([2.0, 1.0], dtype)))


def _dense_joint(params, t_len):
    """Dense mean/cov of (alpha_{1:T}, y_{1:T}) by direct propagation."""
    d = params.z.shape[0]
    tm = np.asarray(params.t_mat)
    rqr = np.asarray(params.r_mat @ params.q_mat @ params.r_mat.T)
    z = np.asarray(params.z)
    h = float(params.h)

    # joint of alpha: mean and cov via state recursion
    mean_a = np.zeros((t_len, d))
    mean_a[0] = np.asarray(params.a0)
    for t in range(1, t_len):
        mean_a[t] = tm @ mean_a[t - 1]
    cov_a = np.zeros((t_len, t_len, d, d))
    cov_a[0, 0] = np.asarray(params.p0)
    for t in range(1, t_len):
        cov_a[t, t] = tm @ cov_a[t - 1, t - 1] @ tm.T + rqr
    for t in range(t_len):
        for s in range(t + 1, t_len):
            cov_a[t, s] = cov_a[t, s - 1] @ tm.T
            cov_a[s, t] = cov_a[t, s].T

    # y = Z alpha + eps
    mean_y = mean_a @ z
    cov_y = np.einsum("i,tsij,j->ts", z, cov_a, z) + h * np.eye(t_len)
    cov_ay = np.einsum("tsij,j->tsi", cov_a, z)  # cov(alpha_t, y_s)
    return mean_a, cov_a, mean_y, cov_y, cov_ay


def test_loglik_matches_dense():
    params = _llt_params()
    t_len = 8
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(size=t_len) + np.arange(t_len) * 0.2)
    filt = kalman_filter(params, y)
    _, _, mean_y, cov_y, _ = _dense_joint(params, t_len)
    from scipy.stats import multivariate_normal

    want = multivariate_normal(mean_y, cov_y).logpdf(np.asarray(y))
    np.testing.assert_allclose(float(filt.loglik), want, rtol=1e-10)


def test_smoother_matches_dense_conditional():
    params = _llt_params()
    t_len = 8
    rng = np.random.default_rng(1)
    y = np.asarray(rng.normal(size=t_len) + np.arange(t_len) * 0.3)
    alpha_hat = np.asarray(smooth_states(params, jnp.asarray(y)))
    mean_a, _, mean_y, cov_y, cov_ay = _dense_joint(params, t_len)
    for t in range(t_len):
        want = mean_a[t] + cov_ay[t].T @ np.linalg.solve(cov_y, y - mean_y)
        np.testing.assert_allclose(alpha_hat[t], want, rtol=1e-8,
                                   atol=1e-10)


def test_missing_observations():
    params = _llt_params()
    t_len = 8
    rng = np.random.default_rng(2)
    y = np.asarray(rng.normal(size=t_len))
    obs = np.ones(t_len, bool)
    obs[3] = obs[6] = False
    filt = kalman_filter(params, jnp.asarray(y), jnp.asarray(obs))
    # dense: drop missing rows
    _, _, mean_y, cov_y, cov_ay = _dense_joint(params, t_len)
    keep = np.where(obs)[0]
    from scipy.stats import multivariate_normal

    want = multivariate_normal(
        mean_y[keep], cov_y[np.ix_(keep, keep)]).logpdf(y[keep])
    np.testing.assert_allclose(float(filt.loglik), want, rtol=1e-10)
    # smoother conditions only on observed entries
    alpha_hat = np.asarray(smooth_states(params, jnp.asarray(y),
                                         jnp.asarray(obs)))
    mean_a = _dense_joint(params, t_len)[0]
    for t in range(t_len):
        want_t = mean_a[t] + cov_ay[t][keep].T @ np.linalg.solve(
            cov_y[np.ix_(keep, keep)], y[keep] - mean_y[keep])
        np.testing.assert_allclose(alpha_hat[t], want_t, rtol=1e-8,
                                   atol=1e-10)


def test_simulation_smoother_moments(rng_key):
    """Draws from the simulation smoother have the exact conditional mean
    and variance (checked by Monte Carlo against dense formulas)."""
    params = _llt_params()
    t_len = 6
    rng = np.random.default_rng(3)
    y = np.asarray(rng.normal(size=t_len) + 1.0)
    draws = jax.vmap(
        lambda k: simulation_smoother(k, params, jnp.asarray(y)))(
        jax.random.split(rng_key, 60_000))
    draws = np.asarray(draws)  # [n, T, 2]

    mean_a, cov_a, mean_y, cov_y, cov_ay = _dense_joint(params, t_len)
    for t in range(t_len):
        want_mean = mean_a[t] + cov_ay[t].T @ np.linalg.solve(
            cov_y, y - mean_y)
        np.testing.assert_allclose(draws[:, t].mean(0), want_mean,
                                   atol=0.02)
        want_cov = cov_a[t, t] - cov_ay[t].T @ np.linalg.solve(
            cov_y, cov_ay[t])
        np.testing.assert_allclose(np.cov(draws[:, t].T), want_cov,
                                   atol=0.02)


def test_simulate_moments(rng_key):
    params = _llt_params()
    t_len = 5
    alphas, ys = jax.vmap(lambda k: simulate(k, params, t_len))(
        jax.random.split(rng_key, 100_000))
    mean_a, cov_a, mean_y, cov_y, _ = _dense_joint(params, t_len)
    np.testing.assert_allclose(np.asarray(alphas).mean(0), mean_a,
                               atol=0.03)
    np.testing.assert_allclose(np.asarray(ys).var(0), np.diag(cov_y),
                               rtol=0.03)


def test_mm_dispatch_large_d_equivalence():
    """The MXU dot path (d >= _MXU_DISPATCH_D) must agree with the
    elementwise VPU form used below the crossover."""
    import jax

    from boom_tpu.statespace import kalman as K

    key = jax.random.key(3)
    d = K._MXU_DISPATCH_D + 8
    a = jax.random.normal(key, (5, d, d))
    b = jax.random.normal(jax.random.fold_in(key, 1), (5, d, d))
    v = jax.random.normal(jax.random.fold_in(key, 2), (5, d))
    elem_mm = jnp.sum(a[..., :, :, None] * b[..., None, :, :], axis=-2)
    elem_mv = jnp.sum(a * v[..., None, :], axis=-1)
    np.testing.assert_allclose(np.asarray(K._mm(a, b)),
                               np.asarray(elem_mm), atol=1e-10)
    np.testing.assert_allclose(np.asarray(K._mv(a, v)),
                               np.asarray(elem_mv), atol=1e-10)
