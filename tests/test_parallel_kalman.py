"""Associative-scan Kalman vs the sequential oracle (exact equivalence)."""

import jax
import jax.numpy as jnp
import numpy as np

from boom_tpu.statespace.kalman import (
    SsmParams,
    kalman_filter,
    simulation_smoother,
    smooth_states,
)
from boom_tpu.statespace.parallel_kalman import (
    parallel_filter_moments,
    parallel_simulate,
    parallel_simulation_smoother,
    parallel_smooth_states,
)


def _params(seed=0, d=3):
    rng = np.random.default_rng(seed)
    z = jnp.asarray(rng.normal(size=d))
    raw = rng.normal(size=(d, d)) * 0.4
    t_mat = jnp.asarray(raw / max(1.0, 1.1 * np.max(np.abs(
        np.linalg.eigvals(raw)))))
    r_mat = jnp.asarray(rng.normal(size=(d, 2)))
    q0 = rng.normal(size=(2, 2))
    q_mat = jnp.asarray(q0 @ q0.T + 0.5 * np.eye(2))
    p0r = rng.normal(size=(d, d))
    return SsmParams(
        z=z, t_mat=t_mat, r_mat=r_mat, q_mat=q_mat,
        h=jnp.asarray(0.8),
        a0=jnp.asarray(rng.normal(size=d)),
        p0=jnp.asarray(p0r @ p0r.T + np.eye(d)))


def test_parallel_filter_matches_sequential():
    params = _params()
    rng = np.random.default_rng(1)
    y = jnp.asarray(rng.normal(size=40))
    filt = kalman_filter(params, y)
    fm, fp = parallel_filter_moments(params, y)
    # sequential filter stores predicted moments; filtered are
    # m_t = a_t + P_t Z v_t / F_t
    for t in range(40):
        m_seq = filt.a[t] + filt.p[t] @ params.z * (filt.v[t] / filt.f[t])
        np.testing.assert_allclose(np.asarray(fm[t]), np.asarray(m_seq),
                                   rtol=1e-8, atol=1e-10)
    # filtered covariance check at a few points
    for t in [0, 7, 39]:
        p_seq = filt.p[t] - jnp.outer(filt.p[t] @ params.z,
                                      filt.p[t] @ params.z) / filt.f[t]
        np.testing.assert_allclose(np.asarray(fp[t]), np.asarray(p_seq),
                                   rtol=1e-7, atol=1e-9)


def test_parallel_filter_with_missing():
    params = _params(2)
    rng = np.random.default_rng(3)
    y = jnp.asarray(rng.normal(size=30))
    obs = np.ones(30, bool)
    obs[[0, 5, 6, 29]] = False
    filt = kalman_filter(params, y, jnp.asarray(obs))
    fm, _ = parallel_filter_moments(params, y, jnp.asarray(obs))
    for t in range(30):
        if obs[t]:
            m_seq = filt.a[t] + filt.p[t] @ params.z * (
                filt.v[t] / filt.f[t])
        else:
            m_seq = filt.a[t]
        np.testing.assert_allclose(np.asarray(fm[t]), np.asarray(m_seq),
                                   rtol=1e-7, atol=1e-9)


def test_parallel_smoother_matches_sequential():
    params = _params(4)
    rng = np.random.default_rng(5)
    y = jnp.asarray(rng.normal(size=50))
    want = np.asarray(smooth_states(params, y))
    got = np.asarray(parallel_smooth_states(params, y))
    np.testing.assert_allclose(got, want, rtol=1e-7, atol=1e-8)


def test_parallel_smoother_missing():
    params = _params(6)
    rng = np.random.default_rng(7)
    y = jnp.asarray(rng.normal(size=35))
    obs = np.ones(35, bool)
    obs[10:15] = False
    want = np.asarray(smooth_states(params, y, jnp.asarray(obs)))
    got = np.asarray(parallel_smooth_states(params, y, jnp.asarray(obs)))
    np.testing.assert_allclose(got, want, rtol=1e-7, atol=1e-8)


def test_parallel_simulate_same_distribution(rng_key):
    """Same key => identical draw structure is not required, but the
    distribution must match the sequential simulator's moments."""
    params = _params(8)
    t_len = 12
    from boom_tpu.statespace.kalman import simulate

    seq = jax.vmap(lambda k: simulate(k, params, t_len)[0])(
        jax.random.split(rng_key, 60_000))
    par = jax.vmap(lambda k: parallel_simulate(k, params, t_len)[0])(
        jax.random.split(jax.random.fold_in(rng_key, 1), 60_000))
    np.testing.assert_allclose(np.asarray(seq.mean(0)),
                               np.asarray(par.mean(0)), atol=0.04)
    for t in [0, 5, 11]:
        np.testing.assert_allclose(
            np.cov(np.asarray(seq[:, t]).T),
            np.cov(np.asarray(par[:, t]).T), atol=0.08, rtol=0.05)


def test_parallel_simulation_smoother_moments(rng_key):
    """Parallel DK draws match the sequential DK draws in distribution."""
    params = _params(9, d=2)
    rng = np.random.default_rng(10)
    y = jnp.asarray(rng.normal(size=10))
    seq = jax.vmap(lambda k: simulation_smoother(k, params, y))(
        jax.random.split(rng_key, 40_000))
    par = jax.vmap(lambda k: parallel_simulation_smoother(k, params, y))(
        jax.random.split(jax.random.fold_in(rng_key, 2), 40_000))
    np.testing.assert_allclose(np.asarray(seq.mean(0)),
                               np.asarray(par.mean(0)), atol=0.03)
    np.testing.assert_allclose(np.asarray(seq.std(0)),
                               np.asarray(par.std(0)), atol=0.03)
