"""Cross-device time-axis sharding of the Kalman filter/smoother
(SURVEY §2.8 sequence parallelism): the block associative scan over the
8-device virtual mesh must reproduce the single-device filter to float
tolerance."""

import jax
import jax.numpy as jnp
import numpy as np

from boom_tpu.parallel.mesh import make_mesh
from boom_tpu.parallel.time_sharded import (
    sharded_filter_moments,
    sharded_smooth_states,
)
from boom_tpu.statespace import kalman
from boom_tpu.statespace.parallel_kalman import (
    parallel_filter_moments,
    parallel_smooth_states,
)


def _llt_params(dtype=jnp.float64):
    """Local linear trend, d=2."""
    t_mat = jnp.asarray([[1.0, 1.0], [0.0, 1.0]], dtype)
    z = jnp.asarray([1.0, 0.0], dtype)
    r_mat = jnp.eye(2, dtype=dtype)
    q_mat = jnp.diag(jnp.asarray([0.05, 0.01], dtype))
    return kalman.SsmParams(
        t_mat=t_mat, z=z, r_mat=r_mat, q_mat=q_mat,
        h=jnp.asarray(0.5, dtype),
        a0=jnp.zeros(2, dtype),
        p0=jnp.eye(2, dtype=dtype) * 10.0)


def _series(key, t_len):
    params = _llt_params()
    alpha, y = kalman.simulate(key, params, t_len)
    return params, y


def test_sharded_filter_matches_single_device(rng_key):
    t_len = 512
    params, y = _series(rng_key, t_len)
    observed = jnp.ones(t_len, bool)
    mesh = make_mesh({"time": 8})

    m_sh, p_sh = sharded_filter_moments(params, y, observed, mesh)
    m_ref, p_ref = parallel_filter_moments(params, y, observed)
    np.testing.assert_allclose(np.asarray(m_sh), np.asarray(m_ref),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(p_sh), np.asarray(p_ref),
                               atol=1e-10)


def test_sharded_filter_with_missing(rng_key):
    t_len = 256
    params, y = _series(rng_key, t_len)
    observed = jnp.arange(t_len) % 7 != 3  # scattered missing
    mesh = make_mesh({"time": 8})

    m_sh, _ = sharded_filter_moments(params, y, observed, mesh)
    m_ref, _ = parallel_filter_moments(params, y, observed)
    np.testing.assert_allclose(np.asarray(m_sh), np.asarray(m_ref),
                               atol=1e-10)


def test_sharded_smoother_matches_single_device(rng_key):
    t_len = 512
    params, y = _series(rng_key, t_len)
    observed = jnp.ones(t_len, bool)
    mesh = make_mesh({"time": 8})

    sm_sh = sharded_smooth_states(params, y, observed, mesh)
    sm_ref = parallel_smooth_states(params, y, observed)
    np.testing.assert_allclose(np.asarray(sm_sh), np.asarray(sm_ref),
                               atol=1e-9)
    # and against the classical sequential smoother
    sm_seq = kalman.smooth_states(params, y)
    np.testing.assert_allclose(np.asarray(sm_sh), np.asarray(sm_seq),
                               atol=1e-7)
