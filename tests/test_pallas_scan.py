"""Pallas in-VMEM scan vs the associative-scan / sequential oracles.

On CPU the kernel runs in Pallas interpreter mode (bit-accurate semantics,
slow) — sizes here are kept small; the TPU performance claim is covered by
the bench.py long-series diagnostic (2.7-19x over the sequential scan at
T=512-4096, 1-8 chains, measured on v5e).
"""

import jax
import jax.numpy as jnp
import numpy as np

from boom_tpu.statespace import pallas_scan as ps
from boom_tpu.statespace import parallel_kalman as pk
from boom_tpu.statespace.bsts import Bsts
from boom_tpu.statespace.kalman import (
    SsmParams,
    simulation_smoother,
    smooth_states,
)
from boom_tpu.statespace.state_models import LocalLinearTrend


def _params(seed=0, d=2):
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
        z=z, t_mat=t_mat, r_mat=r_mat, q_mat=q_mat, h=jnp.asarray(0.8),
        a0=jnp.asarray(rng.normal(size=d)),
        p0=jnp.asarray(p0r @ p0r.T + np.eye(d)))


def test_pallas_filter_smoother_match_oracles():
    params = _params(0, d=2)
    rng = np.random.default_rng(1)
    t_len = 140  # not a multiple of 128: exercises lane padding
    y = jnp.asarray(rng.normal(size=t_len))
    fm0, fp0 = pk.parallel_filter_moments(params, y)
    fm1, fp1 = ps.pallas_filter_moments(params, y)
    np.testing.assert_allclose(np.asarray(fm1), np.asarray(fm0),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(fp1), np.asarray(fp0),
                               rtol=1e-9, atol=1e-11)
    s_seq = smooth_states(params, y)
    s_pal = ps.pallas_smooth_states(params, y)
    np.testing.assert_allclose(np.asarray(s_pal), np.asarray(s_seq),
                               rtol=1e-7, atol=1e-9)


def test_pallas_missing_observations():
    params = _params(2, d=3)
    rng = np.random.default_rng(3)
    y = jnp.asarray(rng.normal(size=90))
    obs = jnp.asarray(rng.random(90) > 0.3)
    s0 = pk.parallel_smooth_states(params, y, obs)
    s1 = ps.pallas_smooth_states(params, y, obs)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0),
                               rtol=1e-9, atol=1e-11)


def test_pallas_simulation_smoother_matches_and_vmaps():
    params = _params(4, d=2)
    rng = np.random.default_rng(5)
    y = jnp.asarray(rng.normal(size=100))
    key = jax.random.key(7)
    d0 = pk.parallel_simulation_smoother(key, params, y)
    d1 = ps.pallas_simulation_smoother(key, params, y)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d0),
                               rtol=1e-9, atol=1e-11)
    # vmap over chains: pallas_call batches over a leading grid dim
    ks = jax.random.split(key, 3)
    dv = jax.vmap(lambda k: ps.pallas_simulation_smoother(k, params, y))(ks)
    dref = jnp.stack(
        [pk.parallel_simulation_smoother(k, params, y) for k in ks])
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dref),
                               rtol=1e-9, atol=1e-11)


def test_bsts_smoother_dispatch():
    rng = np.random.default_rng(0)
    y = jnp.asarray(np.cumsum(rng.normal(size=600)) + rng.normal(size=600))
    model = Bsts(y=y, blocks=[LocalLinearTrend.default(y)])
    static = model.ssm_params(model.init_state(jax.random.key(0)))
    # auto on CPU -> sequential (pallas is TPU-only by dispatch)
    assert model._smoother(static) is simulation_smoother
    forced = Bsts(y=y, blocks=[LocalLinearTrend.default(y)],
                  parallel_smoother="pallas")
    assert forced._smoother(static) is ps.pallas_simulation_smoother
    xla = Bsts(y=y, blocks=[LocalLinearTrend.default(y)],
               parallel_smoother=True)
    assert xla._smoother(static) is pk.parallel_simulation_smoother
    seq = Bsts(y=y, blocks=[LocalLinearTrend.default(y)],
               parallel_smoother=False)
    assert seq._smoother(static) is simulation_smoother
    # time-varying systems always take the sequential path
    tv = static._replace(h=jnp.full((600,), 0.5))
    assert forced._smoother(tv) is simulation_smoother
