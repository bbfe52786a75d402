"""Categorical HMM and bsts one-step prediction errors / comparison."""

import jax
import jax.numpy as jnp
import numpy as np

from boom_tpu.inference import run_mcmc
from boom_tpu.models.hmm import CategoricalHmm
from boom_tpu.statespace import Bsts, LocalLevel, LocalLinearTrend
from boom_tpu.statespace.bsts import (
    compare_bsts_models,
    one_step_prediction_errors,
)


def test_categorical_hmm_recovers(rng_key):
    trans = jnp.asarray([[0.95, 0.05], [0.1, 0.9]])
    emit = jnp.asarray([[0.7, 0.2, 0.1], [0.1, 0.2, 0.7]])
    y, z = CategoricalHmm.simulate(rng_key, 2000, trans, emit,
                                   jnp.asarray([0.5, 0.5]))
    model = CategoricalHmm(y=y, num_states=2, num_symbols=3)
    res = run_mcmc(jax.random.key(1), model.kernel(), model.init_state,
                   num_draws=300, num_chains=2, burn=100)
    # align labels PER CHAIN (labels switch between chains) by the
    # emission probability of symbol 0
    for c in range(2):
        emit_mean = np.asarray(jnp.mean(res.draws["emit"][c], 0))
        order = np.argsort(-emit_mean[:, 0])
        emit_sorted = emit_mean[order]
        np.testing.assert_allclose(emit_sorted, np.asarray(emit),
                                   atol=0.08)
        trans_mean = np.asarray(jnp.mean(res.draws["trans"][c], 0))
        t_sorted = trans_mean[np.ix_(order, order)]
        np.testing.assert_allclose(np.diag(t_sorted), [0.95, 0.9],
                                   atol=0.05)


def test_one_step_errors_white_noise(rng_key):
    """For a well-specified model the standardized one-step errors should
    be ~ N(0, 1)."""
    k1, k2 = jax.random.split(rng_key)
    t_len = 300
    lvl = jnp.cumsum(0.2 * jax.random.normal(k1, (t_len,)))
    y = lvl + 0.5 * jax.random.normal(k2, (t_len,))
    model = Bsts(y=y, blocks=[LocalLevel.default(y)])
    res = run_mcmc(jax.random.key(1), model.kernel(), model.init_state,
                   num_draws=100, num_chains=2, burn=100)
    flat = res.stacked()
    sub = jax.tree_util.tree_map(lambda a: a[-40:], flat)
    errs = one_step_prediction_errors(model, sub)
    assert errs.shape == (40, t_len)
    # skip the diffuse-initialization transient
    e = np.asarray(errs[:, 20:])
    assert abs(e.mean()) < 0.15, e.mean()
    assert 0.8 < e.std() < 1.25, e.std()


def test_compare_bsts_models(rng_key):
    """A local-level fit of trending data should accumulate larger
    one-step errors than a local-linear-trend fit."""
    k1, k2 = jax.random.split(rng_key)
    t_len = 250
    slope_path = jnp.cumsum(0.02 * jax.random.normal(k1, (t_len,))) + 0.5
    y = jnp.cumsum(slope_path) + 0.5 * jax.random.normal(k2, (t_len,))
    m_ll = Bsts(y=y, blocks=[LocalLevel.default(y)])
    m_llt = Bsts(y=y, blocks=[LocalLinearTrend.default(y)])
    r_ll = run_mcmc(jax.random.key(1), m_ll.kernel(), m_ll.init_state,
                    num_draws=80, num_chains=2, burn=80)
    r_llt = run_mcmc(jax.random.key(2), m_llt.kernel(), m_llt.init_state,
                     num_draws=80, num_chains=2, burn=80)
    cum = compare_bsts_models(
        {"local_level": (m_ll, r_ll), "llt": (m_llt, r_llt)},
        max_draws=20)
    assert float(cum["local_level"][-1]) > float(cum["llt"][-1])


def test_holdout_errors_are_one_step(rng_key):
    """Reference semantics (StateSpaceModel.cpp:212): the holdout filter
    ASSIMILATES each post-cutpoint observation, so for a well-specified
    model the standardized holdout errors remain ~N(0,1) white noise and
    do NOT grow with the forecast horizon. Under the old frozen-filter
    (cumulative multi-step) semantics their scale grows like sqrt(h),
    which this test rejects."""
    from boom_tpu.statespace.bsts import holdout_prediction_errors

    k1, k2 = jax.random.split(rng_key)
    t_len, cut = 400, 300
    lvl = jnp.cumsum(0.25 * jax.random.normal(k1, (t_len,)))
    y = lvl + 0.6 * jax.random.normal(k2, (t_len,))
    model = Bsts(y=y, blocks=[LocalLevel.default(y)])
    errs = holdout_prediction_errors(
        model, jax.random.key(3), cut, num_draws=80, num_chains=2,
        burn=80, max_draws=20)
    assert errs.shape == (20, t_len)
    hold = np.asarray(errs[:, cut:])
    assert abs(hold.mean()) < 0.25, hold.mean()
    assert 0.75 < hold.std() < 1.35, hold.std()
    # one-step semantics: error magnitude must not grow with horizon
    early = np.abs(hold[:, :50]).mean()
    late = np.abs(hold[:, 50:]).mean()
    assert late < 1.5 * early, (early, late)
