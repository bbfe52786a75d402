"""float32 robustness tier (-m f32): the five BASELINE.md correctness
configs run in float32 with R-hat gates.

Rationale: on-TPU everything is float32, but the statistical suites run
in float64 (conftest). Round 1's bench failure was an f32-only stuck
sampler (bench.py config history), guarded until now only by the bench
gate. These tests feed float32 data through the same five configs on
the CPU backend with x64 DISABLED (set BOOM_TPU_F32_TIER=1; conftest
then skips enabling x64) so every kernel executes in exactly the f32
numerics the TPU uses, and gate on convergence + interior posteriors.

Run with:  BOOM_TPU_F32_TIER=1 python -m pytest tests -m f32 -q
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from boom_tpu.inference import diagnostics, run_mcmc

import os

pytestmark = [
    pytest.mark.f32,
    pytest.mark.slow,
    pytest.mark.skipif(
        os.environ.get("BOOM_TPU_F32_TIER", "") != "1",
        reason="run with BOOM_TPU_F32_TIER=1 (x64 disabled) for true "
               "f32 numerics: BOOM_TPU_F32_TIER=1 pytest -m f32"),
]

F32 = jnp.float32


def _gate(draws_dict, threshold=1.05):
    mon = jnp.stack(
        [jnp.asarray(v).reshape(v.shape[0], v.shape[1], -1).mean(-1)
         for v in draws_dict.values()], axis=-1)
    r = np.asarray(diagnostics.potential_scale_reduction(mon))
    assert np.max(r) < threshold, r
    return r


def _assert_f32(tree):
    for leaf in jax.tree_util.tree_leaves(tree):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32, leaf.dtype


def test_f32_beta_binomial():
    from boom_tpu.models.beta_binomial import BetaBinomialModel

    key = jax.random.key(0)
    trials = jnp.full((500,), 30, jnp.int32)
    y = jax.random.binomial(key, trials.astype(F32),
                            jnp.asarray(0.3, F32)).astype(jnp.int32)
    model = BetaBinomialModel(successes=y, trials=trials)
    res = run_mcmc(jax.random.key(1), model.kernel(),
                   lambda k: jax.tree_util.tree_map(
                       lambda a: jnp.asarray(a, F32)
                       if jnp.issubdtype(a.dtype, jnp.floating) else a,
                       model.init_state(k)),
                   num_draws=400, num_chains=4, burn=200)
    _assert_f32(res.final_state)
    _gate({"prob": res.draws["prob"][..., None],
           "size": res.draws["size"][..., None]})
    assert abs(np.asarray(res.draws["prob"]).mean() - 0.3) < 0.05


def test_f32_spike_slab():
    from boom_tpu.models.glm import SpikeSlabRegression

    x, y, beta = SpikeSlabRegression.simulate(
        jax.random.key(2), 1500, 30, 5, sigma=1.0)
    model = SpikeSlabRegression.from_data(
        jnp.asarray(x, F32), jnp.asarray(y, F32),
        expected_model_size=6.0)
    res = run_mcmc(jax.random.key(3), model.kernel(), model.init_state,
                   num_draws=300, num_chains=4, burn=100)
    _assert_f32(res.final_state)
    _gate({"sigsq": res.draws["sigsq"][..., None]})
    incl = np.asarray(res.draws["gamma"]).reshape(-1, 30).mean(0)
    assert incl[:5].min() > 0.8


def test_f32_finite_mixture():
    from boom_tpu.models.mixtures import GaussianMixtureModel

    key = jax.random.key(4)
    y = jnp.concatenate([
        -2.0 + 0.7 * jax.random.normal(key, (400,)),
        2.0 + 0.7 * jax.random.normal(jax.random.fold_in(key, 1),
                                      (400,))]).astype(F32)
    model = GaussianMixtureModel(y=y, num_components=2)
    res = run_mcmc(jax.random.key(5), model.kernel(), model.init_state,
                   num_draws=400, num_chains=4, burn=200)
    _assert_f32(res.final_state)
    mu_sorted = jnp.sort(res.draws["mu"], axis=-1)
    _gate({"mu": mu_sorted})
    m = np.asarray(mu_sorted).reshape(-1, 2).mean(0)
    assert abs(m[0] + 2.0) < 0.3 and abs(m[1] - 2.0) < 0.3


def test_f32_gaussian_hmm():
    from boom_tpu.models.hmm import GaussianHmm

    key = jax.random.key(6)
    t_len = 600
    z = (jnp.cumsum(jax.random.bernoulli(
        key, 0.05, (t_len,)).astype(jnp.int32)) % 2)
    y = (jnp.where(z == 0, -1.5, 1.5)
         + 0.6 * jax.random.normal(jax.random.fold_in(key, 1),
                                   (t_len,))).astype(F32)
    model = GaussianHmm(y=y, num_states=2)
    res = run_mcmc(jax.random.key(7), model.kernel(), model.init_state,
                   num_draws=400, num_chains=4, burn=200)
    _assert_f32(res.final_state)
    mu_sorted = jnp.sort(res.draws["mu"], axis=-1)
    _gate({"mu": mu_sorted})
    m = np.asarray(mu_sorted).reshape(-1, 2).mean(0)
    assert abs(m[0] + 1.5) < 0.4 and abs(m[1] - 1.5) < 0.4


def test_f32_bsts_llt_seasonal_spike():
    """Config #5 in the r01-failure regime: f32 bsts with the TIM
    marginal move; gates that no variance collapses to its
    initialization (the r01 stuck-sampler mode)."""
    from boom_tpu.models.glm import SpikeSlabPrior
    from boom_tpu.statespace import Bsts, LocalLinearTrend, Seasonal

    key = jax.random.key(8)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    t_len = 300
    slope = jnp.cumsum(0.02 * jax.random.normal(k3, (t_len,)))
    level = jnp.cumsum(slope + 0.3 * jax.random.normal(k1, (t_len,)))
    season = jnp.tile(jnp.asarray([1.5, -0.5, 0.5, -1.5]), t_len // 4)
    x = jax.random.normal(k4, (t_len, 3))
    beta = jnp.asarray([2.0, 0.0, 0.0])
    y = (level + season + x @ beta
         + 0.5 * jax.random.normal(k2, (t_len,))).astype(F32)
    x = jnp.asarray(x, F32)
    model = Bsts(
        y=y,
        blocks=[LocalLinearTrend.default(y), Seasonal.default(y, 4)],
        predictors=x,
        reg_prior=SpikeSlabPrior.from_data(x, y,
                                           expected_model_size=2.0),
        marginal_sigma_slice=True)
    # draws/burn 400/400 -> 500/600 (r5): the level-variance R-hat sat
    # at 1.03-1.07 across seeds at the old budget (the f32 rounding
    # changes from the r5 gated-flip sweep moved this config from 1.04
    # to 1.07 — seed-level noise around the 1.05 gate, not a mixing
    # change); the longer budget keeps the SAME gate while taking the
    # marginal config out of the noise band.
    res = run_mcmc(jax.random.key(9), model.kernel(), model.init_state,
                   num_draws=500, num_chains=8, burn=600,
                   extract=lambda s: {
                       "so": s["sigsq_obs"],
                       "lvl": s["blocks"]["trend"]["sigma_level_sq"],
                       "gamma": s["gamma"]})
    _assert_f32(res.final_state)
    _gate({"so": res.draws["so"][..., None],
           "lvl": jnp.sqrt(res.draws["lvl"])[..., None]})
    so = np.sqrt(np.asarray(res.draws["so"]))
    # interior, not stuck at initialization scale
    assert 0.2 < so.mean() < 1.2, so.mean()
    incl = np.asarray(res.draws["gamma"]).reshape(-1, 3).mean(0)
    assert incl[0] > 0.8, incl
