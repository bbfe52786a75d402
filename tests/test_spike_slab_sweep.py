"""SWEEP fast path vs masked-Cholesky oracle for SSVS
(boom_tpu/models/glm/regression_sweep.py)."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from boom_tpu.inference import run_mcmc
from boom_tpu.models.glm import SpikeSlabRegression, log_model_prob
from boom_tpu.models.glm.regression_sweep import (
    _flip_deltas,
    _log_model_prob,
    build_sweep_state,
)


def _setup(rng_key, n=60, p=6, b_nonzero=False):
    """b_nonzero: nonzero prior mean on coordinate 0 with forced
    inclusion — the sweep path's supported nonzero-mean case (intercept)."""
    x, y, _ = SpikeSlabRegression.simulate(rng_key, n, p, nonzero=2)
    model = SpikeSlabRegression.from_data(x, y, expected_model_size=2.0)
    if b_nonzero:
        import dataclasses

        prior = model.prior
        mean = jnp.zeros(p).at[0].set(1.3)
        odds = prior.log_inclusion_odds.at[0].set(40.0)
        prior = dataclasses.replace(prior, mean=mean,
                                    log_inclusion_odds=odds)
        model = dataclasses.replace(model, prior=prior)
    return model


def test_sweep_logprob_matches_cholesky_all_masks(rng_key):
    model = _setup(rng_key)
    p = 6
    df = model.suf.n + model.prior.sigma_df
    for bits in itertools.product([False, True], repeat=p):
        mask = jnp.asarray(bits)
        want = float(log_model_prob(model.suf, model.prior, mask))
        st = build_sweep_state(model.suf, model.prior, mask)
        got = float(_log_model_prob(st, df))
        np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-8)


def test_sweep_logprob_matches_with_forced_intercept_mean(rng_key):
    model = _setup(rng_key, b_nonzero=True)
    p = 6
    df = model.suf.n + model.prior.sigma_df
    rng = np.random.default_rng(0)
    for _ in range(20):
        mask = jnp.asarray(rng.random(p) < 0.5).at[0].set(True)
        want = float(log_model_prob(model.suf, model.prior, mask))
        st = build_sweep_state(model.suf, model.prior, mask)
        got = float(_log_model_prob(st, df))
        np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-8)


def test_sweep_invalid_prior_falls_back(rng_key):
    """Nonzero prior mean on a selectable coordinate is detected."""
    import dataclasses

    from boom_tpu.models.glm.regression_sweep import valid_for_prior

    model = _setup(rng_key)
    assert valid_for_prior(model.prior)
    bad = dataclasses.replace(model.prior,
                              mean=model.prior.mean.at[2].set(0.7))
    assert not valid_for_prior(bad)


def test_flip_deltas_match_direct(rng_key):
    model = _setup(rng_key, b_nonzero=True)
    p = 6
    df = model.suf.n + model.prior.sigma_df
    rng = np.random.default_rng(1)
    for _ in range(10):
        mask = jnp.asarray(rng.random(p) < 0.5).at[0].set(True)
        st = build_sweep_state(model.suf, model.prior, mask)
        for j in range(1, p):
            corner, dq, d_ld_a, d_ld_o, d_spike = _flip_deltas(
                st, model.prior, j)
            ss_flip = float(corner + st.q + dq)
            logp_flip = (float(st.spike + d_spike)
                         + 0.5 * float(st.logdet_o + d_ld_o
                                       - st.logdet_a - d_ld_a)
                         - (0.5 * float(df) - 1.0) * np.log(ss_flip))
            flipped = mask.at[j].set(~mask[j])
            want = float(log_model_prob(model.suf, model.prior, flipped))
            np.testing.assert_allclose(logp_flip, want, rtol=1e-7,
                                       atol=1e-7)


def test_sweep_sampler_matches_enumeration(rng_key):
    """The fast sampler's stationary inclusion probabilities match exact
    enumeration (same check as the Cholesky path)."""
    n, p = 50, 4
    x, y, _ = SpikeSlabRegression.simulate(rng_key, n, p, nonzero=2,
                                           sigma=0.5)
    model = SpikeSlabRegression.from_data(x, y, expected_model_size=2.0,
                                          method="sweep")
    masks = jnp.asarray(list(itertools.product([False, True], repeat=p)))
    logps = np.asarray(jax.vmap(
        lambda m: log_model_prob(model.suf, model.prior, m))(masks))
    w = np.exp(logps - logps.max())
    w /= w.sum()
    want_incl = (np.asarray(masks) * w[:, None]).sum(0)

    res = run_mcmc(jax.random.key(5), model.kernel(), model.init_state,
                   num_draws=3000, num_chains=4, burn=300,
                   extract=lambda s: s["gamma"])
    got_incl = np.asarray(res.draws).reshape(-1, p).mean(0)
    np.testing.assert_allclose(got_incl, want_incl, atol=0.03)
