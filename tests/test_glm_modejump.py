"""The independence-MH mode-jump move on gamma (round 5, VERDICT r4
item 5): exactness against enumeration and escape from the null-model
basin that trapped a few percent of chains at 4096-chain bench scale
(PERF.md section 3: R-hat 1.80 from a high-sigsq empty-model mode)."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from boom_tpu.inference import run_mcmc
from boom_tpu.models.glm import SpikeSlabRegression, log_model_prob
from boom_tpu.models.glm.regression import (
    mode_jump_move,
    screening_proposal_probs,
)


def test_mode_jump_preserves_exact_posterior(rng_key):
    """With the mode-jump move in the kernel, marginal inclusion
    probabilities must still match exact 2^p enumeration — the move is
    exact MH on the collapsed target, not an approximation."""
    n, p = 60, 4
    x, y, _ = SpikeSlabRegression.simulate(rng_key, n, p, nonzero=2,
                                           sigma=0.5)
    model = SpikeSlabRegression.from_data(x, y, expected_model_size=2.0,
                                          mode_jump=True)
    masks = jnp.asarray(list(itertools.product([False, True], repeat=p)))
    logps = np.asarray(jax.vmap(
        lambda m: log_model_prob(model.suf, model.prior, m))(masks))
    w = np.exp(logps - logps.max())
    w /= w.sum()
    want_incl = (np.asarray(masks) * w[:, None]).sum(0)

    res = run_mcmc(jax.random.key(11), model.kernel(), model.init_state,
                   num_draws=3000, num_chains=4, burn=300,
                   extract=lambda s: s["gamma"])
    got_incl = np.asarray(res.draws).reshape(-1, p).mean(0)
    np.testing.assert_allclose(got_incl, want_incl, atol=0.03)


def test_mode_jump_escapes_null_basin(rng_key):
    """Chains started AT the empty model with inflated sigsq (the stuck
    basin) must reach the true model within a few sweeps when the mode
    jump is on. Without it, single flips out of the null basin are
    individually unlikely at this signal strength; this is the 4096-
    chain pathology in miniature."""
    n, p, nonzero = 2000, 50, 8
    x, y, _ = SpikeSlabRegression.simulate(rng_key, n, p, nonzero,
                                           sigma=1.0)
    model = SpikeSlabRegression.from_data(x, y, expected_model_size=10.0,
                                          mode_jump=True)

    def null_init(key):
        st = model.init_state(key)
        return {"gamma": jnp.zeros(p, bool),
                "beta": jnp.zeros_like(st["beta"]),
                "sigsq": jnp.asarray(float(np.var(np.asarray(y))))}

    res = run_mcmc(jax.random.key(5), model.kernel(), null_init,
                   num_draws=10, num_chains=32, burn=0,
                   extract=lambda s: s["gamma"])
    gamma = np.asarray(res.draws)  # [draws, chains, p]
    # by draw 10 every chain has found (most of) the true support
    final_hits = gamma[-1, :, :nonzero].sum(-1)
    assert (final_hits >= nonzero - 1).all(), final_hits


def test_screening_probs_separate_signal_from_noise(rng_key):
    n, p, nonzero = 2000, 50, 8
    x, y, _ = SpikeSlabRegression.simulate(rng_key, n, p, nonzero,
                                           sigma=1.0)
    model = SpikeSlabRegression.from_data(x, y)
    q = np.asarray(screening_proposal_probs(model.suf, model.prior))
    assert (q[:nonzero] > 0.9).all(), q[:nonzero]
    assert np.median(q[nonzero:]) < 0.1


def test_mode_jump_move_is_a_valid_update(rng_key):
    """Shape/dtype sanity + the move never produces an out-of-support
    mask (max_size respected via -inf spike_logp)."""
    n, p = 200, 12
    x, y, _ = SpikeSlabRegression.simulate(rng_key, n, p, 3, sigma=1.0)
    model = SpikeSlabRegression.from_data(x, y, expected_model_size=3.0)
    q = screening_proposal_probs(model.suf, model.prior)
    mask = jnp.zeros(p, bool).at[0].set(True)
    out = mode_jump_move(jax.random.key(2), model.suf, model.prior,
                         mask, q)
    assert out.shape == (p,) and out.dtype == jnp.bool_


def test_kv_mode_jump_logit_preserves_recovery(rng_key):
    """The known-variance-engine mode jump (default ON for LogitSpike-
    Slab, r5): the composite must still recover sparse truth, and the
    jump must rescue chains started at the empty model."""
    from boom_tpu.models.glm.logit import LogitSpikeSlab

    n, p, nonzero = 1500, 12, 3
    x, y, beta_true = LogitSpikeSlab.simulate(rng_key, n, p, nonzero,
                                              beta_scale=2.0)
    model = LogitSpikeSlab.from_data(x, y, expected_model_size=4.0)
    assert model.mode_jump

    def null_init(key):
        st = model.init_state(key)
        return {"gamma": jnp.zeros(p, bool),
                "beta": jnp.zeros_like(st["beta"])}

    res = run_mcmc(jax.random.key(21), model.kernel(), null_init,
                   num_draws=200, num_chains=4, burn=100,
                   extract=lambda s: s["gamma"])
    incl = np.asarray(res.draws).reshape(-1, p).mean(0)
    assert (incl[:nonzero] > 0.8).all(), incl
    assert np.median(incl[nonzero:]) < 0.3, incl
