"""End-to-end config #1 (BASELINE.md): Beta-Binomial, 4 chains, jitted.

Simulate from known (a, b), run the full vmapped Gibbs/slice program, check
coverage (reference regression test style, e.g.
Models/tests/beta_binomial_test.cc) and agreement with the analytic
posterior computed by dense numerical integration (our stand-in for
"matches BOOM within Monte-Carlo error": both samplers target the same
posterior; the quadrature is exact to ~1e-10)."""

import jax
import jax.numpy as jnp
import numpy as np

from boom_tpu import dists, testing
from boom_tpu.inference import ess, rhat, run_mcmc
from boom_tpu.models import BetaBinomialModel

TRUE_A, TRUE_B = 6.0, 14.0  # prob = 0.3, size = 20


def _fit(num_groups=200, trials=25, num_draws=2000, burn=500, chains=4):
    key = jax.random.key(42)
    k_sim, k_run = jax.random.split(key)
    n, y = BetaBinomialModel.simulate(k_sim, num_groups, trials, TRUE_A,
                                      TRUE_B)
    model = BetaBinomialModel(trials=n, successes=y)
    res = run_mcmc(
        k_run, model.kernel(), model.init_state, num_draws,
        num_chains=chains, burn=burn,
        extract=lambda s: {"prob": s["prob"], "size": s["size"]})
    return model, res


def test_beta_binomial_recovers_truth():
    model, res = _fit()
    prob = np.asarray(res.draws["prob"])
    size = np.asarray(res.draws["size"])
    assert testing.check_mcmc_vector(prob, TRUE_A / (TRUE_A + TRUE_B))
    assert testing.check_mcmc_vector(size, TRUE_A + TRUE_B)
    # convergence diagnostics
    assert float(rhat(jnp.asarray(prob))) < 1.05
    assert float(rhat(jnp.asarray(size))) < 1.05
    assert float(ess(jnp.asarray(prob))) > 200


def test_beta_binomial_matches_quadrature():
    """Posterior moments agree with 2-d quadrature of the same posterior."""
    model, res = _fit(num_groups=60, trials=10, num_draws=4000, burn=500)
    prob_draws = np.asarray(res.draws["prob"]).ravel()
    size_draws = np.asarray(res.draws["size"]).ravel()

    # dense grid posterior
    probs = np.linspace(0.15, 0.55, 201)
    log_sizes = np.linspace(np.log(3.0), np.log(200.0), 201)
    pg, lg = np.meshgrid(probs, log_sizes, indexing="ij")
    lp = np.asarray(
        model.log_post(jnp.asarray(pg.ravel()),
                       jnp.asarray(np.exp(lg.ravel())))
    ).reshape(pg.shape) + lg  # Jacobian for log-size grid
    w = np.exp(lp - lp.max())
    w /= w.sum()
    want_prob = (w * pg).sum()
    want_size = (w * np.exp(lg)).sum()
    want_prob_sd = np.sqrt((w * (pg - want_prob) ** 2).sum())
    want_size_sd = np.sqrt((w * (np.exp(lg) - want_size) ** 2).sum())

    mc_se_prob = want_prob_sd / np.sqrt(200.0)  # conservative ESS
    mc_se_size = want_size_sd / np.sqrt(200.0)
    assert abs(prob_draws.mean() - want_prob) < 4 * mc_se_prob
    assert abs(size_draws.mean() - want_size) < 4 * mc_se_size
    assert abs(prob_draws.std() / want_prob_sd - 1.0) < 0.15
    assert abs(size_draws.std() / want_size_sd - 1.0) < 0.25


def test_runs_jitted_end_to_end():
    """The whole program (init + burn + draws) is one jitted call."""
    n = jnp.full((20,), 10.0)
    y = dists.binomial.sample(jax.random.key(0), n, 0.3)
    model = BetaBinomialModel(trials=n, successes=y)

    @jax.jit
    def fit(key):
        return run_mcmc(key, model.kernel(), model.init_state, 50,
                        num_chains=2, burn=10, jit=False,
                        extract=lambda s: s["prob"]).draws

    draws = fit(jax.random.key(1))
    assert draws.shape == (2, 50)
    assert np.isfinite(np.asarray(draws)).all()
