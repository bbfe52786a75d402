"""GLM breadth: gamma regression, zero-inflated regressions, binomial
trials>1 logit DA, loglinear tables, multilevel multinomial.

Reference: Models/Glm/GammaRegressionModel.hpp:45, ZeroInflated*,
BinomialLogitModel, LoglinearModel.hpp:228,
Models/MultilevelMultinomialModel.hpp:51.
"""

import jax
import jax.numpy as jnp
import numpy as np

from boom_tpu.inference import run_mcmc
from boom_tpu.models.glm.breadth import (
    BinomialLogitSpikeSlab,
    GammaRegression,
    LoglinearModel,
    MultilevelMultinomial,
    ZeroInflatedLognormalRegression,
    ZeroInflatedPoissonRegression,
    loglinear_design,
)
from boom_tpu.testing import check_mcmc_matrix


def test_gamma_regression_recovers(rng_key):
    beta_true = jnp.asarray([1.0, 0.6, -0.4])
    alpha_true = 4.0
    x, y = GammaRegression.simulate(rng_key, 800, beta_true, alpha_true)
    model = GammaRegression(x=x, y=y)
    res = run_mcmc(jax.random.key(1), model.kernel(), model.init_state,
                   num_draws=400, num_chains=2, burn=200)
    beta_post = np.asarray(jnp.mean(res.draws["beta"], (0, 1)))
    np.testing.assert_allclose(beta_post, np.asarray(beta_true),
                               atol=0.12)
    alpha_post = float(jnp.mean(res.draws["alpha"]))
    assert abs(alpha_post - alpha_true) < 1.0, alpha_post
    assert check_mcmc_matrix(res.draws["beta"].reshape(-1, 3),
                             beta_true)


def test_zero_inflated_lognormal(rng_key):
    ks = jax.random.split(rng_key, 4)
    n, p = 900, 3
    x = jax.random.normal(ks[0], (n, p)).at[:, 0].set(1.0)
    beta_l = jnp.asarray([0.5, 1.5, 0.0])
    beta_r = jnp.asarray([1.0, 0.0, 0.8])
    nz = jax.random.uniform(ks[1], (n,)) < jax.nn.sigmoid(x @ beta_l)
    logy = x @ beta_r + 0.5 * jax.random.normal(ks[2], (n,))
    y = jnp.where(nz, jnp.exp(logy), 0.0)
    model = ZeroInflatedLognormalRegression(x=x, y=y,
                                            expected_model_size=2)
    res = run_mcmc(jax.random.key(2), model.kernel(), model.init_state,
                   num_draws=300, num_chains=2, burn=200)
    bl = np.asarray(jnp.mean(res.draws["logit"]["beta"], (0, 1)))
    br = np.asarray(jnp.mean(res.draws["reg"]["beta"], (0, 1)))
    np.testing.assert_allclose(bl, np.asarray(beta_l), atol=0.3)
    np.testing.assert_allclose(br, np.asarray(beta_r), atol=0.1)


def test_zero_inflated_poisson(rng_key):
    ks = jax.random.split(rng_key, 4)
    n = 1200
    x = jax.random.normal(ks[0], (n, 2)).at[:, 0].set(1.0)
    beta_l = jnp.asarray([0.8, 1.2])
    beta_p = jnp.asarray([1.2, 0.5])
    at_risk = jax.random.uniform(ks[1], (n,)) < jax.nn.sigmoid(
        x @ beta_l)
    lam = jnp.exp(x @ beta_p)
    y = jnp.where(at_risk, jax.random.poisson(ks[2], lam), 0)
    model = ZeroInflatedPoissonRegression(x=x, y=y,
                                          expected_model_size=2)
    res = run_mcmc(jax.random.key(3), model.kernel(), model.init_state,
                   num_draws=300, num_chains=2, burn=300)
    bp = np.asarray(jnp.mean(res.draws["pois"]["beta"], (0, 1)))
    bl = np.asarray(jnp.mean(res.draws["logit"]["beta"], (0, 1)))
    np.testing.assert_allclose(bp, np.asarray(beta_p), atol=0.12)
    np.testing.assert_allclose(bl, np.asarray(beta_l), atol=0.35)
    # calibration: the mean posterior at-risk probability among zero
    # rows should match the true at-risk fraction among zeros (rows
    # with the same x are exchangeable, so per-row discrimination is
    # impossible by design — calibration is the testable property)
    risk_prob = np.asarray(jnp.mean(
        jnp.asarray(res.draws["at_risk"], jnp.float32), (0, 1)))
    zero_mask = np.asarray(y == 0)
    frac_true = np.asarray(at_risk)[zero_mask].mean()
    frac_post = risk_prob[zero_mask].mean()
    assert abs(frac_post - frac_true) < 0.08, (frac_post, frac_true)


def test_binomial_logit_trials(rng_key):
    x, y, trials, beta_true = BinomialLogitSpikeSlab.simulate(
        rng_key, 500, p=6, nonzero=3, max_trials=12)
    model = BinomialLogitSpikeSlab.from_data(x, y, trials,
                                             expected_model_size=3)
    res = run_mcmc(jax.random.key(4), model.kernel(), model.init_state,
                   num_draws=300, num_chains=2, burn=200)
    beta_post = np.asarray(jnp.mean(res.draws["beta"], (0, 1)))
    np.testing.assert_allclose(beta_post[:3], np.asarray(beta_true[:3]),
                               atol=0.2)
    incl = np.asarray(jnp.mean(res.draws["gamma"], (0, 1)))
    assert (incl[:3] > 0.85).all(), incl[:3]
    assert incl[3:].max() < 0.6, incl[3:]


def test_loglinear_design_and_fit(rng_key):
    cells, design = loglinear_design((3, 2), interactions=((0, 1),))
    assert cells.shape == (6, 2)
    assert design.shape == (6, 1 + 2 + 1 + 2)
    # independence table: main effects only should reproduce margins
    row = jnp.asarray([0.5, 0.3, 0.2])
    col = jnp.asarray([0.6, 0.4])
    lam = 500.0 * row[:, None] * col[None, :]
    table = jax.random.poisson(rng_key, lam)
    model = LoglinearModel.from_table(table)
    res = run_mcmc(jax.random.key(5), model.kernel(), model.init_state,
                   num_draws=300, num_chains=2, burn=200)
    final = jax.tree_util.tree_map(lambda a: a[0], res.final_state)
    fit = np.exp(np.asarray(jax.vmap(model.fitted_log_means)(
        jax.tree_util.tree_map(lambda a: a[0], res.draws))).mean(0))
    np.testing.assert_allclose(fit, np.asarray(lam).ravel(),
                               rtol=0.25)


def test_multilevel_multinomial(rng_key):
    # taxonomy: root 0 -> {1, 2}; 1 -> {3, 4}; 2 -> {5}
    parents = (-1, 0, 0, 1, 1, 2)
    true_probs = {0: [0.7, 0.3], 1: [0.25, 0.75], 2: [1.0]}
    rng = np.random.default_rng(0)
    obs = []
    for _ in range(2000):
        node = 0
        kids = {0: [1, 2], 1: [3, 4], 2: [5]}
        while node in kids:
            node = rng.choice(kids[node], p=true_probs[node])
        obs.append(node)
    model = MultilevelMultinomial(parents=parents,
                                  observations=jnp.asarray(obs))
    res = run_mcmc(rng_key, model.kernel(), model.init_state,
                   num_draws=200, num_chains=2, burn=20)
    probs = np.asarray(jnp.mean(res.draws["cond_probs"], (0, 1)))
    np.testing.assert_allclose(probs[0, :2], [0.7, 0.3], atol=0.03)
    np.testing.assert_allclose(probs[1, :2], [0.25, 0.75], atol=0.03)
    # leaf log probs multiply down the path
    final = jax.tree_util.tree_map(lambda a: a[0, -1], res.draws)
    lp = np.asarray(model.leaf_log_probs(final))
    assert abs(np.exp(lp[3]) - 0.7 * 0.25) < 0.05
    assert abs(np.exp(lp[5]) - 0.3) < 0.05
