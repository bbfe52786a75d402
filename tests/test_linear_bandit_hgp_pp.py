"""Linear bandit, hierarchical GP, cosine/cluster point processes."""

import jax
import jax.numpy as jnp
import numpy as np

from boom_tpu.inference import run_mcmc
from boom_tpu.models.bandits import LinearBandit, arm_map, effects_encode
from boom_tpu.models.gp import HierarchicalGpRegression
from boom_tpu.models.point_process import (
    CosinePoissonProcess,
    PoissonClusterProcess,
)


def test_arm_map_and_effects_encoding():
    amap = arm_map((2, 3))
    assert amap.shape == (6, 2)
    # every (level0, level1) combination appears exactly once
    pairs = {(int(a), int(b)) for a, b in np.asarray(amap)}
    assert pairs == {(i, j) for i in range(2) for j in range(3)}
    enc = effects_encode(jnp.asarray([0, 1, 2]), 3)
    np.testing.assert_array_equal(
        np.asarray(enc), [[1, 0], [0, 1], [-1, -1]])
    # sum-to-zero over a balanced design
    np.testing.assert_allclose(np.asarray(enc).sum(0), 0.0)


def test_linear_bandit_finds_best_arm():
    bandit = LinearBandit(factor_levels=(2, 3))
    # truth: intercept 1, factor effects favoring arm (1, 2)
    true_beta = jnp.asarray([1.0, -0.8, -0.5, -0.3])
    state, arms, rewards = bandit.run(
        jax.random.key(0), true_beta, sigma=0.3, num_steps=400)
    x_all = bandit.encode(jnp.arange(6))
    best = int(jnp.argmax(x_all @ true_beta))
    played = np.asarray(arms[-100:])
    assert (played == best).mean() > 0.7
    probs = bandit.optimal_arm_probabilities(jax.random.key(1), state)
    assert int(jnp.argmax(probs)) == best
    np.testing.assert_allclose(float(jnp.sum(probs)), 1.0, atol=1e-6)
    # the posterior pins down the utility of the best arm precisely;
    # rarely-played arms stay vague (that is the point of a bandit), so
    # only check the best arm's value and the overall coefficient scale
    beta_hat = jnp.linalg.solve(state["prec"], state["prec_mean"])
    np.testing.assert_allclose(
        float(x_all[best] @ beta_hat), float(x_all[best] @ true_beta),
        atol=0.1)
    np.testing.assert_allclose(np.asarray(beta_hat),
                               np.asarray(true_beta), atol=0.5)


def test_hierarchical_gp_shares_strength():
    kk, n = 3, 25
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.sort(rng.uniform(-2, 2, size=(kk, n)))[..., None])

    def f0(xj):
        return jnp.sin(1.5 * xj[:, 0])

    devs = [lambda xj: 0.4 * xj[:, 0],
            lambda xj: -0.4 * xj[:, 0],
            lambda xj: jnp.zeros(xj.shape[0])]
    y = HierarchicalGpRegression.simulate(
        jax.random.key(1), x, f0, devs, sigma=0.1)
    model = HierarchicalGpRegression(
        x=x, y=y, amp0=1.0, length0=1.0, amp_group=0.6, length_group=1.5,
        sigsq_a=0.1, sigsq_b=0.1)
    res = run_mcmc(jax.random.key(2), model.kernel(), model.init_state,
                   num_draws=200, num_chains=2, burn=100)
    f_mean = np.asarray(res.draws["f"]).mean((0, 1))  # [K, n]
    truth = np.stack([np.asarray(f0(x[j]) + devs[j](x[j]))
                      for j in range(kk)])
    rmse = np.sqrt(np.mean((f_mean - truth) ** 2))
    assert rmse < 0.25, rmse
    # sigma posteriors concentrate near 0.1 (i.e. well below the prior
    # mean of 1): the fit is actually using the data
    sig = np.sqrt(np.asarray(res.draws["sigsq"]).mean())
    assert sig < 0.3, sig
    # the shared function is closer to f0 than to any single group curve
    f0_mean = np.asarray(res.draws["f0"]).mean((0, 1)).reshape(kk, n)
    rmse_f0 = np.sqrt(np.mean((f0_mean - np.stack(
        [np.asarray(f0(x[j])) for j in range(kk)])) ** 2))
    assert rmse_f0 < 0.35, rmse_f0


def test_cosine_poisson_process():
    lam, freq = 40.0, 1.2
    np.testing.assert_allclose(
        float(CosinePoissonProcess.expected_number_of_events(
            0.0, 2 * np.pi, lam, 3.0)), lam * 2 * np.pi, rtol=1e-6)
    times, valid = CosinePoissonProcess.simulate(
        jax.random.key(0), lam, freq, t_end=20.0)
    n = int(valid.sum())
    expected = float(CosinePoissonProcess.expected_number_of_events(
        0.0, 20.0, lam, freq))
    assert abs(n - expected) < 4.0 * np.sqrt(expected)
    events = jnp.asarray(np.asarray(times)[np.asarray(valid)])
    model = CosinePoissonProcess(events=events, t_end=20.0)
    res = run_mcmc(jax.random.key(1), model.kernel(), model.init_state,
                   num_draws=300, num_chains=2, burn=150)
    lam_post = np.exp(np.asarray(res.draws["log_lam"])).mean()
    assert abs(lam_post - lam) < 6.0, lam_post
    # grid initialization finds the right harmonic; the chain stays in it
    freq_draw = float(np.median(np.asarray(res.draws["freq"])))
    assert abs(freq_draw - freq) < 0.05, freq_draw
    ll_found = float(model.loglik(lam_post, freq_draw))
    ll_flat = float(model.loglik(lam_post, 1e-3))
    assert ll_found > ll_flat


def test_poisson_cluster_process_recovers_rates():
    model = PoissonClusterProcess(counts=jnp.zeros(400), dt=0.5)
    rates = jnp.asarray([1.0, 6.0, 12.0])
    birth = jnp.asarray([0.08, 0.6])
    death = jnp.asarray([0.08, 0.6])
    counts, z = model.simulate(jax.random.key(3), 400, rates, birth, death)
    model = PoissonClusterProcess(counts=counts, dt=0.5)
    res = run_mcmc(jax.random.key(4), model.kernel(), model.init_state,
                   num_draws=400, num_chains=2, burn=200)
    r_mean = np.asarray(res.draws["rates"]).mean((0, 1))
    # background and active-state rates separate and order correctly
    assert r_mean[0] < r_mean[1] < r_mean[2]
    np.testing.assert_allclose(r_mean[0], 1.0, atol=0.8)
    np.testing.assert_allclose(r_mean[2], 12.0, rtol=0.4)
    # the imputed activity states track the truth: posterior mean of the
    # state-implied rate correlates with the true state rate path
    lam_true = np.asarray(model._state_rates(rates))[np.asarray(z)]
    assert np.corrcoef(np.asarray(counts), lam_true)[0, 1] > 0.5
