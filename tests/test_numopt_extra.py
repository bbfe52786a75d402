"""conjugate gradient / Powell / simulated annealing / MDP / Q-learning /
ClassAssigner."""

import jax
import jax.numpy as jnp
import numpy as np

from boom_tpu.numopt import (
    MarkovDecisionProcess,
    QLearning,
    class_assigner,
    conjugate_gradient,
    powell,
    simulated_annealing,
)


def _rosenbrock(x):
    return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1.0 - x[:-1]) ** 2)


def _quadratic(x):
    a = jnp.asarray([[3.0, 1.0], [1.0, 2.0]])
    b = jnp.asarray([1.0, -2.0])
    return 0.5 * x @ a @ x - b @ x


def test_conjugate_gradient_quadratic_and_rosenbrock():
    res = conjugate_gradient(_quadratic, jnp.zeros(2))
    x_star = jnp.linalg.solve(jnp.asarray([[3.0, 1.0], [1.0, 2.0]]),
                              jnp.asarray([1.0, -2.0]))
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(x_star),
                               atol=1e-5)
    res = conjugate_gradient(_rosenbrock, jnp.zeros(4), max_iters=2000)
    assert float(res.value) < 1e-4, float(res.value)


def test_powell_derivative_free():
    res = powell(_quadratic, jnp.asarray([4.0, -4.0]), max_iters=60)
    x_star = jnp.linalg.solve(jnp.asarray([[3.0, 1.0], [1.0, 2.0]]),
                              jnp.asarray([1.0, -2.0]))
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(x_star),
                               atol=1e-3)
    # non-smooth objective (no gradients available)
    res = powell(lambda x: jnp.sum(jnp.abs(x - 1.5)), jnp.zeros(3),
                 max_iters=80)
    np.testing.assert_allclose(np.asarray(res.x), 1.5, atol=1e-2)


def test_simulated_annealing_multimodal():
    # global minimum at x = 3 (value -1), local minimum at x = -2
    def f(x):
        return (-jnp.exp(-0.5 * jnp.sum((x - 3.0) ** 2))
                - 0.6 * jnp.exp(-0.5 * jnp.sum((x + 2.0) ** 2)))

    res = simulated_annealing(jax.random.key(0), f, jnp.zeros(2),
                              num_steps=4000, step_size=1.5)
    np.testing.assert_allclose(np.asarray(res.x), 3.0, atol=0.3)


def test_mdp_value_iteration_and_policy():
    # 2 states, 2 actions; action 1 in state 0 reaches the rewarding
    # state 1; staying in state 1 pays 1
    probs = jnp.asarray([
        [[1.0, 0.0], [0.0, 1.0]],   # state 0: a0 stays, a1 moves to 1
        [[0.0, 1.0], [1.0, 0.0]],   # state 1: a0 stays, a1 moves to 0
    ])
    rewards = jnp.asarray([
        [[0.0, 0.0], [0.0, 0.0]],
        [[0.0, 1.0], [0.0, 0.0]],
    ])
    mdp = MarkovDecisionProcess(probs, rewards)
    v = mdp.value_iteration(horizon=50, discount_rate=0.9)
    pi = mdp.optimal_policy(horizon=50, discount_rate=0.9)
    assert int(pi[0]) == 1 and int(pi[1]) == 0
    # geometric sum: V[1] ~ 1/(1-0.9) = 10, V[0] ~ 0.9 V[1]
    np.testing.assert_allclose(float(v[1]), 10.0, rtol=0.02)
    np.testing.assert_allclose(float(v[0]), 9.0, rtol=0.02)
    # q-learning discovers the same policy from experience
    agent = QLearning(2, 2, learning_rate=0.2, discount=0.9, epsilon=0.2)
    q, rewards_seen = agent.run(jax.random.key(1), mdp, num_steps=3000)
    assert int(jnp.argmax(q[0])) == 1
    assert int(jnp.argmax(q[1])) == 0


def test_class_assigner_matches_target():
    rng = np.random.default_rng(0)
    n, k = 300, 3
    # posteriors heavily favor class 0; the target wants a 50/30/20 split
    raw = rng.dirichlet([6.0, 1.0, 1.0], size=n)
    target = jnp.asarray([0.5, 0.3, 0.2])
    assign, kl = class_assigner(jax.random.key(2), jnp.asarray(raw),
                                target, max_kl=0.02)
    counts = np.bincount(np.asarray(assign), minlength=k) / n
    assert float(kl) <= 0.02, (float(kl), counts)
    # MAP assignment alone would be nearly all class 0
    map_counts = np.bincount(np.asarray(raw).argmax(1), minlength=k) / n
    assert map_counts[0] > 0.8
    # ... but the returned one respects the target
    np.testing.assert_allclose(counts, np.asarray(target), atol=0.12)
    # and still respects individual posteriors where it can: objects
    # assigned to 0 should mostly be ones whose posterior favors 0
    favored = np.asarray(raw).argmax(1)
    agreement = (np.asarray(assign) == favored).mean()
    assert agreement > 0.5, agreement
