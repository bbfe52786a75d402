"""BART: array-tree machinery + Friedman-surface recovery."""

import jax
import jax.numpy as jnp
import numpy as np

from boom_tpu.models.bart import (
    BartConfig,
    GaussianBart,
    assign_leaves,
    leaf_mask,
)


def test_assign_leaves_manual_tree():
    # depth-2 tree: root splits on x0 > 0; right child splits on x1 > 1
    nn = 8
    feature = jnp.zeros((nn,), jnp.int32).at[3].set(1)
    threshold = jnp.zeros((nn,)).at[3].set(1.0)
    internal = jnp.zeros((nn,), bool).at[1].set(True).at[3].set(True)
    tree = {"feature": feature, "threshold": threshold,
            "internal": internal, "depth": 2}
    x = jnp.asarray([[-1.0, 0.0], [1.0, 0.0], [1.0, 2.0]])
    idx = assign_leaves(tree, x)
    np.testing.assert_array_equal(np.asarray(idx), [2, 6, 7])


def test_leaf_mask():
    nn = 8
    internal = jnp.zeros((nn,), bool).at[1].set(True).at[3].set(True)
    m = np.asarray(leaf_mask(internal, 2))
    # leaves: 2 (left child of root), 6, 7 (children of 3)
    expected = np.zeros(nn, bool)
    expected[[2, 6, 7]] = True
    np.testing.assert_array_equal(m, expected)


def test_bart_fits_friedman(rng_key):
    x, y, f = GaussianBart.simulate_friedman(rng_key, 400, p=7, sd=1.0)
    model = GaussianBart(x=x, y=y,
                         config=BartConfig(num_trees=40, max_depth=4))
    kernel = model.kernel()

    @jax.jit
    def run(key):
        state = model.init_state(key)

        def step(st, k):
            st = kernel(k, st)
            return st, st["sigsq"]

        return jax.lax.scan(step, state,
                            jax.random.split(jax.random.key(1), 300))

    state, sig_path = run(jax.random.key(2))
    pred = model.predict(state)
    # in-sample fit beats the constant predictor by a wide margin
    sse = float(jnp.sum((pred - f) ** 2))
    sst = float(jnp.sum((f - jnp.mean(f)) ** 2))
    r2 = 1.0 - sse / sst
    assert r2 > 0.7, r2
    # noise variance estimated in the right region (truth 1.0)
    sig_est = float(jnp.mean(sig_path[-100:]))
    assert 0.4 < sig_est < 3.0, sig_est


def test_bart_trees_actually_grow(rng_key):
    x, y, _ = GaussianBart.simulate_friedman(rng_key, 300, p=5, sd=0.5)
    model = GaussianBart(x=x, y=y,
                         config=BartConfig(num_trees=20, max_depth=3))
    kernel = model.kernel()
    state = model.init_state(jax.random.key(0))

    @jax.jit
    def run(state):
        def step(st, k):
            return kernel(k, st), None

        st, _ = jax.lax.scan(step, state,
                             jax.random.split(jax.random.key(3), 100))
        return st

    state = run(state)
    n_internal = int(jnp.sum(state["internal"]))
    assert n_internal >= 10, n_internal


def test_bart_predict_out_of_sample(rng_key):
    k1, k2 = jax.random.split(rng_key)
    x, y, f = GaussianBart.simulate_friedman(k1, 500, p=6, sd=0.7)
    x_new, _, f_new = GaussianBart.simulate_friedman(k2, 100, p=6, sd=0.7)
    model = GaussianBart(x=x, y=y,
                         config=BartConfig(num_trees=40, max_depth=4))
    kernel = model.kernel()

    @jax.jit
    def run(key):
        state = model.init_state(key)

        def step(st, k):
            return kernel(k, st), None

        st, _ = jax.lax.scan(step, state,
                             jax.random.split(jax.random.key(5), 250))
        return st

    state = run(jax.random.key(4))
    pred = model.predict(state, x_new)
    rmse = float(jnp.sqrt(jnp.mean((pred - f_new) ** 2)))
    base = float(jnp.sqrt(jnp.mean((jnp.mean(y) - f_new) ** 2)))
    assert rmse < 0.6 * base, (rmse, base)


def test_logit_bart_decision_boundary(rng_key):
    """Classification BART recovers a nonlinear decision boundary
    (reference Models/Bart/LogitBartModel.hpp:31)."""
    from boom_tpu.inference import run_mcmc
    from boom_tpu.models.bart import LogitBart

    k1, k2 = jax.random.split(rng_key)
    n = 600
    x = jax.random.uniform(k1, (n, 2), minval=-2.0, maxval=2.0)
    # nonlinear boundary: inside the unit circle -> high probability
    eta_true = 3.0 * (1.0 - x[:, 0] ** 2 - x[:, 1] ** 2)
    p_true = jax.nn.sigmoid(eta_true)
    y = jnp.asarray(jax.random.uniform(k2, (n,)) < p_true, jnp.int32)
    model = LogitBart(x=x, y=y, config=BartConfig(num_trees=40,
                                                  max_depth=4))
    res = run_mcmc(jax.random.key(1), model.kernel(), model.init_state,
                   num_draws=150, num_chains=1, burn=150)
    final = jax.tree_util.tree_map(lambda a: a[0], res.final_state)
    draws = jax.tree_util.tree_map(lambda a: a[0], res.draws)
    probs = jnp.mean(jax.vmap(
        lambda st: model.predict_prob(st))(draws), 0)
    acc = jnp.mean((probs > 0.5) == (p_true > 0.5))
    assert float(acc) > 0.85, float(acc)
    # calibration: mean |prob - true prob| small
    mae = float(jnp.mean(jnp.abs(probs - p_true)))
    assert mae < 0.18, mae


def test_probit_bart(rng_key):
    from boom_tpu.inference import run_mcmc
    from boom_tpu.models.bart import ProbitBart

    k1, k2 = jax.random.split(rng_key)
    n = 500
    x = jax.random.uniform(k1, (n, 2))
    eta_true = 2.0 * jnp.sin(3.0 * x[:, 0]) - 1.0 + 2.0 * x[:, 1]
    p_true = jax.scipy.stats.norm.cdf(eta_true)
    y = jnp.asarray(jax.random.uniform(k2, (n,)) < p_true, jnp.int32)
    model = ProbitBart(x=x, y=y, config=BartConfig(num_trees=40))
    res = run_mcmc(jax.random.key(2), model.kernel(), model.init_state,
                   num_draws=150, num_chains=1, burn=150)
    draws = jax.tree_util.tree_map(lambda a: a[0], res.draws)
    probs = jnp.mean(jax.vmap(
        lambda st: model.predict_prob(st))(draws), 0)
    acc = jnp.mean((probs > 0.5) == (p_true > 0.5))
    assert float(acc) > 0.85, float(acc)


def test_poisson_bart(rng_key):
    from boom_tpu.inference import run_mcmc
    from boom_tpu.models.bart import PoissonBart

    k1, k2 = jax.random.split(rng_key)
    n = 500
    x = jax.random.uniform(k1, (n, 2))
    log_rate = 1.0 + jnp.sin(4.0 * x[:, 0]) + x[:, 1]
    y = jax.random.poisson(k2, jnp.exp(log_rate))
    model = PoissonBart(x=x, y=y, config=BartConfig(num_trees=40))
    res = run_mcmc(jax.random.key(3), model.kernel(), model.init_state,
                   num_draws=150, num_chains=1, burn=150)
    draws = jax.tree_util.tree_map(lambda a: a[0], res.draws)
    rate = jnp.mean(jax.vmap(
        lambda st: model.predict_rate(st))(draws), 0)
    corr = jnp.corrcoef(jnp.stack([rate, jnp.exp(log_rate)]))[0, 1]
    assert float(corr) > 0.8, float(corr)
    rel = float(jnp.mean(jnp.abs(rate - jnp.exp(log_rate))
                         / jnp.exp(log_rate)))
    assert rel < 0.5, rel
