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
