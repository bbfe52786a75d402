"""NUTS kernel: distributional correctness on analytic targets."""

import jax
import jax.numpy as jnp
import numpy as np

from boom_tpu.inference.kernels.hmc import finalize_adaptation, hmc_init
from boom_tpu.inference.kernels.nuts import nuts_kernel, nuts_step


def _run_nuts(log_target, init_positions, key, n_adapt=400, n_draw=600,
              max_depth=8):
    n_chains = jax.tree_util.tree_leaves(init_positions)[0].shape[0]
    kernel = nuts_kernel("x", lambda v, s: log_target(v),
                         max_depth=max_depth)

    def one_chain(key, x0):
        state = {"x": x0, "_hmc": hmc_init(x0, step_size=0.2),
                 "_adapting": True}

        def adapt_step(st, k):
            return kernel(k, st), None

        ka, kd = jax.random.split(key)
        state, _ = jax.lax.scan(adapt_step, state,
                                jax.random.split(ka, n_adapt))
        state["_hmc"] = finalize_adaptation(state["_hmc"])
        state["_adapting"] = False

        def draw_step(st, k):
            st = kernel(k, st)
            return st, st["x"]

        _, draws = jax.lax.scan(draw_step, state,
                                jax.random.split(kd, n_draw))
        return draws

    return jax.jit(jax.vmap(one_chain))(
        jax.random.split(key, n_chains), init_positions)


def test_nuts_standard_normal(rng_key):
    def logp(x):
        return -0.5 * jnp.sum(x * x)

    x0 = jax.random.normal(rng_key, (4, 3)) * 3.0
    draws = _run_nuts(logp, x0, jax.random.key(1))
    flat = np.asarray(draws).reshape(-1, 3)
    np.testing.assert_allclose(flat.mean(0), 0.0, atol=0.12)
    np.testing.assert_allclose(flat.var(0), 1.0, atol=0.2)


def test_nuts_correlated_gaussian(rng_key):
    rho = 0.9
    cov = jnp.asarray([[1.0, rho], [rho, 1.0]])
    prec = jnp.linalg.inv(cov)

    def logp(x):
        return -0.5 * x @ prec @ x

    x0 = jax.random.normal(rng_key, (4, 2))
    draws = _run_nuts(logp, x0, jax.random.key(2))
    flat = np.asarray(draws).reshape(-1, 2)
    emp_cov = np.cov(flat.T)
    np.testing.assert_allclose(emp_cov, np.asarray(cov), atol=0.25)


def test_nuts_scaled_gaussian_mass_adaptation(rng_key):
    """Wildly different scales: mass adaptation should handle it."""
    scales = jnp.asarray([0.1, 1.0, 10.0])

    def logp(x):
        return -0.5 * jnp.sum((x / scales) ** 2)

    x0 = jax.random.normal(rng_key, (4, 3)) * scales
    draws = _run_nuts(logp, x0, jax.random.key(3), n_adapt=600)
    flat = np.asarray(draws).reshape(-1, 3)
    np.testing.assert_allclose(flat.std(0), np.asarray(scales), rtol=0.3)


def test_nuts_pytree_position(rng_key):
    def logp(tree):
        return (-0.5 * jnp.sum(tree["a"] ** 2)
                - 0.5 * jnp.sum((tree["b"] - 2.0) ** 2))

    x0 = {"a": jax.random.normal(rng_key, (4, 2)),
          "b": jnp.zeros((4, 3))}
    draws = _run_nuts(logp, x0, jax.random.key(4))
    b = np.asarray(draws["b"]).reshape(-1, 3)
    np.testing.assert_allclose(b.mean(0), 2.0, atol=0.15)


def test_nuts_step_is_jittable_and_finite(rng_key):
    def logp(x):
        return -0.5 * jnp.sum(x * x)

    x0 = jnp.asarray([1.0, -1.0])
    hs = hmc_init(x0, step_size=0.3)
    new_x, acc, lp = jax.jit(
        lambda k: nuts_step(k, x0, hs, logp, max_depth=6))(rng_key)
    assert np.all(np.isfinite(np.asarray(new_x)))
    assert 0.0 <= float(acc) <= 1.0
    assert np.isfinite(float(lp))
