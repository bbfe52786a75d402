"""TIM sampler and LKJ correlation distribution."""

import jax
import jax.numpy as jnp
import numpy as np

from boom_tpu.dists.multivariate import lkj
from boom_tpu.inference.kernels.tim import (
    build_tim_proposal,
    tim_kernel,
    tim_step,
)


def test_tim_samples_gaussian(rng_key):
    cov = jnp.asarray([[1.0, 0.6], [0.6, 2.0]])
    prec = jnp.linalg.inv(cov)
    mean = jnp.asarray([1.0, -1.0])

    def logp(x):
        d = x - mean
        return -0.5 * d @ prec @ d

    prop, unravel = build_tim_proposal(logp, jnp.zeros(2))
    np.testing.assert_allclose(np.asarray(prop.mode), np.asarray(mean),
                               atol=1e-6)

    def step(x, k):
        x, acc = tim_step(k, x, logp, prop)
        return x, (x, acc)

    _, (draws, accs) = jax.lax.scan(
        step, jnp.zeros(2), jax.random.split(rng_key, 5000))
    # independence MH from a tailored T at the mode: high acceptance
    assert float(jnp.mean(accs)) > 0.5
    d = np.asarray(draws[500:])
    np.testing.assert_allclose(d.mean(0), np.asarray(mean), atol=0.08)
    np.testing.assert_allclose(np.cov(d.T), np.asarray(cov), atol=0.3)


def test_tim_kernel_protocol(rng_key):
    def logt(v, state):
        return -0.5 * jnp.sum((v - 3.0) ** 2)

    kernel = tim_kernel("x", logt, example_value=jnp.zeros(2))
    state = {"x": jnp.zeros(2)}
    for i in range(200):
        state = kernel(jax.random.key(i), state)
    assert abs(float(state["x"][0]) - 3.0) < 1.5


def test_lkj_uniform_marginals(rng_key):
    """LKJ(1), d=3: off-diagonal marginal has mean 0 and var 1/4."""
    c = jax.vmap(lambda k: lkj.sample(k, 1.0, 3))(
        jax.random.split(rng_key, 8000))
    diag = np.asarray(jnp.diagonal(c, axis1=-2, axis2=-1))
    np.testing.assert_allclose(diag, 1.0, atol=1e-8)
    offs = np.asarray(c[:, 0, 1])
    assert abs(offs.mean()) < 0.02
    assert abs(offs.var() - 0.25) < 0.02
    # positive definite
    eigs = np.linalg.eigvalsh(np.asarray(c[:100]))
    assert eigs.min() > 0


def test_lkj_concentration(rng_key):
    """Larger eta concentrates toward identity."""
    c1 = jax.vmap(lambda k: lkj.sample(k, 1.0, 4))(
        jax.random.split(rng_key, 3000))
    c10 = jax.vmap(lambda k: lkj.sample(k, 10.0, 4))(
        jax.random.split(jax.random.key(1), 3000))
    v1 = float(jnp.var(c1[:, 0, 1]))
    v10 = float(jnp.var(c10[:, 0, 1]))
    assert v10 < 0.4 * v1, (v1, v10)


def test_lkj_logpdf_ordering():
    """logpdf with eta>1 prefers identity over strong correlation."""
    eye = jnp.eye(3)
    strong = jnp.asarray([[1.0, 0.9, 0.8], [0.9, 1.0, 0.7],
                          [0.8, 0.7, 1.0]])
    assert float(lkj.logpdf(eye, 5.0)) > float(lkj.logpdf(strong, 5.0))
    # eta = 1: flat (equal log densities)
    np.testing.assert_allclose(float(lkj.logpdf(eye, 1.0)),
                               float(lkj.logpdf(strong, 1.0)), atol=1e-9)
