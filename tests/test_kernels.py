"""Kernel correctness: each generic kernel must preserve a known target
(sampled distribution matches analytic). Mirrors the reference's
Samplers/tests + MCMC coverage strategy."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.stats as sps

from boom_tpu import dists
from boom_tpu.inference import run_mcmc
from boom_tpu.inference.kernels import (
    hmc_init,
    hmc_kernel,
    mala_kernel,
    random_walk_kernel,
    slice_kernel,
)


def _ks(draws, cdf):
    flat = np.asarray(draws).reshape(-1)
    sub = flat[:: max(1, len(flat) // 4000)]
    return sps.kstest(sub, cdf).pvalue


def test_slice_kernel_standard_normal(rng_key):
    kern = slice_kernel("x", lambda v, s: dists.normal.logpdf(v, 1.0, 2.0),
                        width=2.0)
    init = {"x": jnp.zeros((8,))}
    res = run_mcmc(rng_key, kern, init, num_draws=2000, burn=200,
                   extract=lambda s: s["x"])
    assert _ks(res.draws, sps.norm(1.0, 2.0).cdf) > 1e-3


def test_slice_kernel_gamma_bounded(rng_key):
    kern = slice_kernel("x", lambda v, s: dists.gamma.logpdf(v, 2.5, 1.5),
                        width=1.0, lower=0.0)
    init = {"x": jnp.ones((8,))}
    res = run_mcmc(rng_key, kern, init, num_draws=2000, burn=200,
                   extract=lambda s: s["x"])
    assert _ks(res.draws, sps.gamma(2.5, scale=1 / 1.5).cdf) > 1e-3


def test_rwm_kernel(rng_key):
    kern = random_walk_kernel(
        "x", lambda v, s: dists.normal.logpdf(v, -1.0, 0.7), scale=0.8)
    init = {"x": jnp.zeros(())}

    def init_fn(k):
        return {"x": jax.random.normal(k)}

    res = run_mcmc(rng_key, kern, init_fn, num_draws=4000, burn=500,
                   num_chains=8, extract=lambda s: s["x"])
    assert _ks(res.draws, sps.norm(-1.0, 0.7).cdf) > 1e-3


def test_mala_kernel(rng_key):
    kern = mala_kernel("x", lambda v, s: dists.normal.logpdf(v, 2.0, 1.0),
                       step_size=0.9)

    def init_fn(k):
        return {"x": jax.random.normal(k)}

    res = run_mcmc(rng_key, kern, init_fn, num_draws=4000, burn=500,
                   num_chains=8, extract=lambda s: s["x"])
    assert _ks(res.draws, sps.norm(2.0, 1.0).cdf) > 1e-3


def test_hmc_kernel_mvn(rng_key):
    cov = jnp.asarray([[2.0, 0.8], [0.8, 1.0]])
    prec = jnp.linalg.inv(cov)

    def logp(v, s):
        return -0.5 * v @ prec @ v

    kern = hmc_kernel("x", logp, num_steps=8, adapt_field=None)

    def init_fn(k):
        return {"x": jax.random.normal(k, (2,)),
                "_hmc": hmc_init(jnp.zeros(2), step_size=0.4)}

    res = run_mcmc(rng_key, kern, init_fn, num_draws=3000, burn=500,
                   num_chains=8, extract=lambda s: s["x"])
    flat = np.asarray(res.draws).reshape(-1, 2)
    np.testing.assert_allclose(flat.mean(0), [0, 0], atol=0.06)
    np.testing.assert_allclose(np.cov(flat.T), np.asarray(cov), atol=0.12)


def test_diagnostics_sane(rng_key):
    # iid draws: rhat ~ 1, ess ~ n_total
    from boom_tpu.inference import ess, rhat

    x = jax.random.normal(rng_key, (4, 1000))
    r = float(rhat(x))
    assert 0.99 < r < 1.01
    e = float(ess(x))
    assert e > 2000
    # perfectly correlated chains at different levels: rhat >> 1
    bad = jnp.stack([jnp.zeros(1000) + i for i in range(4)])
    bad = bad + 0.01 * jax.random.normal(rng_key, (4, 1000))
    assert float(rhat(bad)) > 2.0
    assert float(ess(bad)) < 100
