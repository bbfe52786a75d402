"""Cross-chain pooled warmup + distributed diagnostics (SURVEY §7
phase 8): pooled dual averaging via pmean over the chain axis, and
R-hat/ESS computed with collectives on the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from boom_tpu.inference import diagnostics as host_diag
from boom_tpu.inference.driver import run_mcmc
from boom_tpu.inference.kernels import hmc
from boom_tpu.parallel import diagnostics as dist_diag
from boom_tpu.parallel.mesh import make_mesh


def _ar1_draws(key, chains, n, p, rho=0.6):
    """Autocorrelated fake draws for diagnostics tests."""
    e = jax.random.normal(key, (chains, n, p))

    def step(prev, eps):
        cur = rho * prev + jnp.sqrt(1 - rho**2) * eps
        return cur, cur

    _, out = jax.lax.scan(step, e[:, 0], jnp.moveaxis(e, 1, 0))
    return jnp.moveaxis(out, 0, 1) + jnp.arange(p) * 0.1


def test_sharded_rhat_matches_host(rng_key):
    draws = _ar1_draws(rng_key, 16, 200, 3)
    mesh = make_mesh({"chains": 8})
    ours = np.asarray(dist_diag.sharded_rhat(draws, mesh))
    ref = np.asarray(host_diag.potential_scale_reduction(draws))
    np.testing.assert_allclose(ours, ref, rtol=1e-10)


def test_sharded_ess_matches_host(rng_key):
    draws = _ar1_draws(rng_key, 16, 200, 3)
    mesh = make_mesh({"chains": 8})
    ours = np.asarray(dist_diag.sharded_ess(draws, mesh))
    ref = np.asarray(host_diag.effective_sample_size(draws))
    np.testing.assert_allclose(ours, ref, rtol=1e-8)
    # autocorrelated draws: ess well below the raw count
    assert (ours < 16 * 200).all() and (ours > 100).all()


def _correlated_target(p=8):
    rho = 0.7
    cov = rho ** np.abs(np.subtract.outer(np.arange(p), np.arange(p)))
    prec = jnp.asarray(np.linalg.inv(cov))

    def log_target(x, _state):
        return -0.5 * x @ prec @ x

    return log_target


def _warmup(key, pooled, chains=16, p=8, warmup_steps=120):
    log_target = _correlated_target(p)
    kern = hmc.hmc_kernel(
        "x", log_target, num_steps=8,
        pool_axis="chains" if pooled else None)

    def init(k):
        return {"x": 2.0 * jax.random.normal(k, (p,)),
                "_hmc": hmc.hmc_init(jnp.zeros(p), step_size=1.0),
                "_adapting": jnp.asarray(True)}

    res = run_mcmc(key, kern, init, num_draws=warmup_steps,
                   num_chains=chains, axis_name="chains",
                   extract=lambda s: 0.0)
    return res.final_state, log_target


def _post_warmup_accept(key, state, log_target, steps=60):
    """Mean accept prob per chain at the frozen step size."""
    hs = jax.vmap(hmc.finalize_adaptation)(state["_hmc"])

    def chain(k, pos, h):
        def body(carry, kk):
            q, tot = carry
            q, acc, _ = hmc.hmc_step(kk, q, h,
                                     lambda v: log_target(v, None), 8)
            return (q, tot + acc), None

        (q, tot), _ = jax.lax.scan(
            body, (pos, 0.0), jax.random.split(k, steps))
        return tot / steps

    keys = jax.random.split(key, state["x"].shape[0])
    return np.asarray(jax.jit(jax.vmap(chain))(keys, state["x"], hs))


def test_pooled_warmup_tightens_step_size_and_accept(rng_key):
    k1, k2 = jax.random.split(rng_key)
    st_pool, lt = _warmup(k1, pooled=True)
    st_solo, _ = _warmup(k1, pooled=False)

    # pooled: every chain adapts on the same pmean'd statistic -> one
    # shared step size; per-chain: step sizes scatter
    eps_pool = np.asarray(st_pool["_hmc"].da_log_eps_bar)
    eps_solo = np.asarray(st_solo["_hmc"].da_log_eps_bar)
    assert eps_pool.std() < 1e-10
    assert eps_solo.std() > 1e-3

    acc_pool = _post_warmup_accept(k2, st_pool, lt)
    acc_solo = _post_warmup_accept(k2, st_solo, lt)
    # pooled warmup lands closer to the 0.8 target on average
    dev_pool = np.abs(acc_pool.mean() - 0.8)
    dev_solo = np.abs(acc_solo - 0.8).mean()
    assert dev_pool <= dev_solo + 0.02
    assert 0.6 < acc_pool.mean() < 0.95


def test_pooled_finalize_in_program(rng_key):
    """finalize_adaptation(pool_axis=...) inside the vmapped program:
    pooled inverse-mass identical across chains and close to the
    target's marginal variances."""
    p = 4
    log_target = _correlated_target(p)
    kern = hmc.hmc_kernel("x", log_target, num_steps=8,
                          pool_axis="chains")

    def run(keys):
        def one(k):
            st = {"x": jax.random.normal(k, (p,)),
                  "_hmc": hmc.hmc_init(jnp.zeros(p), step_size=0.5),
                  "_adapting": jnp.asarray(True)}

            def body(s, kk):
                return kern(kk, s), None

            st, _ = jax.lax.scan(body, st, jax.random.split(k, 200))
            return hmc.finalize_adaptation(st["_hmc"],
                                           pool_axis="chains")

        return jax.vmap(one, axis_name="chains")(keys)

    hs = jax.jit(run)(jax.random.split(rng_key, 8))
    inv_mass = np.asarray(hs.inv_mass)
    assert inv_mass.std(axis=0).max() < 1e-10  # identical across chains
    assert 0.3 < inv_mass[0].mean() < 3.0  # target marginals are ~1


def test_pool_hmc_states_host_side(rng_key):
    st, _ = _warmup(rng_key, pooled=False, chains=8, warmup_steps=60)
    pooled = hmc.pool_hmc_states(st["_hmc"])
    assert np.asarray(pooled.step_size).std() < 1e-12
    im = np.asarray(pooled.inv_mass)
    assert im.std(axis=0).max() < 1e-12
