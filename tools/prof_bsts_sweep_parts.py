"""Decompose the bsts conditional sweep cost at bench scale."""
import time, sys, jax, jax.numpy as jnp
from boom_tpu.inference import run_mcmc
from boom_tpu.statespace import Bsts, LocalLinearTrend
from boom_tpu.statespace.kalman import simulation_smoother

t_len, chains, draws, burn = 500, 4096, 25, 30
key = jax.random.key(4207)
k1,k2,k3,k_run = jax.random.split(key,4)
slope = jnp.cumsum(0.02*jax.random.normal(k3,(t_len,)))
level = jnp.cumsum(slope+0.3*jax.random.normal(k1,(t_len,)))+5.0
y = level+0.5*jax.random.normal(k2,(t_len,))
model = Bsts(y=y, blocks=[LocalLinearTrend.default(y)], asis=False)

def timed_kernel(label, kern):
    fit = jax.jit(lambda k: run_mcmc(k, kern, model.init_state, draws,
        num_chains=chains, burn=burn, jit=False,
        extract=lambda s: {"so": s["sigsq_obs"]}).draws)
    d = fit(k_run); jax.block_until_ready(d)
    best=float('inf')
    for r in range(3):
        t0=time.time(); d=fit(jax.random.fold_in(k_run,1+r)); jax.block_until_ready(d)
        best=min(best,time.time()-t0)
    print(f"{label}: {best/(draws+burn)*1e3:.1f}ms/sweep"); sys.stdout.flush()

full = model.kernel()
timed_kernel("full-no-asis", full)

def smoother_only(key, state):
    out = dict(state)
    params = model.ssm_params(state)
    out["alpha"] = simulation_smoother(key, params, y)
    return out
timed_kernel("smoother-only", smoother_only)

def draws_only(key, state):
    # obs + block draws without state re-imputation
    k_obs, k_blocks = jax.random.split(key)
    out = dict(state)
    params_cur = model.ssm_params(state)
    zs_cur = params_cur.zs(y.shape[0])
    state_contrib = jnp.einsum("td,td->t", zs_cur, state["alpha"])
    resid = y - state_contrib
    out["sigsq_obs"] = model.obs_prior.draw_variance(k_obs, resid.shape[0], jnp.sum(resid*resid))
    new_blocks = {}
    bkeys = jax.random.split(k_blocks, len(model.blocks))
    for (start, dim), b, bk in zip(model._slices(), model.blocks, bkeys):
        path = jax.lax.dynamic_slice_in_dim(state["alpha"], start, dim, axis=1)
        new_blocks[b.name] = b.draw_params(bk, state["blocks"][b.name], path)
    out["blocks"] = new_blocks
    return out
timed_kernel("draws-only", draws_only)

def noop(key, state):
    return dict(state)
timed_kernel("noop (driver overhead)", noop)
