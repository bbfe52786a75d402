import time, sys, jax, jax.numpy as jnp
from boom_tpu.inference import run_mcmc
from boom_tpu.statespace import Bsts, LocalLinearTrend

t_len, chains, draws, burn = 500, 4096, 25, 30
key = jax.random.key(4207)
k1,k2,k3,k_run = jax.random.split(key,4)
slope = jnp.cumsum(0.02*jax.random.normal(k3,(t_len,)))
level = jnp.cumsum(slope+0.3*jax.random.normal(k1,(t_len,)))+5.0
y = level+0.5*jax.random.normal(k2,(t_len,))

def timed(label, model):
    fit = jax.jit(lambda k: run_mcmc(k, model.kernel(), model.init_state, draws,
        num_chains=chains, burn=burn, jit=False,
        extract=lambda s: {"so": s["sigsq_obs"]}).draws)
    t0=time.time(); d = fit(k_run); jax.block_until_ready(d); tc=time.time()-t0
    t=float('inf')
    for r in range(3):
        t0=time.time(); d=fit(jax.random.fold_in(k_run,1+r)); jax.block_until_ready(d)
        t=min(t, time.time()-t0)
    print(f"{label}: {t:.2f}s ({t/(draws+burn)*1e3:.1f}ms/sweep, compile {tc:.0f}s)"); sys.stdout.flush()

blocks = lambda: [LocalLinearTrend.default(y)]
timed("A asis-only (no marginal)", Bsts(y=y, blocks=blocks()))
timed("B no-asis no-marginal", Bsts(y=y, blocks=blocks(), asis=False))
timed("C mtm x2 moves k=16", Bsts(y=y, blocks=blocks(), marginal_sigma_slice=True))
timed("D mtm x1 move k=32", Bsts(y=y, blocks=blocks(), marginal_sigma_slice=True,
      marginal_mtm_moves=1, marginal_mtm_trials=32))
timed("E old slice marginal 2dirs", Bsts(y=y, blocks=blocks(), marginal_sigma_slice=True,
      marginal_move="slice", marginal_slice_random_dirs=2))
