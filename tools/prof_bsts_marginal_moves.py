"""Try bsts_llt bench variants: wall, R-hat, min-ESS/s."""
import time, sys, json, jax, jax.numpy as jnp, numpy as np
from boom_tpu.inference import effective_sample_size, run_mcmc
from boom_tpu.inference import diagnostics
from boom_tpu.statespace import Bsts, LocalLinearTrend

t_len, chains, draws, burn = 500, 4096, 250, 300
key = jax.random.key(4207)
k1,k2,k3,k_run = jax.random.split(key,4)
slope = jnp.cumsum(0.02*jax.random.normal(k3,(t_len,)))
level = jnp.cumsum(slope+0.3*jax.random.normal(k1,(t_len,)))+5.0
y = level+0.5*jax.random.normal(k2,(t_len,))

def run(label, model, draws=draws, burn=burn):
    fit = jax.jit(lambda k: run_mcmc(k, model.kernel(), model.init_state, draws,
        num_chains=chains, burn=burn, jit=False,
        extract=lambda s: {"so": s["sigsq_obs"],
            "lvl": s["blocks"]["trend"]["sigma_level_sq"],
            "slp": s["blocks"]["trend"]["sigma_slope_sq"]}).draws)
    d = fit(k_run); jax.block_until_ready(d)
    best=float('inf')
    for r in range(3):
        t0=time.time(); d=fit(jax.random.fold_in(k_run,1)); jax.block_until_ready(d)
        best=min(best,time.time()-t0)
    mon = jnp.stack([d["so"], jnp.sqrt(d["lvl"]), jnp.sqrt(d["slp"])], -1)
    r = np.asarray(diagnostics.potential_scale_reduction(mon))
    ess = np.asarray(effective_sample_size(mon))
    print(f"{label}: wall {best:.2f}s  maxRhat {r.max():.4f}  minESS {ess.min():.0f}  "
          f"medESS {np.median(ess):.0f}  -> {ess.min()/best:.0f} minESS/s"); sys.stdout.flush()

import sys
which = sys.argv[1] if len(sys.argv)>1 else "all"
B = lambda **kw: Bsts(y=y, blocks=[LocalLinearTrend.default(y)], marginal_sigma_slice=True, **kw)
if which in ("all","t"): run("T tim k=16", B(marginal_move="tim"))
if which in ("all","u"): run("U tim k=32", B(marginal_move="tim", marginal_tim_trials=32))
