"""Spike-slab bench workload at increasing chain counts."""
import time, sys, jax, jax.numpy as jnp, numpy as np
from boom_tpu.inference import effective_sample_size, run_mcmc, diagnostics
from boom_tpu.models.glm import SpikeSlabRegression

n, p, nonzero = 2000, 50, 8
draws, burn = 200, 50
key = jax.random.key(20260817)
k_sim, k_run = jax.random.split(key)
x, y, _ = SpikeSlabRegression.simulate(k_sim, n, p, nonzero, sigma=1.0)
model = SpikeSlabRegression.from_data(x, y, expected_model_size=10.0)

def run(chains):
    fit = jax.jit(lambda k: run_mcmc(
        k, model.kernel(), model.init_state, draws, num_chains=chains,
        burn=burn, jit=False,
        extract=lambda s: {"beta": s["beta"], "sigsq": s["sigsq"]}).draws)
    d = fit(k_run); jax.block_until_ready(d)
    best=float('inf')
    for r in range(3):
        t0=time.time(); d=fit(jax.random.fold_in(k_run,1)); jax.block_until_ready(d)
        best=min(best,time.time()-t0)
    mon = jnp.concatenate([d["beta"][..., :nonzero], d["sigsq"][..., None]], -1)
    r = np.asarray(diagnostics.potential_scale_reduction(mon))
    ess = np.asarray(effective_sample_size(mon))
    print(f"chains={chains}: wall {best:.2f}s maxRhat {r.max():.4f} minESS {ess.min():.0f} -> {ess.min()/best:.0f} minESS/s"); sys.stdout.flush()

for c in (64, 256, 1024, 4096):
    run(c)
