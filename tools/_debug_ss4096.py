"""Diagnose the 4096-chain spike-slab R-hat 1.8 failure."""
import jax, jax.numpy as jnp, numpy as np, sys
from boom_tpu.inference import run_mcmc
from boom_tpu.models.glm import SpikeSlabRegression

n, p, nonzero = 2000, 50, 8
draws, burn = 200, 50
key = jax.random.key(20260817)
k_sim, k_run = jax.random.split(key)
x, y, _ = SpikeSlabRegression.simulate(k_sim, n, p, nonzero, sigma=1.0)
model = SpikeSlabRegression.from_data(x, y, expected_model_size=10.0)
chains = 4096
fit = jax.jit(lambda k: run_mcmc(
    k, model.kernel(), model.init_state, draws, num_chains=chains,
    burn=burn, jit=False,
    extract=lambda s: {"sigsq": s["sigsq"], "ng": jnp.sum(s["gamma"], -1)}).draws)
d = fit(jax.random.fold_in(k_run, 1)); jax.block_until_ready(d)
sig = np.asarray(d["sigsq"])  # [chains, draws]
ng = np.asarray(d["ng"])
within_var = sig.var(axis=1)
stuck = within_var < 1e-12
print("chains stuck (zero within-chain var):", stuck.sum(), "of", chains)
print("sigsq of stuck chains:", sig[stuck, 0][:10] if stuck.any() else "none")
print("nan chains:", np.isnan(sig).any(axis=1).sum())
print("sig overall mean/median:", sig.mean(), np.median(sig))
print("mean active coords overall:", ng.mean(), "max:", ng.max())
if stuck.any():
    i = np.where(stuck)[0][0]
    print("stuck chain", i, "sigsq:", sig[i, :5], "ng:", ng[i, :5])
bad = np.isnan(sig).any(axis=1) | stuck
print("bad chains:", bad.sum())
