"""Benchmark: effective samples/sec/chip on spike-and-slab regression.

The BASELINE.md north-star metric (>= 1000 effective samples/sec/chip on
TPU v5p; this container benches whatever single chip is attached). The
benchmark fits the flagship SSVS sampler on a synthetic sparse-regression
problem with many vmapped chains — the TPU-native throughput axis — and
reports min-ESS-per-second over the monitored parameters.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp


def main():
    import numpy as np

    from boom_tpu.inference import effective_sample_size, run_mcmc
    from boom_tpu.models.glm import SpikeSlabRegression

    n, p, nonzero = 2000, 50, 8
    chains, draws, burn = 64, 200, 50

    key = jax.random.key(20260817)
    k_sim, k_run = jax.random.split(key)
    x, y, beta_true = SpikeSlabRegression.simulate(k_sim, n, p, nonzero,
                                                   sigma=1.0)
    model = SpikeSlabRegression.from_data(x, y, expected_model_size=10.0)

    def fit(k):
        return run_mcmc(
            k, model.kernel(), model.init_state, draws,
            num_chains=chains, burn=burn, jit=False,
            extract=lambda s: {"beta": s["beta"], "sigsq": s["sigsq"]})

    fit_jit = jax.jit(lambda k: fit(k).draws)
    # compile
    d = fit_jit(k_run)
    jax.block_until_ready(d)
    # timed run
    t0 = time.time()
    d = fit_jit(jax.random.fold_in(k_run, 1))
    jax.block_until_ready(d)
    elapsed = time.time() - t0

    beta = d["beta"]  # [chains, draws, p]
    sigsq = d["sigsq"]  # [chains, draws]
    monitored = jnp.concatenate(
        [beta[..., :nonzero], sigsq[..., None]], axis=-1)
    ess = np.asarray(effective_sample_size(monitored))
    min_ess = float(np.min(ess))
    ess_per_sec = min_ess / elapsed

    result = {
        "metric": "spike_slab_min_ess_per_sec_per_chip",
        "value": round(ess_per_sec, 2),
        "unit": "effective samples/sec/chip",
        "vs_baseline": round(ess_per_sec / 1000.0, 4),
    }
    print(json.dumps(result))
    print(
        f"# details: {chains} chains x {draws} draws (+{burn} burn), "
        f"n={n} p={p}, wall {elapsed:.2f}s, min ESS {min_ess:.0f}, "
        f"median ESS {float(np.median(ess)):.0f}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
