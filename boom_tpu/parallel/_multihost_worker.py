"""Pseudo-multihost worker: one PROCESS of a multi-process JAX job.

Run two (or more) of these against the same coordinator to exercise the
true multi-host path — `jax.distributed.initialize`, a global mesh over
per-process local devices, cross-process sharded init states/keys, and
the chain-sharded MCMC driver — on one machine with CPU devices
(SURVEY §4's multi-host test story; BASELINE north-star #3). The same
entry sequence (initialize_multihost -> make_mesh -> run_mcmc_sharded)
is what a real >= 2-host pod slice runs.

Usage (the test and `bench_scaling.py --multihost` spawn these). Invoke
by FILE PATH, not `-m`: `-m` imports the `boom_tpu.parallel` package
first, whose module-level jnp constants bind the backend before
`jax.distributed.initialize` can run (this environment's sitecustomize
makes that binding eager):
  python boom_tpu/parallel/_multihost_worker.py \
      --pid 0 --nprocs 2 --port 19741 --local-devices 2 --out out0.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--pid", type=int, required=True)
    ap.add_argument("--nprocs", type=int, required=True)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--local-devices", type=int, default=2)
    ap.add_argument("--chains", type=int, default=32)
    ap.add_argument("--draws", type=int, default=300)
    ap.add_argument("--burn", type=int, default=100)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    # CPU platform, before any jax import side effects bind a backend.
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("XLA_FLAGS", None)

    # Distributed init must happen BEFORE anything binds the backend —
    # importing boom_tpu evaluates module-level jnp constants, so the
    # initialize call cannot come after it. On a real slice the same
    # rule applies: call initialize_multihost first thing in main().
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_num_cpu_devices", args.local_devices)
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{args.port}",
        num_processes=args.nprocs, process_id=args.pid)

    import numpy as np

    from boom_tpu.models.glm import SpikeSlabRegression
    from boom_tpu.parallel.mesh import make_mesh, run_mcmc_sharded

    assert jax.process_count() == args.nprocs, jax.process_count()
    n_global = len(jax.devices())
    assert n_global == args.nprocs * args.local_devices, n_global

    # Same seed on every process => identical data/init (SPMD contract).
    key = jax.random.key(20260821)
    k_sim, k_init, k_run = jax.random.split(key, 3)
    x, y, _ = SpikeSlabRegression.simulate(k_sim, 400, 10, 3, sigma=1.0)
    model = SpikeSlabRegression.from_data(x, y, expected_model_size=4.0)

    import time

    mesh = make_mesh({"chains": n_global})
    init = jax.vmap(model.init_state)(
        jax.random.split(k_init, args.chains))
    t0 = time.time()
    res = run_mcmc_sharded(
        k_run, model.kernel(), init, args.draws, mesh, burn=args.burn,
        extract=lambda s: {"sigsq": s["sigsq"], "beta": s["beta"]})
    jax.block_until_ready(res.draws)
    wall = time.time() - t0

    from jax.experimental import multihost_utils

    draws = multihost_utils.process_allgather(res.draws, tiled=True)
    summary = {
        "process_id": args.pid,
        "num_processes": jax.process_count(),
        "global_devices": n_global,
        "wall_s": round(wall, 3),
        "samples_per_sec": round(args.draws * args.chains / wall, 1),
        "sigsq_mean": float(np.mean(draws["sigsq"])),
        "beta_mean": np.mean(
            np.asarray(draws["beta"]), axis=(0, 1)).tolist(),
    }
    print(json.dumps(summary), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f)


if __name__ == "__main__":
    main()
