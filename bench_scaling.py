"""Weak-scaling efficiency harness — BASELINE.md north-star #3
(>= 80% samples/s efficiency from 1 host to >= 2 hosts).

Runs the chain-sharded spike-slab and bsts local-linear-trend programs
(the two headline workloads) over a ``jax.sharding.Mesh`` at a ladder of
device counts and reports per-device sampling throughput + efficiency.

Two measurement modes, chosen automatically:

* ``weak`` (real multi-device hardware): classic weak scaling — chains
  proportional to devices, efficiency(D) = samples/s/device at D over
  samples/s/device at 1. This is the number the BASELINE table wants;
  run this file unchanged on a pod slice to produce it.

* ``overhead`` (virtual mesh: all "devices" share one host's cores, as
  with XLA_FLAGS=--xla_force_host_platform_device_count=8 on CPU):
  virtual devices cannot run concurrently, so weak scaling is
  meaningless — D x the work on the same cores takes ~D x the wall.
  Instead the harness measures what IS meaningful there: sharding
  overhead. The same total chain count runs (a) as one single-device
  vmap program and (b) shard_map-sharded over D devices; efficiency =
  wall(a) / wall(b). This validates that the mesh program adds < 20%
  overhead (collectives, halo, per-shard dispatch) so that the weak
  number on real hardware is gated only by the interconnect.

Artifact: writes SCALING.json (see --out) and prints ONE json line:
{"metric": "scaling_efficiency", "value": <min efficiency over
workloads at max D>, "unit": "fraction", "vs_baseline": value/0.8}.

Usage:
  python bench_scaling.py                         # auto mode
  python bench_scaling.py --devices 1,2,4,8 --chains-per-device 64
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python bench_scaling.py                     # virtual mesh
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _build_spike_slab(key, dtype=None):
    import jax

    from boom_tpu.models.glm import SpikeSlabRegression

    x, y, _ = SpikeSlabRegression.simulate(key, 1000, 30, 6, sigma=1.0)
    model = SpikeSlabRegression.from_data(x, y, expected_model_size=8.0)
    return model, {"draws": 100, "burn": 20}


def _build_bsts_llt(key, dtype=None):
    import jax
    import jax.numpy as jnp

    from boom_tpu.statespace import Bsts, LocalLinearTrend

    k1, k2, k3 = jax.random.split(key, 3)
    t_len = 200
    slope = jnp.cumsum(0.02 * jax.random.normal(k3, (t_len,)))
    level = jnp.cumsum(slope + 0.3 * jax.random.normal(k1, (t_len,))) + 5.0
    y = level + 0.5 * jax.random.normal(k2, (t_len,))
    model = Bsts(y=y, blocks=[LocalLinearTrend.default(y)],
                 marginal_sigma_slice=True)
    return model, {"draws": 40, "burn": 20}


WORKLOADS = {"spike_slab": _build_spike_slab, "bsts_llt": _build_bsts_llt}


def _timed(fn, *args, reps=2):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    return best


def _run_sharded(model, cfg, devices, chains, key):
    """Wall time of the chain-sharded program over `devices` devices."""
    import numpy as np

    import jax
    from jax.sharding import Mesh

    from boom_tpu.parallel.mesh import run_mcmc_sharded

    mesh = Mesh(np.asarray(devices), ("chains",))
    init = jax.vmap(model.init_state)(jax.random.split(key, chains))

    def fit(k):
        return run_mcmc_sharded(
            k, model.kernel(), init, cfg["draws"], mesh,
            burn=cfg["burn"]).draws

    return _timed(fit, jax.random.fold_in(key, 1))


def _run_single(model, cfg, chains, key):
    """Wall time of the same total work as ONE single-device program."""
    import jax

    from boom_tpu.inference import run_mcmc

    def fit(k):
        return run_mcmc(k, model.kernel(), model.init_state, cfg["draws"],
                        num_chains=chains, burn=cfg["burn"]).draws

    return _timed(fit, jax.random.fold_in(key, 1))


def run_multihost(nprocs, out):
    """Spawn `nprocs` REAL processes that join one jax.distributed job
    (pseudo-multihost on this machine; the identical code path a pod
    slice runs — jax.distributed.initialize, global mesh, cross-process
    sharded chain axis, gloo/ICI collectives). Writes a structural
    artifact; on a real >= 2-host slice run the worker once per host
    with the coordinator's address instead of localhost."""
    import os
    import socket
    import subprocess

    repo = os.path.dirname(os.path.abspath(__file__))
    worker = os.path.join(repo, "boom_tpu", "parallel",
                          "_multihost_worker.py")
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    outs = [os.path.join(repo, f".mh_out{i}.json") for i in range(nprocs)]
    procs = [subprocess.Popen(
        [sys.executable, worker, "--pid", str(i), "--nprocs", str(nprocs),
         "--port", str(port), "--local-devices", "2",
         "--chains", "64", "--draws", "100", "--burn", "50",
         "--out", outs[i]],
        env=env, cwd=repo) for i in range(nprocs)]
    rcs = [p.wait(timeout=900) for p in procs]
    assert all(rc == 0 for rc in rcs), rcs
    summaries = [json.load(open(o)) for o in outs]
    for o in outs:
        os.remove(o)
    results = {"mode": "multihost", "num_processes": nprocs,
               "global_devices": summaries[0]["global_devices"],
               "wall_s": summaries[0]["wall_s"],
               "samples_per_sec": summaries[0]["samples_per_sec"],
               "consistent": all(
                   s["sigsq_mean"] == summaries[0]["sigsq_mean"]
                   for s in summaries)}
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({
        "metric": "multihost_samples_per_sec",
        "value": results["samples_per_sec"],
        "unit": "samples/sec",
        "vs_baseline": 1.0 if results["consistent"] else 0.0}))
    return results


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", default=None,
                    help="comma ladder, e.g. 1,2,4,8 (default: powers of "
                         "2 up to available)")
    ap.add_argument("--chains-per-device", type=int, default=64)
    ap.add_argument("--workloads", default="spike_slab,bsts_llt")
    ap.add_argument("--mode", choices=["auto", "weak", "overhead"],
                    default="auto")
    ap.add_argument("--multihost", type=int, default=0, metavar="NPROCS",
                    help="spawn NPROCS distributed processes (2 local "
                         "CPU devices each) and run the chain-sharded "
                         "program over the global mesh")
    ap.add_argument("--out", default="SCALING.json")
    args = ap.parse_args(argv)

    if args.multihost:
        return run_multihost(args.multihost, args.out)

    # honor JAX_PLATFORMS=cpu even when a sitecustomize pre-selected a
    # different backend at interpreter startup (the conftest trick)
    import os

    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")
        try:
            from jax.extend.backend import clear_backends

            clear_backends()
        except Exception:
            pass

    import jax

    devs = jax.devices()
    if args.devices:
        ladder = [int(d) for d in args.devices.split(",")]
    else:
        ladder, d = [], 1
        while d <= len(devs):
            ladder.append(d)
            d *= 2
    assert ladder[-1] <= len(devs), (ladder, len(devs))

    mode = args.mode
    if mode == "auto":
        # virtual mesh <=> multiple jax devices on one process/host kind
        # that cannot run concurrently (forced host platform count)
        kinds = {d.device_kind for d in devs}
        mode = ("overhead" if (len(devs) > 1 and kinds == {"cpu"})
                else "weak")

    cpd = args.chains_per_device
    results = {"mode": mode, "chains_per_device": cpd, "ladder": ladder,
               "device_kind": devs[0].device_kind, "workloads": {}}
    key = jax.random.key(20260821)

    for wi, name in enumerate(args.workloads.split(",")):
        model, cfg = WORKLOADS[name](jax.random.fold_in(key, wi))
        total_draws = cfg["draws"]
        rows = []
        base_per_dev = None
        for d_count in ladder:
            kd = jax.random.fold_in(key, 100 * wi + d_count)
            if mode == "weak":
                chains = cpd * d_count
                wall = _run_sharded(model, cfg, devs[:d_count], chains, kd)
                per_dev = total_draws * chains / wall / d_count
                if base_per_dev is None:
                    base_per_dev = per_dev
                eff = per_dev / base_per_dev
            else:
                # overhead mode: FIXED total chains; sharded vs vmap
                chains = cpd * ladder[-1]
                wall = _run_sharded(model, cfg, devs[:d_count], chains, kd)
                wall_1 = _run_single(model, cfg, chains, kd)
                per_dev = total_draws * chains / wall / d_count
                eff = wall_1 / wall
            rows.append({"devices": d_count, "chains": chains,
                         "wall_s": round(wall, 4),
                         "samples_per_sec_per_device": round(per_dev, 1),
                         "efficiency": round(eff, 4)})
            print(f"# {name} D={d_count}: wall {wall:.2f}s, "
                  f"{per_dev:.0f} samples/s/dev, eff {eff:.2%}",
                  file=sys.stderr)
        results["workloads"][name] = rows

    final_effs = [results["workloads"][w][-1]["efficiency"]
                  for w in results["workloads"]]
    value = min(final_effs)
    results["efficiency_at_max_devices"] = value
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({
        "metric": f"scaling_efficiency_{mode}",
        "value": round(value, 4),
        "unit": "fraction",
        "vs_baseline": round(value / 0.8, 4),
    }))
    return results


if __name__ == "__main__":
    main()
