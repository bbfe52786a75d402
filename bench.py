"""Benchmark: effective samples/sec/chip on the two BASELINE.md north-star
workloads — spike-and-slab regression and a bsts local-linear-trend model.

Headline value = the smaller of the two min-ESS/sec numbers (conservative).
Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}; per-
workload details go to stderr.

Config history (so cross-round numbers are comparable):
  r01: spike_slab n=2000 p=50 chains=64 draws=200 burn=50 (single-shot
       timing); bsts_llt chains=8192 draws=150 burn=30 — RETIRED: the
       R-hat gate later showed that run's sampler was stuck (f32 filter
       failure), so r01's bsts number is not a valid baseline.
  r02: bsts_llt re-tuned to chains=4096 draws=250 burn=300 with
       marginal_sigma_slice (first CONVERGED bsts number, 4564).
  r03: timing switched to best-of-3 steady state (_timed_best below);
       model configs frozen at the r02 settings.
  r04: spike_slab chains retuned 64 -> 1024 (the r01-era 64 chains
       undersold the chip: measured 19.9k/27.2k/30.9k minESS/s at
       64/256/1024 chains, R-hat-gated; 4096 chains shows R-hat 1.8 —
       diagnosed as slow BETWEEN-MODE mixing, not numerics: zero
       stuck/NaN chains, but a few percent sit in a high-sigsq
       null-model basin that one-flip-at-a-time SSVS exits slowly,
       and 4096 is past the throughput knee anyway — so 1024;
       per-chain draws/burn unchanged, purely occupancy).
       bsts_llt data/chain/draw/burn counts UNCHANGED; its marginal variance
       move switched from coordinate+random-direction slice (~75
       sequential T-scans per sweep — the profiled 90% of the sweep)
       to the TIM multiple-try independence sampler (marginal_move=
       "tim": mode+Laplace multivariate-T proposal fitted once, 16
       candidates scored in ONE batched filter pass per sweep;
       Samplers/TIM.hpp:42 applied to the marginal). Wall 33.2s ->
       19.6s AND the recorded variance draws become near-iid marginal-
       posterior samples (acceptance ~1 independence moves), so
       min-ESS ~= draws*chains by design — that is the point of the
       move, not an estimator artifact; test_bsts_marginal.py checks
       the posterior matches the plain conditional sampler's in
       distribution. Also r04: fused simulate+filter smoother scan,
       loglik-only filter path, stacked ASIS scans.
  r05: headline workloads now run FIRST and the optional evidence
       lines (pallas, mbsts) run in isolated subprocesses — the r04
       artifact was lost to an mbsts device fault poisoning the shared
       process. bsts_llt monitored set WIDENED from the 3 TIM-refreshed
       variances to also include two state functionals (sampled level
       at T/2, one-step-ahead forecast mean = level+slope at T) so the
       R-hat gate and min-ESS keep bite on state-path mixing; measured
       against this wider monitor bsts_llt reads 32.7k min-ESS/s (the
       53k r04 number was min over TIM-refreshed scalars only — the
       32.7k is the honest successor, gated at R-hat 1.0047).
       spike_slab: gated-flip rank-1 optimization (one sign+accept-
       parameterized pass per flip instead of sweep+unsweep+select)
       took the sweep 6.62 -> 6.23 s => 32.6k min-ESS/s; the bench
       program pins mode_jump=False (see bench_spike_slab comment and
       PERF.md §3). Program sizes consult KNOWN_BACKEND_EDGES.json;
       mbsts evidence runs at the bisected safe size (128 chains).
       Late r05: kalman time-scan unroll is platform-aware (32 on TPU,
       measured 19.62s @8 -> 18.82s @32; 64 regresses to 22.2s) =>
       bsts_llt 33.8k. Final validated headline: 32,593 (spike_slab
       binds; both workloads R-hat-gated, rc=0).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

_EDGES_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "KNOWN_BACKEND_EDGES.json")


def _known_edges():
    """Machine-readable taxonomy of tunneled-backend fault classes
    (VERDICT r4 item 10). bench.py sizes its programs from the
    `safe_sizes` section; a fresh fault adds an `edges` entry."""
    try:
        with open(_EDGES_PATH) as f:
            return json.load(f)
    except Exception:
        return {"edges": [], "safe_sizes": {}}


def _timed_best(fn, args, reps=3):
    """Best-of-reps steady-state wall time for a jitted callable.

    Methodology note (round 3): rounds 1-2 timed a SINGLE post-compile
    execution, which is biased high by one-time dispatch/transfer warmup
    on the tunneled TPU backend (measured: first post-compile run 1.8s,
    steady state 0.64s on the spike-slab config — the entire r01->r02
    "25% regression" at identical ESS was this noise). Each arg gets one
    unmeasured warmup execution; we then report the best of `reps` runs,
    the standard low-noise throughput estimator. The returned draws come
    from the last run (all runs use the same key, so draws are identical).
    """
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    return out, best


def _check_rhat(monitored, label, threshold=1.02):
    """Convergence gate: max split rank-normalized R-hat over monitored
    scalars must be near 1 at bench config. Guards against reporting
    ESS of a broken/stuck sampler (which round 1 did: an f32 TPU
    filter failure left sigsq_obs at initialization while the ESS
    estimator reported huge values on what was effectively noise)."""
    from boom_tpu.inference import diagnostics

    r = np.asarray(diagnostics.potential_scale_reduction(monitored))
    rmax = float(np.max(r))
    print(f"# {label}: max R-hat {rmax:.4f} (gate < {threshold})",
          file=sys.stderr)
    if not rmax < threshold:
        print(f"# {label}: CONVERGENCE GATE FAILED", file=sys.stderr)
        raise SystemExit(1)
    return rmax


def bench_spike_slab():
    from boom_tpu.inference import effective_sample_size, run_mcmc
    from boom_tpu.models.glm import SpikeSlabRegression

    n, p, nonzero = 2000, 50, 8
    chains, draws, burn = 1024, 200, 50
    key = jax.random.key(20260817)
    k_sim, k_run = jax.random.split(key)
    x, y, _ = SpikeSlabRegression.simulate(k_sim, n, p, nonzero, sigma=1.0)
    # mode_jump=False: the r5 between-mode move (library default ON)
    # costs ~7% here and this 1024-chain program is R-hat-clean without
    # it (1.0004) — the basin it fixes only appears at chain counts the
    # backend silently corrupts (KNOWN_BACKEND_EDGES.json); r01-r04
    # comparability wants the identical kernel. See PERF.md §3.
    model = SpikeSlabRegression.from_data(x, y, expected_model_size=10.0,
                                          mode_jump=False)

    fit = jax.jit(lambda k: run_mcmc(
        k, model.kernel(), model.init_state, draws, num_chains=chains,
        burn=burn, jit=False,
        extract=lambda s: {"beta": s["beta"], "sigsq": s["sigsq"]}).draws)
    d = fit(k_run)
    jax.block_until_ready(d)
    d, elapsed = _timed_best(fit, (jax.random.fold_in(k_run, 1),))
    monitored = jnp.concatenate(
        [d["beta"][..., :nonzero], d["sigsq"][..., None]], axis=-1)
    _check_rhat(monitored, "spike_slab")
    ess = np.asarray(effective_sample_size(monitored))
    return float(np.min(ess)) / elapsed, elapsed, ess


def bench_bsts_llt():
    from boom_tpu.inference import effective_sample_size, run_mcmc
    from boom_tpu.statespace import Bsts, LocalLinearTrend

    # chains=4096 (the r02 retune; 8192-chain programs currently fault
    # the tunneled backend). Data include genuine slope innovations so
    # every monitored variance posterior is interior. The TIM marginal
    # move (see config history r04) integrates the state path out and
    # refreshes the recorded variances with near-iid marginal-posterior
    # draws each sweep.
    t_len, chains, draws, burn = 500, 4096, 250, 300
    key = jax.random.key(4207)
    k1, k2, k3, k_run = jax.random.split(key, 4)
    slope = jnp.cumsum(0.02 * jax.random.normal(k3, (t_len,)))
    level = jnp.cumsum(slope + 0.3 * jax.random.normal(k1, (t_len,))) + 5.0
    y = level + 0.5 * jax.random.normal(k2, (t_len,))
    model = Bsts(y=y, blocks=[LocalLinearTrend.default(y)],
                 marginal_sigma_slice=True, marginal_move="tim")

    # Monitored set (r05, VERDICT r4 item 3): the three variances PLUS
    # two state functionals the TIM move does NOT directly refresh —
    # the sampled level at T/2 and the one-step-ahead forecast mean
    # (level + slope at T). These come from the simulation smoother's
    # exact conditional draw given the variances, so they keep the
    # R-hat gate and the min-ESS headline sensitive to state-path
    # mixing, not only to the TIM-refreshed scalars.
    fit = jax.jit(lambda k: run_mcmc(
        k, model.kernel(), model.init_state, draws, num_chains=chains,
        burn=burn, jit=False,
        extract=lambda s: {
            "so": s["sigsq_obs"],
            "lvl": s["blocks"]["trend"]["sigma_level_sq"],
            "slp": s["blocks"]["trend"]["sigma_slope_sq"],
            "mid": s["alpha"][t_len // 2, 0],
            "fcast": s["alpha"][-1, 0] + s["alpha"][-1, 1]}).draws)
    d = fit(k_run)
    jax.block_until_ready(d)
    d, elapsed = _timed_best(fit, (jax.random.fold_in(k_run, 1),))
    monitored = jnp.stack(
        [d["so"], jnp.sqrt(d["lvl"]), jnp.sqrt(d["slp"]),
         d["mid"], d["fcast"]], axis=-1)
    _check_rhat(monitored, "bsts_llt")
    ess = np.asarray(effective_sample_size(monitored))
    return float(np.min(ess)) / elapsed, elapsed, ess


def bench_pallas_smoother():
    """Temporal-parallelism evidence line (stderr): the in-VMEM Pallas
    scan smoother vs the sequential scan on a long single series with 8
    chains — the reference's `bsts(y, niter)` regime. Not part of the
    headline metric (different unit)."""
    from boom_tpu.statespace.kalman import SsmParams, simulation_smoother
    from boom_tpu.statespace.pallas_scan import pallas_simulation_smoother

    d, t_len = 2, 4096
    params = SsmParams(
        z=jnp.zeros((d,)).at[0].set(1.0),
        t_mat=jnp.eye(d).at[0, 1].set(1.0),
        r_mat=jnp.eye(d), q_mat=jnp.diag(jnp.full((d,), 0.1)),
        h=jnp.asarray(0.5), a0=jnp.zeros((d,)), p0=jnp.eye(d) * 2.0)
    y = jax.random.normal(jax.random.key(0), (t_len,))
    ks = jax.random.split(jax.random.key(1), 8)

    def timed(smoother):
        fn = jax.jit(lambda k: jax.vmap(
            lambda kk: smoother(kk, params, y))(k))
        jax.block_until_ready(fn(ks))
        t0 = time.time()
        for _ in range(20):
            out = fn(ks)
        jax.block_until_ready(out)
        return (time.time() - t0) / 20 * 1e3

    t_seq = timed(simulation_smoother)
    t_pal = timed(pallas_simulation_smoother)
    print(f"# pallas_smoother: LLT T={t_len} 8 chains: sequential "
          f"{t_seq:.2f}ms, pallas {t_pal:.2f}ms -> {t_seq / t_pal:.1f}x",
          file=sys.stderr)


def bench_mbsts():
    """Multivariate-flagship evidence line (stderr): min-ESS/s on the
    mbsts factor/observation sds at a moderate panel (not part of the
    headline metric — the BASELINE workloads are spike_slab and
    bsts_llt). Uses the r04 unit-diagonal + factor-ASIS kernel."""
    from boom_tpu.inference import effective_sample_size, run_mcmc
    from boom_tpu.inference import diagnostics
    from boom_tpu.statespace.multivariate import MultivariateBsts

    # Sizes come from KNOWN_BACKEND_EDGES.json: the r4 config
    # (K=8 T=300 chains=256) faults the tunneled device and the fault
    # poisons the whole process (VERDICT r4 weak #1) — which is why
    # this function now only ever runs in a --evidence subprocess.
    sz = _known_edges().get("safe_sizes", {}).get("bench_mbsts", {})
    t_len = int(os.environ.get("BOOM_MBSTS_T", sz.get("t_len", 300)))
    k_dim = int(os.environ.get("BOOM_MBSTS_K", sz.get("k_dim", 8)))
    chains = int(os.environ.get("BOOM_MBSTS_CHAINS", sz.get("chains", 256)))
    draws, burn = 150, 150
    key = jax.random.key(77)
    k1, k2, k3, k_run = jax.random.split(key, 4)
    factor = jnp.cumsum(0.3 * jax.random.normal(k1, (t_len,)))
    load = 0.5 + jax.random.uniform(k3, (k_dim,))
    load = load.at[0].set(1.0)
    y = (factor[:, None] * load[None, :]
         + 0.5 * jax.random.normal(k2, (t_len, k_dim)))
    model = MultivariateBsts(y=y, num_factors=1)

    fit = jax.jit(lambda k: run_mcmc(
        k, model.kernel(), model.init_state, draws, num_chains=chains,
        burn=burn, jit=False,
        extract=lambda s: {"fs": s["factor_sigsq"],
                           "so": s["sigsq_obs"]}).draws)
    d = fit(k_run)
    jax.block_until_ready(d)
    d, elapsed = _timed_best(fit, (jax.random.fold_in(k_run, 1),))
    mon = jnp.concatenate([jnp.sqrt(d["fs"]), jnp.sqrt(d["so"])], -1)
    r = float(np.max(np.asarray(
        diagnostics.potential_scale_reduction(mon))))
    ess = np.asarray(effective_sample_size(mon))
    print(f"# mbsts: K={k_dim} T={t_len} {chains} chains: "
          f"{ess.min() / elapsed:.0f} min-ESS/s (wall {elapsed:.2f}s, "
          f"max R-hat {r:.4f})", file=sys.stderr)


_EVIDENCE = {"pallas": bench_pallas_smoother, "mbsts": bench_mbsts}


def _run_evidence_subprocess(name, timeout_s=600):
    """Run one optional evidence line in a CHILD process. Round-4
    lesson (VERDICT r4 weak #1): a device fault on the tunneled
    backend wedges the JAX client for the rest of the process, so any
    evidence program sharing the headline's process can destroy the
    round's one mandatory artifact. A child that faults or hangs just
    prints a skipped-with-reason note here."""
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--evidence", name],
            capture_output=True, text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        print(f"# {name}: SKIPPED (evidence subprocess exceeded "
              f"{timeout_s}s)", file=sys.stderr)
        return
    for line in proc.stderr.splitlines():
        if line.startswith("#"):
            print(line, file=sys.stderr)
    if proc.returncode != 0:
        tail = proc.stderr.strip().splitlines()[-1:] or ["(no output)"]
        print(f"# {name}: SKIPPED (evidence subprocess rc="
              f"{proc.returncode}: {tail[0][:160]})", file=sys.stderr)


def main():
    # Headline workloads FIRST, in this process — nothing optional runs
    # before them (VERDICT r4 item 1).
    ss_rate, ss_t, ss_ess = bench_spike_slab()
    print(f"# spike_slab: {ss_rate:.1f} min-ESS/s (wall {ss_t:.2f}s, "
          f"ess min {ss_ess.min():.0f} med {np.median(ss_ess):.0f})",
          file=sys.stderr)
    bsts_rate, bsts_t, bsts_ess = bench_bsts_llt()
    print(f"# bsts_llt: {bsts_rate:.1f} min-ESS/s (wall {bsts_t:.2f}s, "
          f"ess min {bsts_ess.min():.0f} med {np.median(bsts_ess):.0f})",
          file=sys.stderr)

    value = min(ss_rate, bsts_rate)
    print(json.dumps({
        "metric": "min_ess_per_sec_per_chip(spike_slab,bsts_llt)",
        "value": round(value, 2),
        "unit": "effective samples/sec/chip",
        "vs_baseline": round(value / 1000.0, 4),
    }), flush=True)

    # Optional evidence lines AFTER the headline, each isolated in a
    # subprocess; failures cannot touch the JSON line already printed.
    if os.environ.get("BOOM_BENCH_SKIP_EVIDENCE", "") != "1":
        for name in ("pallas", "mbsts"):
            _run_evidence_subprocess(name)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--evidence":
        _EVIDENCE[sys.argv[2]]()
    else:
        main()
