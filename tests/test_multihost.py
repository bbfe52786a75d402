"""Pseudo-multihost test story (VERDICT r4 missing #1, SURVEY §4): two
REAL processes join via jax.distributed.initialize on a localhost
coordinator, build a 4-device global mesh (2 local CPU devices each),
run the chain-sharded spike-slab program across the process boundary,
and must agree with a single-process run of the same seed/configuration
statistically. This is the exact code path a >= 2-host pod slice runs
(initialize -> global mesh -> cross-process sharded arrays -> jit SPMD
-> process_allgather)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "boom_tpu", "parallel",
                      "_multihost_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_multihost_matches_single_process(tmp_path):
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    outs = [tmp_path / f"out{i}.json" for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, "--pid", str(i), "--nprocs", "2",
             "--port", str(port), "--local-devices", "2",
             "--chains", "32", "--draws", "300", "--burn", "100",
             "--out", str(outs[i])],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True)
        for i in range(2)
    ]
    for p in procs:
        try:
            p.wait(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
    for p in procs:
        assert p.returncode == 0, p.communicate()[1][-2000:]

    summaries = [json.loads(o.read_text()) for o in outs]
    for s in summaries:
        assert s["num_processes"] == 2
        assert s["global_devices"] == 4
    # both processes gathered the SAME global draws
    assert summaries[0]["sigsq_mean"] == summaries[1]["sigsq_mean"]
    assert summaries[0]["beta_mean"] == summaries[1]["beta_mean"]

    # single-process reference on the same problem: the sharded
    # multi-process posterior must match statistically (same model,
    # same chain count; different chain placement => different draws,
    # equal posteriors)
    import jax

    from boom_tpu.inference import run_mcmc
    from boom_tpu.models.glm import SpikeSlabRegression

    key = jax.random.key(20260821)
    k_sim, k_init, k_run = jax.random.split(key, 3)
    x, y, beta_true = SpikeSlabRegression.simulate(
        k_sim, 400, 10, 3, sigma=1.0)
    model = SpikeSlabRegression.from_data(x, y, expected_model_size=4.0)
    res = run_mcmc(k_run, model.kernel(), model.init_state, 300,
                   num_chains=32, burn=100,
                   extract=lambda s: {"sigsq": s["sigsq"],
                                      "beta": s["beta"]})
    ref_sigsq = float(np.mean(np.asarray(res.draws["sigsq"])))
    ref_beta = np.mean(np.asarray(res.draws["beta"]), axis=(0, 1))

    got = summaries[0]
    assert abs(got["sigsq_mean"] - ref_sigsq) < 0.15 * ref_sigsq, (
        got["sigsq_mean"], ref_sigsq)
    np.testing.assert_allclose(np.asarray(got["beta_mean"]), ref_beta,
                               atol=0.15)
