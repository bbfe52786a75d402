"""The weak-scaling harness (bench_scaling.py, north-star #3) must run on
the virtual 8-device mesh and emit a structurally complete artifact.

These are CORRECTNESS tests: they gate on artifact structure (ladder,
rows, efficiency fields, JSON round-trip), not on tight wall-clock
ratios. The >= 0.8 efficiency gate belongs to the perf harness itself —
bench_scaling.py computes and records `efficiency_at_max_devices` and
its JSON line reports `vs_baseline` against the 0.8 north-star; on a
contended CI box a wall(vmap)/wall(shard_map) ratio is noise (round 4's
tight assert was the full tier's only flake). A very loose sanity floor
(0.3) remains so a pathological 3x sharding overhead still fails.
"""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

# Pathological-overhead floor, NOT a perf gate (see module docstring).
SANITY_FLOOR = 0.3


@pytest.mark.slow
def test_scaling_harness_overhead_mode(tmp_path):
    import jax

    import bench_scaling

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    out = tmp_path / "SCALING.json"
    results = bench_scaling.main([
        "--devices", "1,2,4,8", "--chains-per-device", "8",
        "--workloads", "spike_slab", "--out", str(out)])
    assert results["mode"] == "overhead"
    rows = results["workloads"]["spike_slab"]
    assert [r["devices"] for r in rows] == [1, 2, 4, 8]
    for r in rows:
        assert r["wall_s"] > 0
        assert r["samples_per_sec_per_device"] > 0
        assert r["efficiency"] >= SANITY_FLOOR, rows
    data = json.loads(out.read_text())
    assert data["efficiency_at_max_devices"] == rows[-1]["efficiency"]
    assert data["ladder"] == [1, 2, 4, 8]


@pytest.mark.slow
def test_scaling_harness_bsts_workload(tmp_path):
    import jax

    import bench_scaling

    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 virtual devices")
    out = tmp_path / "SCALING_BSTS.json"
    results = bench_scaling.main([
        "--devices", "1,4", "--chains-per-device", "4",
        "--workloads", "bsts_llt", "--out", str(out)])
    rows = results["workloads"]["bsts_llt"]
    assert [r["devices"] for r in rows] == [1, 4]
    for r in rows:
        assert r["wall_s"] > 0
        assert r["efficiency"] >= SANITY_FLOOR, rows
    assert json.loads(out.read_text())["workloads"]["bsts_llt"]
