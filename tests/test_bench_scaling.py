"""The weak-scaling harness (bench_scaling.py, north-star #3) must run on
the virtual 8-device mesh and show sharding overhead within the 80%
efficiency gate — so that the same harness, run on a real pod slice,
measures true weak scaling gated only by the interconnect."""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))


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
    # sharding the same work over the virtual mesh must not cost > 20%
    assert rows[-1]["efficiency"] >= 0.8, rows
    data = json.loads(out.read_text())
    assert data["efficiency_at_max_devices"] == rows[-1]["efficiency"]


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
    assert rows[-1]["efficiency"] >= 0.8, rows
