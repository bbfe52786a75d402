"""Test configuration: CPU backend with 8 virtual devices and float64.

Tests run on CPU (the TPU chip is reserved for benchmarks) with an 8-device
virtual mesh so every sharding path is exercised without real multi-chip
hardware, mirroring the multi-host test story SURVEY.md §4 calls for.
float64 is enabled so statistical tolerances match the double-precision
reference; library code itself is dtype-agnostic.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize may have force-selected a remote TPU
# backend at interpreter startup (jax.config.update("jax_platforms",
# "axon,cpu")); undo that so tests run on the local CPU with the virtual
# 8-device mesh.
jax.config.update("jax_platforms", "cpu")
try:
    from jax.extend.backend import clear_backends

    clear_backends()
except Exception:
    pass

# The f32 robustness tier (tests/test_f32_robustness.py, -m f32) runs
# with x64 DISABLED so every kernel executes in the float32 numerics the
# TPU actually uses; everything else gets double precision.
if os.environ.get("BOOM_TPU_F32_TIER", "") == "1":
    jax.config.update("jax_enable_x64", False)
else:
    jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: DISABLED. This environment's XLA writes
# CPU AOT artifacts with tuning flags (+prefer-no-gather/scatter) that
# the loader reports as unsupported host features on EVERY load — each
# cache hit logs a machine-type-mismatch warning and two full-suite
# runs segfaulted (SIGILL in AOT-loaded kernels: test_hmm, then
# test_glm_extras after a fresh host-keyed cache). Compiles are slower
# without it; correctness wins. Re-enable only if the loader mismatch
# is fixed upstream:
#   jax.config.update("jax_compilation_cache_dir", <host-keyed dir>)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from _slow_manifest import SLOW_TESTS  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """Apply the `slow` marker from the duration-derived manifest, plus
    any inline @pytest.mark.slow decorations. Smoke tier:
    `pytest -m "not slow"` (< 5 min); full suite ~60 min (documented in
    README)."""
    for item in items:
        nodeid = item.nodeid.split("[")[0]
        if item.nodeid in SLOW_TESTS or nodeid in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng_key():
    return jax.random.key(0)


@pytest.fixture
def np_rng():
    return np.random.default_rng(0)


# ---- slow-manifest drift detection ---------------------------------------
# The smoke tier depends on tests/_slow_manifest.py staying current. This
# hook measures every test's call duration and, at session end, reports
# any test that ran > SLOW_THRESHOLD_S without a slow marker — the
# regeneration signal the manifest's header asks for, produced on every
# run instead of a manual --durations pass.
SLOW_THRESHOLD_S = 15.0
_unmarked_slow = []


def pytest_runtest_logreport(report):
    if report.when != "call" or report.duration < SLOW_THRESHOLD_S:
        return
    nodeid = report.nodeid.split("[")[0]
    if report.nodeid in SLOW_TESTS or nodeid in SLOW_TESTS:
        return
    if "slow" in getattr(report, "keywords", {}):
        return
    _unmarked_slow.append((report.nodeid, report.duration))


def pytest_terminal_summary(terminalreporter):
    if not _unmarked_slow:
        return
    terminalreporter.section("slow-manifest drift")
    terminalreporter.write_line(
        "these tests exceeded %.0fs without a `slow` marker — add them "
        "to tests/_slow_manifest.py to keep the smoke tier honest:"
        % SLOW_THRESHOLD_S)
    for nodeid, dur in sorted(_unmarked_slow, key=lambda t: -t[1]):
        terminalreporter.write_line(f'    "{nodeid}",  # {dur:.1f}s')
