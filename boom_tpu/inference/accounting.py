"""Move accounting and progress reporting.

Reference: Samplers/MoveAccounting.hpp:54 (per-move-type acceptance
counts + cumulative time, MoveTimer :36) and
cpputil/ProgressTracker.hpp:27 (print every `ping` iterations; the R
side's print_R_timestamp).

TPU form: acceptance/attempt counters are scan-carried pytree state
(pure, jittable, combinable across chains with psum — BOOM's
combine_data contract); wall-time per move type is host-side (times
compiled blocks, not per-op). Progress printing uses jax.debug.callback
so it fires from inside jitted scans every `ping` sweeps.
"""

from __future__ import annotations

import time
from typing import Any

import jax
import jax.numpy as jnp


def accounting_init(move_names):
    """Zeroed counters for the named move types."""
    z = jnp.zeros((), jnp.result_type(float))
    return {name: {"attempts": z, "accepts": z} for name in move_names}


def record_move(acct, name, accepted, weight=1.0):
    """Pure update of one move's counters (use inside kernels)."""
    out = dict(acct)
    entry = dict(out[name])
    entry["attempts"] = entry["attempts"] + weight
    entry["accepts"] = entry["accepts"] + weight * jnp.asarray(
        accepted, entry["accepts"].dtype)
    out[name] = entry
    return out


def acceptance_rates(acct):
    return {
        name: float(v["accepts"]) / max(float(v["attempts"]), 1.0)
        for name, v in acct.items()
    }


def combine_accounting(acct, axis_name):
    """psum counters across a mesh axis (combine_data as all-reduce)."""
    return jax.tree_util.tree_map(
        lambda a: jax.lax.psum(a, axis_name), acct)


class MoveTimer:
    """Host-side block timer keyed by move name (MoveAccounting's
    cumulative-time half; times jitted blocks, not traced ops)."""

    def __init__(self):
        self.totals: dict[str, float] = {}

    def time(self, name):
        timer = self

        class _Ctx:
            def __enter__(self):
                self.t0 = time.time()

            def __exit__(self, *exc):
                timer.totals[name] = (timer.totals.get(name, 0.0)
                                      + time.time() - self.t0)

        return _Ctx()


def progress_callback(ping: int, total: int | None = None):
    """Returns f(i, value) to call inside a scan body: prints every
    `ping` sweeps via jax.debug.callback (ProgressTracker analog)."""
    start = time.time()

    def host_print(i, value):
        i = int(i)
        if i % ping == 0:
            elapsed = time.time() - start
            frac = f"/{total}" if total else ""
            print(f"[boom_tpu] sweep {i}{frac} "
                  f"({elapsed:.1f}s) monitor={float(value):.4f}",
                  flush=True)

    def report(i, value):
        jax.debug.callback(host_print, i, value)

    return report
