"""Progress tracking for long MCMC runs.

Reference: cpputil/ProgressTracker.hpp:27 (prints a timestamped marker
every `ping` iterations) and the R-side print_R_timestamp
(Interfaces/R/print_R_timestamp.hpp), used by the bsts driver loop
(bsts.cc:89).

In the TPU design the jitted scan is opaque, so progress is reported at
chunk boundaries by the chunked driver (inference.driver.run_mcmc_chunked),
which calls ``tracker.update(iteration)`` between device launches.
"""

from __future__ import annotations

import sys
import time


class ProgressTracker:
    """Prints `=-=-=-=-= iteration N ... =-=-=-=-=` markers like the
    reference, plus wall-clock and draws/sec."""

    def __init__(self, niter: int, ping: int = 100, stream=None,
                 prefix: str = ""):
        self.niter = int(niter)
        self.ping = max(1, int(ping))
        self.stream = stream if stream is not None else sys.stderr
        self.prefix = prefix
        self.start = time.monotonic()
        self._last_printed = -1

    def update(self, iteration: int):
        """Report progress if `iteration` crossed a ping boundary."""
        if iteration // self.ping > self._last_printed // self.ping:
            elapsed = time.monotonic() - self.start
            rate = iteration / elapsed if elapsed > 0 else float("inf")
            print(
                f"=-=-=-=-= {self.prefix}iteration {iteration} of "
                f"{self.niter} ({elapsed:.1f}s, {rate:.1f} it/s) "
                f"=-=-=-=-=",
                file=self.stream, flush=True)
        self._last_printed = iteration

    def done(self):
        elapsed = time.monotonic() - self.start
        print(f"=-=-=-=-= {self.prefix}done: {self.niter} iterations in "
              f"{elapsed:.1f}s =-=-=-=-=", file=self.stream, flush=True)
