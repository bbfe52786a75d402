"""Inference core: kernel protocol, multi-chain driver, diagnostics.

Replaces the reference's Model/PosteriorSampler machinery (SURVEY.md §2.5)
with pure functions: state pytrees, (key, state) -> state kernels, and a
vmapped+scanned driver.
"""

from boom_tpu.inference import (
    accounting,
    checkpoint,
    diagnostics,
    kernels,
    smc,
    transforms,
    vi,
)
from boom_tpu.inference.diagnostics import (
    effective_sample_size,
    ess,
    potential_scale_reduction,
    rhat,
    summary,
)
from boom_tpu.inference.driver import (McmcResult, run_chain, run_mcmc,
                                        run_mcmc_chunked)
from boom_tpu.inference.state import Kernel, compose, on_site, repeat

__all__ = [
    "diagnostics", "kernels", "smc", "transforms", "vi",
    "accounting", "checkpoint",
    "rhat", "ess", "potential_scale_reduction", "effective_sample_size",
    "summary",
    "run_mcmc", "run_chain", "run_mcmc_chunked", "McmcResult",
    "Kernel", "compose", "repeat", "on_site",
]
