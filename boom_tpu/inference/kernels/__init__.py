"""Generic MCMC kernels (reference Samplers/ layer, SURVEY.md §2.4) plus
the HMC/MALA additions."""

from boom_tpu.inference.kernels.nuts import nuts_kernel, nuts_step
from boom_tpu.inference.kernels.tim import tim_kernel, tim_step, build_tim_proposal
from boom_tpu.inference.kernels.hmc import (
    HmcState,
    dual_averaging_update,
    finalize_adaptation,
    hmc_init,
    hmc_kernel,
    hmc_step,
    leapfrog,
    mala_kernel,
    mala_step,
    welford_update,
)
from boom_tpu.inference.kernels.mh import (
    Proposal,
    gaussian_random_walk,
    mh_step,
    mvt_independence,
    random_walk_kernel,
)
from boom_tpu.inference.kernels.slice import (
    coordinate_slice_kernel,
    slice_kernel,
    slice_step,
)

__all__ = [
    "tim_kernel", "tim_step", "build_tim_proposal",
    "nuts_kernel", "nuts_step",
    "HmcState", "hmc_init", "hmc_step", "hmc_kernel", "leapfrog",
    "dual_averaging_update", "welford_update", "finalize_adaptation",
    "mala_step", "mala_kernel",
    "Proposal", "gaussian_random_walk", "mvt_independence", "mh_step",
    "random_walk_kernel",
    "slice_step", "slice_kernel", "coordinate_slice_kernel",
]
