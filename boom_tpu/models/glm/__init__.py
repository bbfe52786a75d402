"""GLMs with spike-and-slab priors (reference Models/Glm, SURVEY.md §2.6)."""

from boom_tpu.models.glm.regression import (
    RegSuf,
    SpikeSlabPrior,
    SpikeSlabRegression,
    draw_beta,
    draw_indicators_sweep,
    draw_sigsq,
    log_model_prob,
    reg_post_params,
)

__all__ = [
    "RegSuf", "SpikeSlabPrior", "SpikeSlabRegression",
    "log_model_prob", "reg_post_params",
    "draw_indicators_sweep", "draw_sigsq", "draw_beta",
]
