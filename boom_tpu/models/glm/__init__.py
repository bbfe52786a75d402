"""GLMs with spike-and-slab priors (reference Models/Glm, SURVEY.md §2.6)."""

from boom_tpu.models.glm.logit import LogitSpikeSlab, impute_logit_latent
from boom_tpu.models.glm.mlogit import (
    MultinomialLogitSpikeSlab,
    impute_mnl_utilities,
)
from boom_tpu.models.glm.poisson import (
    PoissonSpikeSlab,
    impute_poisson_latent,
)
from boom_tpu.models.glm.probit import ProbitSpikeSlab, impute_probit_latent
from boom_tpu.models.glm.regression import (
    RegSuf,
    SpikeSlabPrior,
    SpikeSlabRegression,
    WeightedRegression,
    weighted_reg_suf,
    draw_beta,
    draw_indicators_sweep,
    draw_sigsq,
    log_model_prob,
    reg_post_params,
)
from boom_tpu.models.glm.ssvs import (
    WeightedRegSuf,
    kv_draw_beta,
    kv_draw_indicators,
    kv_mode_jump,
    kv_screening_proposal_probs,
    kv_log_model_prob,
    sample_mixture_indicator,
)
from boom_tpu.models.glm.adaptive import (
    AdaptiveSpikeSlabRegression,
    BigAssSpikeSlab,
    screen_candidates,
)
from boom_tpu.models.glm.breadth import (
    BinomialLogitSpikeSlab,
    GammaRegression,
    LoglinearModel,
    MultilevelMultinomial,
    ZeroInflatedGammaRegression,
    ZeroInflatedLognormalRegression,
    ZeroInflatedPoissonRegression,
    loglinear_design,
)
from boom_tpu.models.glm.mprobit import MultinomialProbit
from boom_tpu.models.glm.mvreg import MultivariateRegression, MvRegSuf
from boom_tpu.models.glm.ordinal import OrdinalLogitSpikeSlab
from boom_tpu.models.glm.quantile import QuantileSpikeSlab
from boom_tpu.models.glm.student import StudentSpikeSlab

__all__ = [
    "RegSuf", "SpikeSlabPrior", "SpikeSlabRegression",
    "log_model_prob", "reg_post_params",
    "draw_indicators_sweep", "draw_sigsq", "draw_beta",
    "WeightedRegSuf", "kv_log_model_prob", "kv_draw_indicators",
    "kv_mode_jump", "kv_screening_proposal_probs",
    "kv_draw_beta", "sample_mixture_indicator",
    "ProbitSpikeSlab", "impute_probit_latent",
    "LogitSpikeSlab", "impute_logit_latent",
    "PoissonSpikeSlab", "impute_poisson_latent",
    "StudentSpikeSlab", "QuantileSpikeSlab", "OrdinalLogitSpikeSlab",
    "MultivariateRegression", "MvRegSuf",
    "WeightedRegression", "weighted_reg_suf", "MultinomialProbit",
    "ZeroInflatedGammaRegression",
    "AdaptiveSpikeSlabRegression", "BigAssSpikeSlab",
    "screen_candidates",
    "MultinomialLogitSpikeSlab", "impute_mnl_utilities",
    "GammaRegression", "ZeroInflatedLognormalRegression",
    "ZeroInflatedPoissonRegression", "BinomialLogitSpikeSlab",
    "LoglinearModel", "MultilevelMultinomial", "loglinear_design",
]
