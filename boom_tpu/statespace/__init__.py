"""Structural time series / state-space models (the bsts engine).

Reference: Models/StateSpace (SURVEY.md §2.6) + Interfaces/R/bsts.
"""

from boom_tpu.statespace.bsts import (
    Bsts,
    asis_redraw,
    compare_bsts_models,
    holdout_prediction_errors,
    one_step_prediction_errors,
)
from boom_tpu.statespace.dynreg import (
    MarkovInclusionPrior,
    SparseDynamicRegression,
)
from boom_tpu.statespace.families import NonGaussianBsts
from boom_tpu.statespace.multivariate import (
    MultivariateBsts,
    MvSsmParams,
    mv_kalman_filter,
    mv_fast_state_smoother,
    mv_simulation_smoother,
)
from boom_tpu.statespace.pallas_scan import (
    pallas_filter_moments,
    pallas_simulation_smoother,
    pallas_smooth_states,
)
from boom_tpu.statespace.parallel_kalman import (
    parallel_filter_moments,
    parallel_simulation_smoother,
    parallel_smooth_states,
)
from boom_tpu.statespace.kalman import (
    FilterResult,
    SsmParams,
    fast_state_smoother,
    kalman_filter,
    simulate,
    simulation_smoother,
    smooth_states,
)
from boom_tpu.statespace.state_models import (
    ArState,
    DynamicRegression,
    DynamicRegressionAr,
    GeneralSeasonalLLT,
    HierarchicalRegressionHoliday,
    LocalLevel,
    LocalLinearTrend,
    RandomWalkHoliday,
    RegressionHoliday,
    SdPrior,
    MonthlyAnnualCycle,
    Seasonal,
    SemilocalLinearTrend,
    StaticIntercept,
    StudentLocalLinearTrend,
    Trig,
)

__all__ = [
    "Bsts", "NonGaussianBsts", "asis_redraw", "compare_bsts_models",
    "holdout_prediction_errors", "one_step_prediction_errors",
    "MultivariateBsts", "MvSsmParams", "mv_kalman_filter",
    "mv_fast_state_smoother", "mv_simulation_smoother",
    "SsmParams", "FilterResult", "kalman_filter", "fast_state_smoother",
    "smooth_states", "simulate", "simulation_smoother",
    "pallas_filter_moments", "pallas_smooth_states",
    "pallas_simulation_smoother", "parallel_filter_moments",
    "parallel_smooth_states", "parallel_simulation_smoother",
    "SdPrior", "LocalLevel", "LocalLinearTrend", "Seasonal", "Trig",
    "MonthlyAnnualCycle",
    "ArState", "StaticIntercept", "SemilocalLinearTrend",
    "DynamicRegression", "RandomWalkHoliday", "StudentLocalLinearTrend",
    "RegressionHoliday", "HierarchicalRegressionHoliday",
    "GeneralSeasonalLLT", "DynamicRegressionAr",
]
