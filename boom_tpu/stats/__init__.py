"""Statistics utilities (reference stats/ layer, SURVEY.md §2 layer 5)."""

from boom_tpu.stats.density import (
    Ecdf,
    IQagentState,
    freq_dist,
    iqagent_add,
    iqagent_add_batch,
    iqagent_init,
    iqagent_quantile,
    kde,
)
from boom_tpu.stats.encoders import (
    DataTable,
    build_design,
    dummy_encode,
    effects_encode,
    interaction_encode,
)
from boom_tpu.stats.metrics import (
    binary_classification_metrics,
    chi_square_test,
    confusion_matrix,
    kl_divergence,
    roc_auc,
    two_sample_ks,
)
from boom_tpu.stats.moments import (
    acf,
    kurtosis,
    mean,
    pacf,
    quantiles,
    sd,
    skewness,
    summary,
    var,
)
from boom_tpu.stats.splines import (
    bspline_basis,
    mspline_basis,
    natural_spline_basis,
)

__all__ = [
    "Ecdf", "kde", "freq_dist", "IQagentState", "iqagent_init",
    "iqagent_add", "iqagent_add_batch", "iqagent_quantile",
    "DataTable", "build_design", "dummy_encode", "effects_encode",
    "interaction_encode",
    "kl_divergence", "chi_square_test", "two_sample_ks", "roc_auc",
    "confusion_matrix", "binary_classification_metrics",
    "mean", "var", "sd", "skewness", "kurtosis", "acf", "pacf",
    "quantiles", "summary",
    "bspline_basis", "natural_spline_basis", "mspline_basis",
]
from boom_tpu.stats.summarize import (  # noqa: F401,E402
    CategoricalSummary,
    NumericSummary,
    summarize,
)
