"""Model zoo (reference Models/ layer, SURVEY.md §2.6)."""

from boom_tpu.models import conjugate, glm
from boom_tpu.models.bandits import (BinomialBandit, LinearBandit,
                                     LogitBandit)
from boom_tpu.models.bart import (BartConfig, GaussianBart, LogitBart,
                                  PoissonBart, ProbitBart)
from boom_tpu.models.beta_binomial import BetaBinomialModel
from boom_tpu.models.dirichlet_process import (
    DpGaussianMixture,
    DpMvnMixture,
)
from boom_tpu.models.factor import (
    MultinomialFactorModel,
    PoissonFactorModel,
)
from boom_tpu.models.gp import GpRegression, HierarchicalGpRegression
from boom_tpu.models.graphical import DiscreteBayesNet, Node
from boom_tpu.models.hierarchical import (
    HierarchicalDirichlet,
    HierarchicalGamma,
    HierarchicalGaussian,
    HierarchicalGaussianRegression,
    HierarchicalPoisson,
    HierarchicalPoissonRegression,
    HierarchicalZeroInflatedGamma,
)
from boom_tpu.models.health_state import HealthStateModel
from boom_tpu.models.hmm import GaussianHmm
from boom_tpu.models.impute import GaussianCopulaImputer
from boom_tpu.models.irt import IrtModel, PartialCredit, TwoPl
from boom_tpu.models.markov import MarkovModel
from boom_tpu.models.mixtures import GaussianMixtureModel
from boom_tpu.models.nnet import FeedForwardRegression
from boom_tpu.models.point_process import (
    CosinePoissonProcess,
    HomogeneousPoissonProcess,
    MarkovModulatedPoissonProcess,
    PoissonClusterProcess,
    WeeklyCyclePoissonProcess,
)
from boom_tpu.models.scalar_zoo import (
    ExponentialIncrement,
    GaussianGivenSigma,
    Lognormal,
    MatrixNormal,
    Mvt,
    ProductDirichlet,
    TruncatedGamma,
    UniformShrinkage,
)
from boom_tpu.models.timeseries import ArmaModel, ArModel, NonzeroMeanAr1
from boom_tpu.models.zero_inflated import (
    ZeroInflatedGamma,
    ZeroInflatedLognormal,
    ZeroInflatedPoisson,
)

__all__ = [
    "conjugate", "glm",
    "BetaBinomialModel", "GaussianHmm", "GaussianMixtureModel",
    "DpGaussianMixture", "DpMvnMixture",
    "MarkovModel", "ZeroInflatedPoisson", "ZeroInflatedLognormal",
    "ZeroInflatedGamma",
    "BinomialBandit", "LogitBandit", "LinearBandit",
    "HierarchicalGaussian", "HierarchicalPoisson", "HierarchicalGamma",
    "HierarchicalPoissonRegression",
    "GpRegression", "HierarchicalGpRegression",
    "GaussianBart", "BartConfig", "LogitBart",
    "ProbitBart", "PoissonBart",
    "PoissonFactorModel", "MultinomialFactorModel",
    "TwoPl", "IrtModel", "PartialCredit",
    "HomogeneousPoissonProcess", "WeeklyCyclePoissonProcess",
    "MarkovModulatedPoissonProcess", "CosinePoissonProcess",
    "PoissonClusterProcess",
    "Lognormal", "TruncatedGamma", "UniformShrinkage",
    "ProductDirichlet", "Mvt", "MatrixNormal",
    "DiscreteBayesNet", "Node",
    "FeedForwardRegression", "GaussianCopulaImputer",
    "ArModel", "ArmaModel", "NonzeroMeanAr1",
]
