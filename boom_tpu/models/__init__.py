"""Model zoo (reference Models/ layer, SURVEY.md §2.6)."""

from boom_tpu.models import conjugate, glm
from boom_tpu.models.beta_binomial import BetaBinomialModel
from boom_tpu.models.hmm import GaussianHmm
from boom_tpu.models.mixtures import GaussianMixtureModel

__all__ = ["conjugate", "glm", "BetaBinomialModel", "GaussianHmm",
           "GaussianMixtureModel"]
