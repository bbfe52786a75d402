"""Model zoo (reference Models/ layer, SURVEY.md §2.6)."""

from boom_tpu.models import conjugate
from boom_tpu.models.beta_binomial import BetaBinomialModel

__all__ = ["conjugate", "BetaBinomialModel"]
