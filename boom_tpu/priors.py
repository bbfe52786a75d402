"""User-facing prior-specification classes.

Mirrors the prior-spec surface of the reference's Python/R interfaces:
`Interfaces/python/spikeslab/BayesBoom/spikeslab/priors.py` (
RegressionSpikeSlabPrior at :66, StudentSpikeSlabPrior at :303,
LogitZellnerPrior at :385, PoissonZellnerPrior at :480,
MultinomialLogitSpikeSlabPrior at :564) and the scalar-prior zoo of
`Interfaces/R/prior_specification.hpp` (SdPrior, NormalPrior, BetaPrior,
GammaPrior, Ar1CoefficientPrior...).

Each spike-slab class is a *recipe*: it records the user's hyperparameter
choices and, given data, `build(x, y)` produces the internal
`boom_tpu.models.glm.SpikeSlabPrior` pytree that the jitted kernels
consume. This split matches the reference, where the python prior classes
hold numpy state and `.slab`/`.spike` manufacture the C++ model objects.

The api.py / frontends.py model classes accept these via `prior=`.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

__all__ = [
    "SdPrior", "NormalPrior", "BetaPrior", "GammaPrior",
    "Ar1CoefficientPrior", "UniformPrior",
    "RegressionSpikeSlabPrior", "StudentSpikeSlabPrior",
    "LogitZellnerPrior", "PoissonZellnerPrior",
    "MultinomialLogitSpikeSlabPrior",
]


def trimmed_logit(p, lo=1e-5):
    """logit with p clipped into (lo, 1-lo) — priors.py:365."""
    p = np.clip(np.asarray(p, float), lo, 1.0 - lo)
    return np.log(p / (1.0 - p))


# ---------------------------------------------------------------------------
# Scalar priors (prior_specification.hpp analogs). These are light records
# consumed by builders in api.py (e.g. BstsModel add_* methods accept
# SdPrior for innovation sds) and usable anywhere a (guess, weight) pair
# parameterizes a conjugate prior.
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class SdPrior:
    """Scaled-inverse-chisq prior on a variance, parameterized by a guess
    at the *standard deviation* (prior_specification.hpp SdPrior)."""

    sigma_guess: float
    sample_size: float = 0.01
    initial_value: float | None = None
    fixed: bool = False
    upper_limit: float | None = None

    @property
    def sigma_df(self):
        return self.sample_size

    @property
    def prior_ss(self):
        return self.sample_size * self.sigma_guess ** 2


@dataclasses.dataclass(frozen=True)
class NormalPrior:
    """N(mu, sigma^2) (prior_specification.hpp NormalPrior)."""

    mu: float = 0.0
    sigma: float = 1.0
    initial_value: float | None = None
    fixed: bool = False


@dataclasses.dataclass(frozen=True)
class BetaPrior:
    """Beta(a, b) (prior_specification.hpp BetaPrior)."""

    a: float = 1.0
    b: float = 1.0


@dataclasses.dataclass(frozen=True)
class GammaPrior:
    """Gamma(a, b) with mean a/b (prior_specification.hpp GammaPrior)."""

    a: float = 1.0
    b: float = 1.0
    initial_value: float | None = None


@dataclasses.dataclass(frozen=True)
class Ar1CoefficientPrior(NormalPrior):
    """Normal prior on an AR1 coefficient, optionally truncated to the
    stationarity region (prior_specification.hpp Ar1CoefficientPrior)."""

    force_stationary: bool = True
    force_positive: bool = False


@dataclasses.dataclass(frozen=True)
class UniformPrior:
    """Uniform(lo, hi) (prior_specification.hpp UniformPrior)."""

    lo: float = 0.0
    hi: float = 1.0


# ---------------------------------------------------------------------------
# Spike-and-slab priors
# ---------------------------------------------------------------------------
def _zellner_precision(x, prior_information_weight, diagonal_shrinkage,
                       weight=1.0):
    """kappa * [(1-alpha) XtWX + alpha diag(XtWX)] / n — the full-rank-
    adjusted Zellner information prior all the spike-slab classes share
    (priors.py:150-153, :413-417)."""
    x = jnp.asarray(x)
    n = x.shape[0]
    xtx = (x.T * weight) @ x if jnp.ndim(weight) else weight * (x.T @ x)
    a = diagonal_shrinkage
    om = (1.0 - a) * xtx + a * jnp.diag(jnp.diag(xtx))
    return om * (prior_information_weight / n)


class RegressionSpikeSlabPrior:
    """Spike-and-slab prior for Gaussian regression — the analog of
    spikeslab.RegressionSpikeSlabPrior (priors.py:66) / R's
    SpikeSlabPrior. See that class's docstring for the semantics of each
    argument; defaults match the reference.

    `sigma_upper_limit=None` reproduces the reference python default of
    1.2 * sdy; pass `np.inf` for an unbounded sigma.
    """

    def __init__(self,
                 expected_r2=0.5,
                 prior_df=0.01,
                 expected_model_size=1.0,
                 prior_information_weight=0.01,
                 diagonal_shrinkage=0.5,
                 optional_coefficient_estimate=None,
                 max_flips=-1,
                 mean_y=None,
                 sdy=None,
                 prior_inclusion_probabilities=None,
                 sigma_upper_limit=None,
                 max_size=None):
        self.expected_r2 = expected_r2
        self.prior_df = prior_df
        self.expected_model_size = expected_model_size
        self.prior_information_weight = prior_information_weight
        self.diagonal_shrinkage = diagonal_shrinkage
        self.optional_coefficient_estimate = optional_coefficient_estimate
        self.max_flips = max_flips
        self.mean_y = mean_y
        self.sdy = sdy
        self.prior_inclusion_probabilities = prior_inclusion_probabilities
        self.sigma_upper_limit = sigma_upper_limit
        self.max_size = max_size

    def _inclusion_probs(self, p, dtype):
        if self.prior_inclusion_probabilities is not None:
            pi = jnp.asarray(self.prior_inclusion_probabilities, dtype)
        else:
            prob = self.expected_model_size / p
            if prob > 1 or self.expected_model_size < 0:
                prob = 1.0
            pi = jnp.full((p,), prob, dtype)
        return jnp.clip(pi, 1e-6, 1.0 - 1e-12)

    def build(self, x, y):
        """Produce the internal SpikeSlabPrior pytree for data (x, y)."""
        from boom_tpu.models.glm.regression import SpikeSlabPrior

        x = jnp.asarray(x)
        y = jnp.asarray(y, x.dtype)
        p = x.shape[1]
        mean_y = float(jnp.mean(y)) if self.mean_y is None else self.mean_y
        sdy = float(jnp.std(y)) if self.sdy is None else self.sdy
        if self.optional_coefficient_estimate is None:
            mean = np.zeros(p)
            mean[0] = mean_y
        else:
            mean = np.asarray(self.optional_coefficient_estimate, float)
        pi = self._inclusion_probs(p, x.dtype)
        sigma_guess = np.sqrt(max(1.0 - self.expected_r2, 1e-12)) * sdy
        upper = self.sigma_upper_limit
        if upper is None:
            upper = 1.2 * sdy
        if not np.isfinite(upper) or upper <= 0:
            upper = None
        return SpikeSlabPrior(
            mean=jnp.asarray(mean, x.dtype),
            unscaled_precision=_zellner_precision(
                x, self.prior_information_weight, self.diagonal_shrinkage),
            log_inclusion_odds=jnp.log(pi) - jnp.log1p(-pi),
            log_inclusion_norm=jnp.sum(jnp.log1p(-pi)),
            sigma_df=jnp.asarray(self.prior_df, x.dtype),
            prior_ss=jnp.asarray(
                self.prior_df * sigma_guess ** 2, x.dtype),
            max_size=self.max_size,
            sigma_upper_limit=upper,
        )

    @property
    def kernel_max_flips(self):
        """max_flips in the form the kernels take (None = sweep all)."""
        mf = self.max_flips
        return None if (mf is None or mf <= 0) else int(mf)


class StudentSpikeSlabPrior(RegressionSpikeSlabPrior):
    """RegressionSpikeSlabPrior + a prior on the student tail-thickness
    parameter (priors.py:303). `df_prior` is a UniformPrior over nu."""

    def __init__(self, df_prior: UniformPrior | None = None, **kw):
        super().__init__(**kw)
        self.df_prior = df_prior or UniformPrior(0.1, 100.0)


class LogitZellnerPrior(RegressionSpikeSlabPrior):
    """Zellner-style spike-slab prior for binomial-logit models
    (priors.py:385). The slab is a plain MVN (not conditioned on a
    residual variance); its mean puts logit(prior_success_probability)
    on the intercept and zero elsewhere."""

    def __init__(self,
                 prior_success_probability=0.5,
                 expected_model_size=1.0,
                 prior_information_weight=1.0,
                 diagonal_shrinkage=0.5,
                 optional_coefficient_estimate=None,
                 max_flips=-1,
                 prior_inclusion_probabilities=None):
        super().__init__(
            expected_model_size=expected_model_size,
            prior_information_weight=prior_information_weight,
            diagonal_shrinkage=diagonal_shrinkage,
            optional_coefficient_estimate=optional_coefficient_estimate,
            max_flips=max_flips,
            prior_inclusion_probabilities=prior_inclusion_probabilities)
        self.prior_success_probability = prior_success_probability

    def _intercept_mean(self, y, trials):
        if y is None:
            return trimmed_logit(self.prior_success_probability)
        y = np.asarray(y, float)
        t = np.ones_like(y) if trials is None else np.asarray(trials, float)
        with np.errstate(invalid="ignore", divide="ignore"):
            m = trimmed_logit(np.nanmean(y / t))
        return m if np.isfinite(m) else 0.0

    def build(self, x, y=None, trials=None):
        from boom_tpu.models.glm.regression import SpikeSlabPrior

        x = jnp.asarray(x)
        p = x.shape[1]
        if self.optional_coefficient_estimate is None:
            mean = np.zeros(p)
            mean[0] = self._intercept_mean(y, trials)
        else:
            mean = np.asarray(self.optional_coefficient_estimate, float)
        pi = self._inclusion_probs(p, x.dtype)
        # The GLM DA kernels work on the known-variance (sigma^2 = 1)
        # engine, so a plain-MVN slab is exactly the sigma_df -> 0 limit
        # of the conditional-Gaussian form.
        return SpikeSlabPrior(
            mean=jnp.asarray(mean, x.dtype),
            unscaled_precision=_zellner_precision(
                x, self.prior_information_weight, self.diagonal_shrinkage),
            log_inclusion_odds=jnp.log(pi) - jnp.log1p(-pi),
            log_inclusion_norm=jnp.sum(jnp.log1p(-pi)),
            sigma_df=jnp.asarray(0.0, x.dtype),
            prior_ss=jnp.asarray(0.0, x.dtype),
            max_size=self.max_size,
        )


class PoissonZellnerPrior(LogitZellnerPrior):
    """Zellner-style spike-slab prior for Poisson models (priors.py:480):
    intercept mean log(total events / total exposure). The information
    matrix is the UNWEIGHTED Zellner X'X/n form — matching the
    reference, whose PoissonZellnerPrior also builds its precision from
    plain X'X (spikeslab/priors.py:480 area), not exposure-weighted
    products."""

    def __init__(self, prior_event_rate=1.0, **kw):
        kw.pop("prior_success_probability", None)
        super().__init__(**kw)
        self.prior_event_rate = prior_event_rate

    def _intercept_mean(self, y, exposure):
        if y is None:
            return float(np.log(max(self.prior_event_rate, 1e-10)))
        y = np.asarray(y, float)
        e = np.ones_like(y) if exposure is None else np.asarray(
            exposure, float)
        rate = np.nansum(y) / max(np.nansum(e), 1e-10)
        return float(np.log(max(rate, 1e-10)))

    def build(self, x, y=None, exposure=None):
        return super().build(x, y, exposure)


class MultinomialLogitSpikeSlabPrior(LogitZellnerPrior):
    """Spike-slab prior for multinomial logit (priors.py:564): zero-mean
    MVN slab with the diagonal-averaged xtx/n precision."""

    def __init__(self, expected_model_size=1.0, diagonal_shrinkage=0.05,
                 prior_information_weight=1.0, **kw):
        super().__init__(
            expected_model_size=expected_model_size,
            diagonal_shrinkage=diagonal_shrinkage,
            prior_information_weight=prior_information_weight, **kw)

    def _intercept_mean(self, y, trials):
        return 0.0
