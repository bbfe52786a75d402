"""Logistic regression with spike-and-slab selection via latent-utility DA.

Reference: Models/Glm/BinomialLogitModel.hpp, Models/Glm/PosteriorSamplers/
BinomialLogitDataImputer — BOOM augments the logit with a *finite normal-
mixture approximation to the logistic distribution* (NOT Polya-Gamma;
NormalMixtureApproximation.hpp:38/167) — composed into
BinomialLogitSpikeSlabSampler; R front end BoomSpikeSlab logit.spike.

TPU design:
  * latent utility z_i = x_i'beta + eps_i, eps_i ~ Logistic(0,1); given
    y_i, z_i is an exact truncated-logistic inverse-CDF draw (no loops).
  * the mixture component for eps_i = z_i - x_i'beta is a categorical draw
    against OUR OWN fitted table (tools/fit_mixture_tables.py; we fit by
    quadrature EM rather than copying the reference's constants —
    KL(logistic || 9-comp mixture) ~ 1.6e-6 nats).
  * given component variances, the model is heteroscedastic Gaussian
    regression: one weighted-sufstat matmul + the shared known-variance
    SSVS engine (ssvs.py).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from boom_tpu import dists
from boom_tpu.models.glm import _mixture_tables as tables
from boom_tpu.models.glm.regression import SpikeSlabPrior
from boom_tpu.models.glm.ssvs import (
    WeightedRegSuf,
    kv_draw_beta,
    kv_draw_indicators,
    sample_mixture_indicator,
)


def impute_logit_latent(key, eta, y):
    """z_i ~ Logistic(eta_i, 1) truncated to (0,inf) if y_i=1 else (-inf,0).

    Exact: the latent-utility representation P(y=1) = P(z > 0) with
    logistic errors reproduces the logit likelihood.
    """
    lo = jnp.where(y > 0, 0.0, -jnp.inf)
    hi = jnp.where(y > 0, jnp.inf, 0.0)
    return dists.trun_logistic.sample(key, eta, 1.0, lo, hi)


@dataclasses.dataclass(frozen=True)
class LogitSpikeSlab:
    """logit.spike: Bernoulli y, logit link, spike-slab prior on beta.

    State keys: gamma (bool [p]), beta ([p]).
    """

    x: jax.Array  # [n, p]
    y: jax.Array  # [n] in {0, 1}
    prior: SpikeSlabPrior
    max_flips: int | None = None
    # r5: per-sweep independence mode jump on gamma (kv_mode_jump) —
    # the between-mode move the one-flip scan lacks; proposal re-fitted
    # at each imputation's weighted screening statistics
    mode_jump: bool = True

    @staticmethod
    def from_data(x, y, expected_model_size=1.0,
                  prior_information_weight=0.01, **kw):
        prior = SpikeSlabPrior.from_data(
            x, jnp.asarray(y, x.dtype),
            expected_model_size=expected_model_size,
            prior_information_weight=prior_information_weight, **kw)
        return LogitSpikeSlab(x=x, y=jnp.asarray(y), prior=prior)

    def init_state(self, key):
        p = self.prior.mean.shape[0]
        pi = jax.nn.sigmoid(self.prior.log_inclusion_odds)
        gamma = jax.random.uniform(key, (p,)) < jnp.maximum(pi, 2.0 / p)
        return {"gamma": gamma, "beta": jnp.zeros(p, self.x.dtype)}

    def kernel(self):
        return self.kernel_for_response(self.y)

    def kernel_for_response(self, y):
        """Same DA sweep against a caller-supplied 0/1 response (used by
        composite models whose binary response is itself latent, e.g.
        the zero-inflated at-risk indicator)."""
        w_tab = jnp.asarray(tables.LOGISTIC_WEIGHTS)
        s_tab = jnp.asarray(tables.LOGISTIC_SDS)
        mu_tab = jnp.zeros_like(s_tab)

        def sweep(key, state):
            kz, km, kg, kb = jax.random.split(key, 4)
            eta = self.x @ state["beta"]
            z = impute_logit_latent(kz, eta, y)
            comp = sample_mixture_indicator(
                km, z - eta, w_tab, mu_tab, s_tab)
            w = 1.0 / (s_tab[comp] ** 2)
            suf = WeightedRegSuf.from_data(self.x, z, w)
            gamma = kv_draw_indicators(
                kg, suf, self.prior, state["gamma"], self.max_flips,
                mode_jump=self.mode_jump)
            beta = kv_draw_beta(kb, suf, self.prior, gamma)
            return {"gamma": gamma, "beta": beta}

        return sweep

    @staticmethod
    def simulate(key, n, p, nonzero, beta_scale=1.5):
        kx, kb, ky = jax.random.split(key, 3)
        x = jax.random.normal(kx, (n, p)).at[:, 0].set(1.0)
        beta = jnp.zeros(p)
        vals = beta_scale * jnp.where(
            jax.random.uniform(kb, (nonzero,)) < 0.5, -1.0, 1.0)
        beta = beta.at[jnp.arange(nonzero)].set(vals)
        prob = jax.nn.sigmoid(x @ beta)
        y = jnp.asarray(jax.random.uniform(ky, (n,)) < prob, jnp.int32)
        return x, y, beta
