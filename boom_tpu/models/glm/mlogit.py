"""Multinomial logit with spike-and-slab selection (aux-mixture sampling).

Reference: Models/Glm/MultinomialLogitModel.hpp + the MLVS auxiliary-
mixture samplers (Models/Glm/PosteriorSamplers/MLVS.{hpp,cpp},
MLAuxMixSampler.hpp, MlogitRwm alternative); R front end BoomSpikeSlab
mlm.spike (Interfaces/R/BoomSpikeSlab/R/mlm.spike.R), python
spikeslab/mlogit_spike.py.

Latent-utility scheme (the exponential-race form of aux mixture sampling):
choice c_i = argmax_j (eta_ij + Gumbel_ij) is equivalent to
c_i = argmin_j T_ij with T_ij ~ Exp(lambda_ij), lambda_ij = exp(eta_ij).
Given the choice and current rates, by memorylessness:

  T_{i,c_i} = S_i ~ Exp(sum_j lambda_ij)
  T_ij      = S_i + Exp(lambda_ij)            for j != c_i

and marginally -log T_ij = eta_ij + eps with eps ~ -log Exp(1) (standard
Gumbel), which we replace by our EM-fitted 10-component normal mixture
(tools/fit_mixture_tables.py). Conditional on mixture components, each
non-baseline class j is an independent heteroscedastic Gaussian regression
for beta_j, handled by the shared known-variance SSVS engine, vmapped over
classes — the K-class problem runs as one batched program.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from boom_tpu.models.glm import _mixture_tables as tables
from boom_tpu.models.glm.regression import SpikeSlabPrior
from boom_tpu.models.glm.ssvs import (
    WeightedRegSuf,
    kv_draw_beta,
    kv_draw_indicators,
    sample_mixture_indicator,
)


def impute_mnl_utilities(key, eta, choice):
    """Sample -log T_ij given choices. eta: [n, K]; choice: [n] ints.

    Returns neg_log_t [n, K].

    Everything stays in log space: the naive form t = E1/sum(exp(eta))
    + E2/exp(eta) overflows exp(eta) and can hit -log(0) in f32 on TPU,
    and one NaN here self-perpetuates through beta -> eta forever. With
    log-space arithmetic the kernel is stable at any eta."""
    k1, k2 = jax.random.split(key)
    dtype = eta.dtype
    tiny = jnp.finfo(dtype).tiny
    lse = jax.scipy.special.logsumexp(eta, axis=-1, keepdims=True)
    # log of Exponential(1) variates; clamp away the measure-zero 0 draw
    log_e1 = jnp.log(jnp.maximum(
        jax.random.exponential(k1, (eta.shape[0], 1), dtype), tiny))
    log_e2 = jnp.log(jnp.maximum(
        jax.random.exponential(k2, eta.shape, dtype), tiny))
    log_s = log_e1 - lse                       # log(E1 / total)
    log_extra = log_e2 - eta                   # log(E2 / lam)
    is_choice = jax.nn.one_hot(choice, eta.shape[-1], dtype=bool)
    log_t = jnp.where(is_choice, log_s, jnp.logaddexp(log_s, log_extra))
    return -log_t


@dataclasses.dataclass(frozen=True)
class MultinomialLogitSpikeSlab:
    """mlm.spike with subject-level predictors: utilities eta_ij = x_i'b_j,
    baseline class 0 has b_0 = 0. State: gamma (bool [K-1, p]),
    beta ([K-1, p])."""

    x: jax.Array  # [n, p]
    choice: jax.Array  # [n] ints in [0, K)
    num_classes: int
    prior: SpikeSlabPrior  # shared across classes
    max_flips: int | None = None

    @staticmethod
    def from_data(x, choice, num_classes, expected_model_size=1.0,
                  prior_information_weight=0.01, **kw):
        prior = SpikeSlabPrior.from_data(
            x, jnp.zeros(x.shape[0], x.dtype),
            expected_model_size=expected_model_size,
            prior_information_weight=prior_information_weight, **kw)
        return MultinomialLogitSpikeSlab(
            x=x, choice=jnp.asarray(choice), num_classes=num_classes,
            prior=prior)

    def init_state(self, key):
        p = self.prior.mean.shape[0]
        k = self.num_classes - 1
        pi = jax.nn.sigmoid(self.prior.log_inclusion_odds)
        gamma = jax.random.uniform(key, (k, p)) < jnp.maximum(pi, 2.0 / p)
        return {"gamma": gamma, "beta": jnp.zeros((k, p), self.x.dtype)}

    def kernel(self):
        gw = jnp.asarray(tables.GUMBEL_WEIGHTS)
        gm = jnp.asarray(tables.GUMBEL_MEANS)
        gs = jnp.asarray(tables.GUMBEL_SDS)

        def sweep(key, state):
            kz, km, kg, kb = jax.random.split(key, 4)
            # utilities for all classes, baseline first
            eta_non0 = self.x @ state["beta"].T  # [n, K-1]
            eta = jnp.concatenate(
                [jnp.zeros((self.x.shape[0], 1), eta_non0.dtype),
                 eta_non0], axis=-1)
            nlt = impute_mnl_utilities(kz, eta, self.choice)  # [n, K]
            comp = sample_mixture_indicator(
                km, nlt - eta, gw, gm, gs)  # [n, K]
            z = nlt - gm[comp]
            w = 1.0 / gs[comp] ** 2

            # per-class weighted regressions (skip baseline column 0)
            def per_class(kg_j, kb_j, z_j, w_j, gamma_j):
                suf = WeightedRegSuf.from_data(self.x, z_j, w_j)
                gamma_j = kv_draw_indicators(
                    kg_j, suf, self.prior, gamma_j, self.max_flips)
                beta_j = kv_draw_beta(kb_j, suf, self.prior, gamma_j)
                return gamma_j, beta_j

            kcount = self.num_classes - 1
            gamma, beta = jax.vmap(per_class)(
                jax.random.split(kg, kcount),
                jax.random.split(kb, kcount),
                z[:, 1:].T, w[:, 1:].T, state["gamma"])
            return {"gamma": gamma, "beta": beta}

        return sweep

    def log_likelihood(self, beta):
        eta_non0 = self.x @ beta.T
        eta = jnp.concatenate(
            [jnp.zeros((self.x.shape[0], 1), eta_non0.dtype), eta_non0],
            axis=-1)
        logp = jax.nn.log_softmax(eta, axis=-1)
        return jnp.sum(
            jnp.take_along_axis(logp, self.choice[:, None], 1))

    @staticmethod
    def simulate(key, n, p, num_classes, nonzero, beta_scale=1.5):
        kx, kb, ky = jax.random.split(key, 3)
        x = jax.random.normal(kx, (n, p)).at[:, 0].set(1.0)
        beta = jnp.zeros((num_classes - 1, p))
        vals = beta_scale * jnp.where(
            jax.random.uniform(kb, (num_classes - 1, nonzero)) < 0.5,
            -1.0, 1.0)
        beta = beta.at[:, :nonzero].set(vals)
        eta = jnp.concatenate(
            [jnp.zeros((n, 1)), x @ beta.T], axis=-1)
        choice = jax.random.categorical(ky, eta, axis=-1)
        return x, choice, beta
