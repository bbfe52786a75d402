"""Poisson regression with spike-and-slab selection via inter-arrival DA.

Reference: Models/Glm/PoissonRegressionModel.hpp + PoissonDataImputer
(Models/Glm/PosteriorSamplers/PoissonDataImputer.{hpp,cpp}, with the
precomputed tables in fill_poisson_mixture_approximation_table_*.cpp) +
PoissonRegressionSpikeSlabSampler; R front end BoomSpikeSlab poisson.spike.

Scheme (the Fruhwirth-Schnatter/Fruhwirth/Held/Rue auxiliary-mixture
construction the reference implements): for y_i ~ Poisson(E_i exp(eta_i)),
view the count as a unit-window observation of a rate-lambda_i Poisson
process. Two latent inter-arrival observations make eta_i linear-Gaussian:

  tau_i1 = (1 - t_{y_i}) + Exp(lambda_i)   (inter-arrival crossing 1)
     => -log tau_i1 = eta_i + log E_i + eps,  eps ~ -log Exp(1) (Gumbel)
  tau_i2 = t_{y_i}  (arrival time of the last event; Beta(y_i, 1) given
     the count, marginally Gamma(y_i, lambda_i))            [y_i > 0 only]
     => -log tau_i2 = eta_i + log E_i + eps,  eps ~ -log Gamma(y_i, 1)

Each eps is replaced by OUR OWN EM-fitted normal-mixture tables
(tools/fit_mixture_tables.py); for y > 60 the moment-matched single
normal N(-digamma(y), trigamma(y)) is used (KL -> 0 as y grows). Given
mixture components the model is heteroscedastic Gaussian regression: the
shared known-variance SSVS engine (ssvs.py) does selection + beta.
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


def _neg_log_gamma_table(y):
    """Mixture table rows for eps ~ -log Gamma(y, 1), elementwise over y.

    Rows 1..NU_MAX come from the fitted table; larger counts use the
    moment-matched single normal (mean -digamma(y), var trigamma(y))."""
    nu_max = tables.NEG_LOG_GAMMA_NU_MAX
    w_tab = jnp.asarray(tables.NEG_LOG_GAMMA_WEIGHTS)
    m_tab = jnp.asarray(tables.NEG_LOG_GAMMA_MEANS)
    s_tab = jnp.asarray(tables.NEG_LOG_GAMMA_SDS)
    idx = jnp.clip(y, 1, nu_max) - 1
    w = w_tab[idx]
    m = m_tab[idx]
    s = s_tab[idx]
    yf = jnp.maximum(jnp.asarray(y, m.dtype), 1.0)
    big = (y > nu_max)[..., None]
    one_hot = jnp.arange(w.shape[-1]) == 0
    w = jnp.where(big, jnp.where(one_hot, 1.0, 0.0), w)
    m = jnp.where(big, -jax.scipy.special.digamma(yf)[..., None], m)
    s = jnp.where(
        big,
        jnp.sqrt(jax.scipy.special.polygamma(1, yf))[..., None], s)
    return w, m, s


def impute_poisson_latent(key, log_lambda, y):
    """Sample (-log tau_1, -log tau_2) given counts and current rate.

    Returns (nlt1, nlt2) where nlt2 is only meaningful where y > 0."""
    k1, k2 = jax.random.split(key)
    dtype = log_lambda.dtype
    lam = jnp.exp(log_lambda)
    # last-arrival time within [0,1]: max of y uniforms = U^(1/y)
    u = jax.random.uniform(k2, y.shape, dtype, minval=jnp.finfo(dtype).tiny)
    yf = jnp.maximum(jnp.asarray(y, dtype), 1.0)
    t_last = jnp.where(y > 0, u ** (1.0 / yf), 0.0)
    # inter-arrival crossing the window boundary
    e = jax.random.exponential(k1, y.shape, dtype)
    tau1 = (1.0 - t_last) + e / lam
    nlt1 = -jnp.log(tau1)
    nlt2 = -jnp.log(jnp.maximum(t_last, jnp.finfo(dtype).tiny))
    return nlt1, nlt2


@dataclasses.dataclass(frozen=True)
class PoissonSpikeSlab:
    """poisson.spike: counts y with exposures E, log link, spike-slab
    prior on beta. State keys: gamma (bool [p]), beta ([p])."""

    x: jax.Array  # [n, p]
    y: jax.Array  # [n] counts
    log_exposure: jax.Array  # [n]
    prior: SpikeSlabPrior
    max_flips: int | None = None
    # r5: per-sweep independence mode jump on gamma (ssvs.kv_mode_jump)
    mode_jump: bool = True

    @staticmethod
    def from_data(x, y, exposure=None, expected_model_size=1.0,
                  prior_information_weight=0.01, **kw):
        y = jnp.asarray(y)
        log_e = (jnp.zeros(y.shape, x.dtype) if exposure is None
                 else jnp.log(jnp.asarray(exposure, x.dtype)))
        # centered log(rate) as the working response for prior scaling
        rate = (y + 0.5) / jnp.exp(log_e)
        prior = SpikeSlabPrior.from_data(
            x, jnp.log(rate), expected_model_size=expected_model_size,
            prior_information_weight=prior_information_weight, **kw)
        return PoissonSpikeSlab(x=x, y=y, log_exposure=log_e, prior=prior)

    def init_state(self, key):
        p = self.prior.mean.shape[0]
        pi = jax.nn.sigmoid(self.prior.log_inclusion_odds)
        gamma = jax.random.uniform(key, (p,)) < jnp.maximum(pi, 2.0 / p)
        return {"gamma": gamma, "beta": jnp.zeros(p, self.x.dtype)}

    def kernel(self):
        base = self.kernel_weighted()

        def sweep(key, state):
            return base(key, state, None)

        return sweep

    def kernel_weighted(self):
        """DA sweep taking per-observation weights (0/1 masks for
        composite models, e.g. zero-inflated Poisson's at-risk rows;
        None = all rows)."""
        gw = jnp.asarray(tables.GUMBEL_WEIGHTS)
        gm = jnp.asarray(tables.GUMBEL_MEANS)
        gs = jnp.asarray(tables.GUMBEL_SDS)

        def sweep(key, state, obs_weight=None):
            kz, km1, km2, kg, kb = jax.random.split(key, 5)
            eta = self.x @ state["beta"]
            log_lam = eta + self.log_exposure
            nlt1, nlt2 = impute_poisson_latent(kz, log_lam, self.y)

            # equation 1: always present, Gumbel errors
            c1 = sample_mixture_indicator(km1, nlt1 - log_lam, gw, gm, gs)
            z1 = nlt1 - self.log_exposure - gm[c1]
            w1 = 1.0 / gs[c1] ** 2

            # equation 2: only for y > 0, -log Gamma(y) errors
            w_tab, m_tab, s_tab = _neg_log_gamma_table(self.y)
            r2 = (nlt2 - log_lam)[..., None]
            lp = (jnp.log(jnp.maximum(w_tab, 1e-300)) - jnp.log(s_tab)
                  - 0.5 * ((r2 - m_tab) / s_tab) ** 2)
            c2 = jax.random.categorical(km2, lp, axis=-1)
            m2 = jnp.take_along_axis(m_tab, c2[..., None], -1)[..., 0]
            s2 = jnp.take_along_axis(s_tab, c2[..., None], -1)[..., 0]
            z2 = nlt2 - self.log_exposure - m2
            w2 = jnp.where(self.y > 0, 1.0 / s2**2, 0.0)
            if obs_weight is not None:
                w1 = w1 * obs_weight
                w2 = w2 * obs_weight

            suf = WeightedRegSuf.from_data(self.x, z1, w1).combine(
                WeightedRegSuf.from_data(self.x, z2, w2))
            gamma = kv_draw_indicators(
                kg, suf, self.prior, state["gamma"], self.max_flips,
                mode_jump=self.mode_jump)
            beta = kv_draw_beta(kb, suf, self.prior, gamma)
            return {"gamma": gamma, "beta": beta}

        return sweep

    @staticmethod
    def simulate(key, n, p, nonzero, beta_scale=0.5):
        kx, kb, ky = jax.random.split(key, 3)
        x = jax.random.normal(kx, (n, p)).at[:, 0].set(1.0)
        beta = jnp.zeros(p)
        vals = beta_scale * jnp.where(
            jax.random.uniform(kb, (nonzero,)) < 0.5, -1.0, 1.0)
        beta = beta.at[jnp.arange(nonzero)].set(vals)
        lam = jnp.exp(x @ beta)
        y = jax.random.poisson(ky, lam)
        return x, y, beta
