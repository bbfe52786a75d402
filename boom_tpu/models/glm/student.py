"""Student-T regression with spike-and-slab selection (robust regression).

Reference: Models/Glm/TRegression.hpp + TDataImputer (latent precision
weights: scale-mixture-of-normals representation of the t distribution,
Models/Glm/PosteriorSamplers/TDataImputer.{hpp,cpp}) composed into
TRegressionSpikeSlabSampler (Models/Glm/PosteriorSamplers/
TRegressionSpikeSlabSampler.{hpp,cpp}); the tail-thickness parameter nu is
drawn by scalar slice sampling (TRegressionSampler draws nu via slice on
its full conditional). R front end: BoomSpikeSlab students-t option of
lm.spike.

Model: y_i = x_i'beta + sigma * t_nu. Latent w_i ~ Gamma(nu/2, nu/2) gives
y_i | w_i ~ N(x_i'beta, sigma^2 / w_i); given weights this is the Gaussian
SSVS problem on weighted sufstats, so the unknown-variance machinery from
regression.py applies verbatim (RegSuf built with weights).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from boom_tpu import dists
from boom_tpu.inference.kernels.slice import slice_step
from boom_tpu.models.glm.regression import (
    RegSuf,
    SpikeSlabPrior,
    draw_beta,
    draw_indicators_sweep,
    draw_sigsq,
)


def impute_student_weights(key, resid, sigsq, nu):
    """w_i | rest ~ Gamma((nu+1)/2, (nu + r_i^2/sigma^2)/2) (reference
    TDataImputer::impute)."""
    shape = 0.5 * (nu + 1.0)
    rate = 0.5 * (nu + resid * resid / sigsq)
    return dists.gamma.sample(key, shape, rate)


def nu_log_posterior(nu, weights, nu_prior_rate):
    """Full conditional of nu given the latent weights: the weights are
    iid Gamma(nu/2, nu/2); prior nu ~ Exp(nu_prior_rate)."""
    n = weights.shape[-1]
    half = 0.5 * nu
    loglik = (n * (half * jnp.log(half) - jax.scipy.special.gammaln(half))
              + (half - 1.0) * jnp.sum(jnp.log(weights), -1)
              - half * jnp.sum(weights, -1))
    return loglik - nu_prior_rate * nu


@dataclasses.dataclass(frozen=True)
class StudentSpikeSlab:
    """Robust (t-error) lm.spike. State: gamma (bool [p]), beta ([p]),
    sigsq (scalar), nu (scalar, slice-sampled unless fix_nu)."""

    x: jax.Array
    y: jax.Array
    prior: SpikeSlabPrior
    nu_prior_rate: float = 0.1  # Exp prior on nu (mean 10 dof)
    fix_nu: float | None = None
    max_flips: int | None = None
    # support of the nu slice move; a StudentSpikeSlabPrior's UniformPrior
    # df_prior maps onto these bounds (with nu_prior_rate=0 the prior is
    # exactly uniform on the bounds)
    nu_bounds: tuple = (0.1, 500.0)

    @staticmethod
    def from_data(x, y, expected_model_size=1.0, fix_nu=None, **kw):
        prior = SpikeSlabPrior.from_data(
            x, y, expected_model_size=expected_model_size, **kw)
        return StudentSpikeSlab(x=x, y=y, prior=prior, fix_nu=fix_nu)

    def init_state(self, key):
        p = self.prior.mean.shape[0]
        pi = jax.nn.sigmoid(self.prior.log_inclusion_odds)
        gamma = jax.random.uniform(key, (p,)) < jnp.maximum(pi, 2.0 / p)
        sigsq = self.prior.prior_ss / jnp.maximum(self.prior.sigma_df, 1.0)
        nu0 = min(max(10.0, 1.01 * self.nu_bounds[0]),
                  self.nu_bounds[1])
        nu = jnp.asarray(self.fix_nu if self.fix_nu is not None else nu0,
                         self.x.dtype)
        return {"gamma": gamma, "beta": jnp.zeros(p, self.x.dtype),
                "sigsq": jnp.asarray(sigsq), "nu": nu}

    def kernel(self):
        n = self.x.shape[0]

        def sweep(key, state):
            kw, kg, ks, kb, kn = jax.random.split(key, 5)
            resid = self.y - self.x @ state["beta"]
            w = impute_student_weights(kw, resid, state["sigsq"],
                                       state["nu"])
            yw = self.y * jnp.sqrt(w)
            xw = self.x * jnp.sqrt(w)[:, None]
            suf = RegSuf(xtx=xw.T @ xw, xty=xw.T @ yw, yty=yw @ yw,
                         n=jnp.asarray(n, self.x.dtype))
            gamma = draw_indicators_sweep(
                kg, suf, self.prior, state["gamma"], self.max_flips)
            sigsq = draw_sigsq(ks, suf, self.prior, gamma)
            beta = draw_beta(kb, suf, self.prior, gamma, sigsq)
            if self.fix_nu is not None:
                nu = state["nu"]
            else:
                nu = slice_step(
                    kn, state["nu"],
                    lambda v: nu_log_posterior(v, w, self.nu_prior_rate),
                    width=2.0, lower=self.nu_bounds[0],
                    upper=self.nu_bounds[1])
            return {"gamma": gamma, "beta": beta, "sigsq": sigsq, "nu": nu}

        return sweep

    @staticmethod
    def simulate(key, n, p, nonzero, sigma=1.0, nu=5.0, beta_scale=2.0):
        kx, kb, ke = jax.random.split(key, 3)
        x = jax.random.normal(kx, (n, p)).at[:, 0].set(1.0)
        beta = jnp.zeros(p)
        vals = beta_scale * jnp.where(
            jax.random.uniform(kb, (nonzero,)) < 0.5, -1.0, 1.0)
        beta = beta.at[jnp.arange(nonzero)].set(vals)
        y = x @ beta + sigma * jax.random.t(ke, nu, (n,))
        return x, y, beta
