"""Quantile regression with spike-and-slab selection.

Reference: Models/Glm/QuantileRegressionModel.hpp + the BoomSpikeSlab
qreg.spike front end (Interfaces/R/BoomSpikeSlab/R/qreg.spike.R). The
reference's sampler augments the asymmetric-Laplace likelihood with
latent exponentials (the Kozumi-Kobayashi construction); ours is the
same scheme with the GIG latent draws vectorized over observations and
the beta/indicator draws through the shared known-variance SSVS engine.

Model: y_i = x_i'beta + eps_i, eps ~ AsymmetricLaplace(tau, sigma):
  eps = theta z + omega sqrt(sigma z) u,  z ~ Exp(mean sigma), u ~ N(0,1)
  theta = (1 - 2 tau) / (tau (1 - tau)),  omega^2 = 2 / (tau (1 - tau))

Conditionals:
  z_i | rest ~ GIG(1/2, r_i^2/(omega^2 sigma), theta^2/(omega^2 sigma)
                                                + 2/sigma)
  beta, gamma | z: weighted Gaussian SSVS with response y - theta z and
                   weights 1/(omega^2 sigma z)
  sigma | rest ~ InverseGamma(a + 3n/2, b + sum[r_z^2/(2 omega^2 z) + z])
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


@dataclasses.dataclass(frozen=True)
class QuantileSpikeSlab:
    """qreg.spike. State: gamma [p] bool, beta [p], sigma scalar, z [n]."""

    x: jax.Array
    y: jax.Array
    tau: float = 0.5
    prior: SpikeSlabPrior = None
    sigma_a: float = 1.0
    sigma_b: float = 1.0
    max_flips: int | None = None

    @staticmethod
    def from_data(x, y, tau=0.5, expected_model_size=1.0, **kw):
        prior = SpikeSlabPrior.from_data(
            x, y, expected_model_size=expected_model_size, **kw)
        return QuantileSpikeSlab(x=x, y=y, tau=tau, prior=prior)

    @property
    def _theta(self):
        return (1.0 - 2.0 * self.tau) / (self.tau * (1.0 - self.tau))

    @property
    def _omega_sq(self):
        return 2.0 / (self.tau * (1.0 - self.tau))

    def init_state(self, key):
        p = self.prior.mean.shape[0]
        n = self.y.shape[0]
        pi = jax.nn.sigmoid(self.prior.log_inclusion_odds)
        gamma = jax.random.uniform(key, (p,)) < jnp.maximum(pi, 2.0 / p)
        return {"gamma": gamma, "beta": jnp.zeros((p,), self.x.dtype),
                "sigma": jnp.std(self.y),
                "z": jnp.ones((n,), self.x.dtype)}

    def kernel(self):
        theta, om2 = self._theta, self._omega_sq
        n = self.y.shape[0]

        def sweep(key, state):
            kz, kg, kb, ks = jax.random.split(key, 4)
            sigma = state["sigma"]
            resid = self.y - self.x @ state["beta"]
            # latent exponential scales
            a_gig = jnp.maximum(resid * resid / (om2 * sigma), 1e-12)
            b_gig = theta * theta / (om2 * sigma) + 2.0 / sigma
            z = dists.gig.sample(kz, 0.5, a_gig, b_gig)
            z = jnp.maximum(z, 1e-10)
            # weighted SSVS on the shifted response
            w = 1.0 / (om2 * sigma * z)
            y_shift = self.y - theta * z
            suf = WeightedRegSuf.from_data(self.x, y_shift, w)
            gamma = kv_draw_indicators(kg, suf, self.prior,
                                       state["gamma"], self.max_flips)
            beta = kv_draw_beta(kb, suf, self.prior, gamma)
            # sigma | rest (inverse gamma)
            r_z = self.y - self.x @ beta - theta * z
            rate = (self.sigma_b
                    + jnp.sum(r_z * r_z / (2.0 * om2 * z) + z))
            sigma = 1.0 / dists.gamma.sample(
                ks, self.sigma_a + 1.5 * n, rate)
            return {"gamma": gamma, "beta": beta, "sigma": sigma, "z": z}

        return sweep

    @staticmethod
    def simulate(key, n, p, nonzero, tau=0.5, beta_scale=2.0):
        kx, kb, ke = jax.random.split(key, 3)
        x = jax.random.normal(kx, (n, p)).at[:, 0].set(1.0)
        beta = jnp.zeros(p)
        vals = beta_scale * jnp.where(
            jax.random.uniform(kb, (nonzero,)) < 0.5, -1.0, 1.0)
        beta = beta.at[jnp.arange(nonzero)].set(vals)
        # noise with tau-quantile at zero
        eps = jax.random.normal(ke, (n,))
        eps = eps - jnp.asarray(
            jax.scipy.stats.norm.ppf(tau), eps.dtype)
        return x, x @ beta + eps, beta
