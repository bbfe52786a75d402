"""Zero-inflated models: Poisson, Gamma, Lognormal — latent-indicator Gibbs.

Reference: Models/ZeroInflatedPoissonModel.hpp,
ZeroInflatedGammaModel.hpp, ZeroInflatedLognormalModel.hpp and their
PosteriorSamplers. Each observation is either a structural zero (prob
1 - p) or a draw from the positive-part model; for Poisson the zero can
also come from the count distribution, so a latent "structural" indicator
is imputed for the observed zeros; for Gamma/Lognormal (continuous,
P(y=0) = 0 under the positive part) the indicator is observed and the
Gibbs is pure conjugate updates.

TPU form: one vectorized Bernoulli imputation over the zero mask, sufstat
reductions as masked sums, conjugate draws; vmaps over chains.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from boom_tpu import dists


@dataclasses.dataclass(frozen=True)
class ZeroInflatedPoisson:
    """y ~ (1-p) delta_0 + p Poisson(lam); Beta prior on p, Gamma on lam
    (reference ZeroInflatedPoissonModel + sampler). State: p, lam."""

    y: jax.Array  # [n] counts
    p_a: float = 1.0
    p_b: float = 1.0
    lam_a: float = 1.0
    lam_b: float = 1.0

    def init_state(self, key):
        pos = self.y > 0
        p0 = jnp.clip(jnp.mean(jnp.asarray(pos, jnp.result_type(float))),
                      0.05, 0.95)
        lam0 = jnp.sum(self.y) / jnp.maximum(jnp.sum(pos), 1.0)
        return {"p": p0, "lam": jnp.maximum(lam0, 0.1)}

    def kernel(self):
        y = self.y
        is_zero = y == 0
        n = y.shape[0]
        sum_y = jnp.sum(y)

        def sweep(key, state):
            kz, kp, kl = jax.random.split(key, 3)
            # P(active | y=0) = p e^-lam / (p e^-lam + 1 - p)
            log_active = jnp.log(state["p"]) - state["lam"]
            log_struct = jnp.log1p(-state["p"])
            prob_active = jax.nn.sigmoid(log_active - log_struct)
            active = jnp.where(
                is_zero,
                jax.random.uniform(kz, y.shape) < prob_active,
                True)
            n_active = jnp.sum(active)
            p = dists.beta.sample(kp, self.p_a + n_active,
                                  self.p_b + n - n_active)
            lam = dists.gamma.sample(kl, self.lam_a + sum_y,
                                     self.lam_b + n_active)
            return {"p": p, "lam": lam}

        return sweep

    @staticmethod
    def simulate(key, n, p, lam):
        k1, k2 = jax.random.split(key)
        active = jax.random.uniform(k1, (n,)) < p
        counts = jax.random.poisson(k2, lam, (n,))
        return jnp.where(active, counts, 0)


@dataclasses.dataclass(frozen=True)
class ZeroInflatedLognormal:
    """y ~ (1-p) delta_0 + p Lognormal(mu, sigma); conjugate NIX on
    (mu, sigma^2), Beta on p (reference ZeroInflatedLognormalModel).
    State: p, mu, sigsq."""

    y: jax.Array  # [n] nonnegative
    p_a: float = 1.0
    p_b: float = 1.0
    mean_guess: float = 0.0
    mean_nobs: float = 0.01
    sigma_df: float = 1.0
    sigma_guess: float = 1.0

    def init_state(self, key):
        pos = self.y > 0
        logs = jnp.where(pos, jnp.log(jnp.maximum(self.y, 1e-12)), 0.0)
        npos = jnp.maximum(jnp.sum(pos), 1.0)
        mu0 = jnp.sum(logs) / npos
        return {"p": jnp.clip(npos / self.y.shape[0], 0.05, 0.95),
                "mu": mu0, "sigsq": jnp.ones(())}

    def kernel(self):
        from boom_tpu.models.conjugate import (
            GaussianSuf,
            gaussian_mean_var_draw,
        )

        pos = self.y > 0
        n = self.y.shape[0]
        n_pos = jnp.sum(pos)
        logs = jnp.where(pos, jnp.log(jnp.maximum(self.y, 1e-12)), 0.0)
        w = jnp.asarray(pos, logs.dtype)
        suf = GaussianSuf(n=jnp.sum(w), sum=jnp.sum(logs),
                          sumsq=jnp.sum(logs * logs))

        def sweep(key, state):
            kp, kg = jax.random.split(key)
            p = dists.beta.sample(kp, self.p_a + n_pos,
                                  self.p_b + n - n_pos)
            mu, sigsq = gaussian_mean_var_draw(
                kg, suf, self.mean_guess, self.mean_nobs,
                self.sigma_df, self.sigma_guess**2)
            return {"p": p, "mu": mu, "sigsq": sigsq}

        return sweep


@dataclasses.dataclass(frozen=True)
class ZeroInflatedGamma:
    """y ~ (1-p) delta_0 + p Gamma(a, b); Beta on p, conjugate Gamma on
    the rate b given shape, slice on the shape a (reference
    ZeroInflatedGammaModel + GammaPosteriorSampler's shape slice).
    State: p, shape, rate."""

    y: jax.Array
    p_a: float = 1.0
    p_b: float = 1.0
    rate_a: float = 1.0
    rate_b: float = 1.0
    shape_prior_rate: float = 0.1  # Exp prior on the shape

    def init_state(self, key):
        pos = self.y > 0
        npos = jnp.maximum(jnp.sum(pos), 1.0)
        m = jnp.sum(self.y) / npos
        v = jnp.sum(jnp.where(pos, (self.y - m) ** 2, 0.0)) / npos
        shape0 = jnp.clip(m * m / jnp.maximum(v, 1e-12), 0.1, 100.0)
        return {"p": jnp.clip(npos / self.y.shape[0], 0.05, 0.95),
                "shape": shape0, "rate": shape0 / jnp.maximum(m, 1e-12)}

    def kernel(self):
        from boom_tpu.inference.kernels.slice import slice_step

        pos = self.y > 0
        n = self.y.shape[0]
        n_pos = jnp.sum(pos)
        sum_y = jnp.sum(jnp.where(pos, self.y, 0.0))
        sum_log = jnp.sum(jnp.where(pos, jnp.log(jnp.maximum(self.y,
                                                             1e-300)), 0.0))

        def sweep(key, state):
            kp, kr, ks = jax.random.split(key, 3)
            p = dists.beta.sample(kp, self.p_a + n_pos,
                                  self.p_b + n - n_pos)
            rate = dists.gamma.sample(
                kr, self.rate_a + state["shape"] * n_pos,
                self.rate_b + sum_y)

            def shape_logpost(a):
                return (n_pos * (a * jnp.log(rate)
                                 - jax.scipy.special.gammaln(a))
                        + (a - 1.0) * sum_log
                        - self.shape_prior_rate * a)

            shape = slice_step(ks, state["shape"], shape_logpost,
                               width=1.0, lower=1e-3, upper=1e4)
            return {"p": p, "shape": shape, "rate": rate}

        return sweep
