"""Hierarchical (multi-group) models with conjugate group draws.

Reference: Models/Hierarchical — HierarchicalGaussianRegressionModel,
HierarchicalPoissonModel, HierarchicalGammaModel, HierarchicalDirichlet
(+ HierarchicalPosteriorSampler: per-group conjugate draws followed by
hyperparameter draws given the group-level parameters).

TPU form: the per-group draws are ONE batched conjugate draw over the
group axis (the reference loops groups serially); hyperparameter draws
consume group-level sufstats via fixed reductions. Groups of unequal
size use segment sums into fixed [G] shapes.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from boom_tpu import dists
from boom_tpu.inference.kernels.slice import slice_step


def group_sufstats(y, group, num_groups):
    """Per-group (n, sum, sumsq) via segment sums (fixed shape [G])."""
    ones = jnp.ones_like(y)
    n = jax.ops.segment_sum(ones, group, num_groups)
    s = jax.ops.segment_sum(y, group, num_groups)
    ss = jax.ops.segment_sum(y * y, group, num_groups)
    return n, s, ss


@dataclasses.dataclass(frozen=True)
class HierarchicalGaussian:
    """y_ij ~ N(mu_j, sigsq); mu_j ~ N(mu0, tausq); flat-ish conjugate
    hyperpriors (reference HierarchicalGaussianRegressionModel's
    intercept-only core; the eight-schools structure). State: mu [G],
    mu0, tausq, sigsq."""

    y: jax.Array  # [n]
    group: jax.Array  # [n] ints in [0, G)
    num_groups: int
    mu0_mean: float = 0.0
    mu0_nobs: float = 1e-3
    tau_df: float = 1.0
    tau_guess: float = 1.0
    sigma_df: float = 1.0
    sigma_guess: float = 1.0

    def init_state(self, key):
        n, s, _ = group_sufstats(self.y, self.group, self.num_groups)
        mu = s / jnp.maximum(n, 1.0)
        return {"mu": mu, "mu0": jnp.mean(self.y),
                "tausq": jnp.var(self.y) / 2.0 + 1e-3,
                "sigsq": jnp.var(self.y) / 2.0 + 1e-3}

    def kernel(self):
        g = self.num_groups
        n, s, ss = group_sufstats(self.y, self.group, g)
        n_total = self.y.shape[0]

        def sweep(key, state):
            km, k0, kt, ks = jax.random.split(key, 4)
            sigsq, tausq = state["sigsq"], state["tausq"]
            # group means | rest (batched conjugate normal)
            prec = n / sigsq + 1.0 / tausq
            mean = (s / sigsq + state["mu0"] / tausq) / prec
            mu = mean + jax.random.normal(km, (g,), mean.dtype) / jnp.sqrt(
                prec)
            # hypermean | group means
            prec0 = g / tausq + self.mu0_nobs
            mean0 = (jnp.sum(mu) / tausq
                     + self.mu0_nobs * self.mu0_mean) / prec0
            mu0 = mean0 + jax.random.normal(k0, (), mean.dtype) / jnp.sqrt(
                prec0)
            # tausq | group means (scaled inv chisq)
            ss_tau = jnp.sum((mu - mu0) ** 2)
            df_t = self.tau_df + g
            tausq = dists.scaled_inv_chisq.sample(
                kt, df_t,
                (self.tau_df * self.tau_guess**2 + ss_tau) / df_t)
            # sigsq | mu (residual SS via group sufstats)
            ss_resid = jnp.sum(ss - 2.0 * mu * s + n * mu * mu)
            df_s = self.sigma_df + n_total
            sigsq = dists.scaled_inv_chisq.sample(
                ks, df_s,
                (self.sigma_df * self.sigma_guess**2 + ss_resid) / df_s)
            return {"mu": mu, "mu0": mu0, "tausq": tausq, "sigsq": sigsq}

        return sweep


@dataclasses.dataclass(frozen=True)
class HierarchicalPoisson:
    """events_j ~ Poisson(lam_j * exposure_j); lam_j ~ Gamma(a, b);
    hyper (a, b) sampled by slice on their log posterior (reference
    HierarchicalPoissonModel + PoissonGammaPosteriorSampler). State:
    lam [G], a, b."""

    events: jax.Array  # [G]
    exposure: jax.Array  # [G]
    a_prior_rate: float = 0.1
    b_prior_rate: float = 0.1

    @property
    def num_groups(self):
        return self.events.shape[0]

    def init_state(self, key):
        lam = (self.events + 0.5) / self.exposure
        m = jnp.mean(lam)
        v = jnp.var(lam) + 1e-6
        a0 = jnp.clip(m * m / v, 0.1, 1e3)
        return {"lam": lam, "a": a0, "b": a0 / m}

    def kernel(self):
        g = self.num_groups

        def sweep(key, state):
            kl, ka, kb = jax.random.split(key, 3)
            # group rates | hyper (batched conjugate gamma)
            lam = dists.gamma.sample(
                kl, state["a"] + self.events,
                state["b"] + self.exposure)
            sum_lam = jnp.sum(lam)
            sum_log = jnp.sum(jnp.log(lam))

            # b | a, lam conjugate gamma
            b = dists.gamma.sample(kb, 1.0 + g * state["a"],
                                   self.b_prior_rate + sum_lam)

            def a_logpost(a):
                return (g * (a * jnp.log(b)
                             - jax.scipy.special.gammaln(a))
                        + (a - 1.0) * sum_log - self.a_prior_rate * a)

            a = slice_step(ka, state["a"], a_logpost, width=1.0,
                           lower=1e-3, upper=1e4)
            return {"lam": lam, "a": a, "b": b}

        return sweep


@dataclasses.dataclass(frozen=True)
class HierarchicalGamma:
    """y_ij ~ Gamma(nu, nu / mu_j) (mean mu_j); mu_j ~ InverseGamma-ish
    via conjugate rate draws; shared shape nu slice-sampled (reference
    HierarchicalGammaModel). State: mu [G], nu."""

    y: jax.Array
    group: jax.Array
    num_groups: int
    mu_prior_shape: float = 1.0
    mu_prior_rate: float = 1.0
    nu_prior_rate: float = 0.1

    def init_state(self, key):
        n, s, _ = group_sufstats(self.y, self.group, self.num_groups)
        mu = (s + 1.0) / (n + 1.0)
        return {"mu": mu, "nu": jnp.asarray(2.0)}

    def kernel(self):
        g = self.num_groups
        n, s, _ = group_sufstats(self.y, self.group, g)
        sum_log_all = jnp.sum(jnp.log(jnp.maximum(self.y, 1e-300)))
        n_total = self.y.shape[0]

        def sweep(key, state):
            km, kn = jax.random.split(key)
            nu = state["nu"]
            # Gibbs on (theta, nu) with theta_j the Gamma rate: y_ij ~
            # Gamma(nu, theta_j), theta_j ~ Gamma(a0, b0) conjugate.
            theta = dists.gamma.sample(
                km, self.mu_prior_shape + n * nu,
                self.mu_prior_rate + s)

            # nu | theta, y: sum_j n_j nu log theta_j - n lgamma(nu)
            #   + (nu - 1) sum log y   (the -theta*s term is nu-free)
            def nu_logpost(v):
                return (jnp.sum(n * v * jnp.log(theta))
                        - n_total * jax.scipy.special.gammaln(v)
                        + (v - 1.0) * sum_log_all
                        - self.nu_prior_rate * v)

            nu = slice_step(kn, nu, nu_logpost, width=0.5,
                            lower=1e-2, upper=1e3)
            # report the group means mu_j = nu / theta_j
            return {"mu": nu / theta, "nu": nu}

        return sweep
