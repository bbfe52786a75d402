"""Factor models for audience measurement: Poisson and multinomial.

Reference: Models/FactorModels — PoissonFactorModel.hpp (sites x
visitors: visitor v carries a latent class k; visits to site s are
Poisson with class-specific rate lambda_{sk}), MultinomialFactorModel.hpp
(class-specific site profiles), with PoissonFactorHierarchicalSampler /
independent-gamma samplers and the python front end
Interfaces/python/factormodels.

TPU form: the class imputation for ALL visitors is one [V, K] logit
matrix (a single [V, S] x [S, K] GEMM), class-conditional sufstats are
one-hot matmuls, and the rate/profile draws are batched conjugates.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from boom_tpu import dists


@dataclasses.dataclass(frozen=True)
class PoissonFactorModel:
    """counts[v, s] ~ Poisson(exposure_v * lambda[s, class_v]).

    State: lam [S, K], pi [K]. Priors: lambda ~ Gamma(a, b) iid
    (the reference's independent-gamma sampler), pi ~ Dirichlet."""

    counts: jax.Array  # [V, S]
    num_classes: int
    exposure: jax.Array | None = None  # [V]
    lam_a: float = 0.5
    lam_b: float = 1.0
    pi_prior: float = 1.0

    @property
    def _exposure(self):
        if self.exposure is None:
            return jnp.ones((self.counts.shape[0],),
                            jnp.result_type(float))
        return self.exposure

    def init_state(self, key):
        v, s = self.counts.shape
        k = self.num_classes
        k1, k2 = jax.random.split(key)
        base = (jnp.sum(self.counts, 0) + 1.0) / (
            jnp.sum(self._exposure) + 1.0)
        lam = base[:, None] * dists.gamma.sample(k1, 2.0, 2.0,
                                                 shape=(s, k))
        pi = dists.dirichlet.sample(k2, jnp.ones(k))
        return {"lam": lam, "pi": pi}

    def class_logits(self, state):
        """[V, K] log p(class | counts, lam, pi)."""
        log_lam = jnp.log(jnp.clip(state["lam"], 1e-300, None))  # [S, K]
        ll = self.counts @ log_lam  # [V, K]
        ll = ll - self._exposure[:, None] * jnp.sum(state["lam"], 0)[None]
        return ll + jnp.log(jnp.clip(state["pi"], 1e-300, None))[None]

    def kernel(self):
        v, s = self.counts.shape
        k = self.num_classes

        def sweep(key, state):
            kz, kl, kp = jax.random.split(key, 3)
            z = jax.random.categorical(kz, self.class_logits(state), -1)
            onehot = jax.nn.one_hot(z, k, dtype=self.counts.dtype)  # [V,K]
            counts_sk = self.counts.T @ onehot  # [S, K]
            expo_k = self._exposure @ onehot  # [K]
            lam = dists.gamma.sample(
                kl, self.lam_a + counts_sk,
                self.lam_b + expo_k[None, :])
            pi = dists.dirichlet.sample(
                kp, self.pi_prior + onehot.sum(0))
            return {"lam": lam, "pi": pi}

        return sweep

    @staticmethod
    def simulate(key, num_visitors, num_sites, num_classes, scale=1.0):
        k1, k2, k3 = jax.random.split(key, 3)
        lam = dists.gamma.sample(k1, 1.0, 1.0 / scale,
                                 shape=(num_sites, num_classes))
        z = jax.random.randint(k2, (num_visitors,), 0, num_classes)
        rate = lam[:, z].T  # [V, S]
        counts = jax.random.poisson(k3, rate)
        return counts, z, lam


@dataclasses.dataclass(frozen=True)
class MultinomialFactorModel:
    """Each visitor's site visits ~ Multinomial(n_v, profile[:, class_v])
    (reference MultinomialFactorModel.hpp). State: profiles [S, K]
    (columns on the simplex), pi [K]."""

    counts: jax.Array  # [V, S]
    num_classes: int
    profile_prior: float = 1.0
    pi_prior: float = 1.0

    def init_state(self, key):
        v, s = self.counts.shape
        k = self.num_classes
        k1, k2 = jax.random.split(key)
        profiles = dists.dirichlet.sample(
            k1, jnp.ones((k, s))).T  # [S, K]
        pi = dists.dirichlet.sample(k2, jnp.ones(k))
        return {"profiles": profiles, "pi": pi}

    def class_logits(self, state):
        logp = jnp.log(jnp.clip(state["profiles"], 1e-300, None))
        return (self.counts @ logp
                + jnp.log(jnp.clip(state["pi"], 1e-300, None))[None])

    def kernel(self):
        k = self.num_classes

        def sweep(key, state):
            kz, kq, kp = jax.random.split(key, 3)
            z = jax.random.categorical(kz, self.class_logits(state), -1)
            onehot = jax.nn.one_hot(z, k, dtype=self.counts.dtype)
            counts_sk = self.counts.T @ onehot  # [S, K]
            profiles = dists.dirichlet.sample(
                kq, (self.profile_prior + counts_sk).T).T
            pi = dists.dirichlet.sample(kp, self.pi_prior + onehot.sum(0))
            return {"profiles": profiles, "pi": pi}

        return sweep
