"""Beta-Binomial model: overdispersed binomial counts per group.

Reference: Models/BetaBinomialModel.hpp:73 (data (n_i, y_i); params a, b)
and Models/PosteriorSamplers/BetaBinomialPosteriorSampler — which
reparameterizes to (prob, sample_size) = (a/(a+b), a+b), puts a Beta prior
on prob and a positive prior on sample_size, and slice-samples each
coordinate (the correctness config #1 in BASELINE.md).

TPU-native form: the log likelihood is one vectorized beta_binomial.logpmf
reduction over groups; the two scalar slice updates run simultaneously for
every chain via vmap; sample_size is sampled on the log scale with the
Jacobian added (the reference's Transformation/Jacobian machinery,
TargetFun/Transformation.hpp, reduced to a one-line change of variables).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from boom_tpu import dists
from boom_tpu.inference.kernels.slice import slice_step
from boom_tpu.inference.state import compose


@dataclasses.dataclass(frozen=True)
class BetaBinomialModel:
    """trials, successes: fixed data arrays [num_groups]."""

    trials: jax.Array
    successes: jax.Array
    # Beta(prob_a, prob_b) prior on prob = a/(a+b)
    prob_a: float = 1.0
    prob_b: float = 1.0
    # Gamma(size_shape, size_rate) prior on sample_size = a+b
    size_shape: float = 1.0
    size_rate: float = 0.1
    slice_width: float = 1.0

    def log_lik(self, prob, size):
        """Vectorized over any batch shape of (prob, size)."""
        a = prob * size
        b = (1.0 - prob) * size
        lp = dists.beta_binomial.logpmf(
            self.successes, self.trials, a[..., None], b[..., None])
        return lp.sum(-1)

    def log_post(self, prob, size):
        return (
            self.log_lik(prob, size)
            + dists.beta.logpdf(prob, self.prob_a, self.prob_b)
            + dists.gamma.logpdf(size, self.size_shape, self.size_rate)
        )

    def init_state(self, key):
        k1, k2 = jax.random.split(key)
        ybar = (self.successes.sum() + 0.5) / (self.trials.sum() + 1.0)
        prob = dists.beta.sample(k1, 2.0, 2.0) * 0.5 + ybar * 0.5
        size = dists.gamma.sample(k2, 2.0, 0.5) + 1.0
        return {"prob": prob, "size": size}

    def kernel(self):
        def prob_kernel(key, state):
            def target(p):
                return self.log_post(p, state["size"])

            out = dict(state)
            out["prob"] = slice_step(
                key, state["prob"], target, self.slice_width,
                lower=1e-6, upper=1.0 - 1e-6)
            return out

        def size_kernel(key, state):
            # slice on log(size) with +log(size) Jacobian
            def target(ls):
                size = jnp.exp(ls)
                return self.log_post(state["prob"], size) + ls

            out = dict(state)
            ls = slice_step(key, jnp.log(state["size"]), target,
                            self.slice_width)
            out["size"] = jnp.exp(ls)
            return out

        return compose(prob_kernel, size_kernel)

    @staticmethod
    def simulate(key, num_groups, trials_per_group, a, b):
        k1, k2 = jax.random.split(key)
        n = jnp.full((num_groups,), float(trials_per_group))
        y = dists.beta_binomial.sample(k1, n, a, b)
        return n, y
