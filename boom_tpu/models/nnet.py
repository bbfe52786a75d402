"""Bayesian feed-forward neural network regression.

Reference: Models/Nnet — GaussianFeedForwardNeuralNetwork.hpp (one
hidden layer of logistic units, Gaussian output) with
HiddenLayerImputer data-augmentation Gibbs (Nnet/PosteriorSamplers).

TPU-native design: same model, but the weight updates use NUTS on the
full weight pytree (gradients are free through the forward pass; the
reference's aux-mixture imputation exists because its C++ has no
autodiff), composed with a conjugate sigma^2 draw — a Gibbs program
whose hot ops are the [n, h] GEMMs of the forward pass.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from boom_tpu import dists
from boom_tpu.inference.kernels.hmc import HmcState, hmc_init
from boom_tpu.inference.kernels.nuts import nuts_step


@dataclasses.dataclass(frozen=True)
class FeedForwardRegression:
    """y = w2' sigmoid(W1 x + b1) + b2 + eps, eps ~ N(0, sigsq).

    State: weights {w1 [h, p], b1 [h], w2 [h], b2}, sigsq, _hmc."""

    x: jax.Array  # [n, p]
    y: jax.Array  # [n]
    hidden: int = 8
    weight_sd: float = 2.0
    sigma_df: float = 1.0
    max_depth: int = 6

    def forward(self, weights, x=None):
        x = self.x if x is None else x
        h = jax.nn.sigmoid(x @ weights["w1"].T + weights["b1"])
        return h @ weights["w2"] + weights["b2"]

    def log_target(self, weights, sigsq):
        pred = self.forward(weights)
        ll = -0.5 * jnp.sum((self.y - pred) ** 2) / sigsq
        lp = sum(-0.5 * jnp.sum(w * w) / self.weight_sd**2
                 for w in jax.tree_util.tree_leaves(weights))
        return ll + lp

    def init_state(self, key):
        p = self.x.shape[1]
        k1, k2, k3 = jax.random.split(key, 3)
        weights = {
            "w1": jax.random.normal(k1, (self.hidden, p)) / jnp.sqrt(p),
            "b1": jnp.zeros((self.hidden,)),
            "w2": jax.random.normal(k2, (self.hidden,)) / jnp.sqrt(
                float(self.hidden)),
            "b2": jnp.mean(self.y),
        }
        return {"weights": weights, "sigsq": jnp.var(self.y) * 0.5,
                "_hmc": hmc_init(weights, step_size=0.01)}

    def kernel(self, adapt=True):
        from boom_tpu.inference.kernels.hmc import (
            dual_averaging_update,
            welford_update,
        )

        n = self.y.shape[0]
        prior_ss = self.sigma_df * jnp.var(self.y) * 0.1

        def sweep(key, state):
            kw, ks = jax.random.split(key)
            hs: HmcState = state["_hmc"]
            weights, accept_stat, _ = nuts_step(
                kw, state["weights"], hs,
                lambda w: self.log_target(w, state["sigsq"]),
                max_depth=self.max_depth)
            if adapt:
                hs = dual_averaging_update(hs, accept_stat)
                hs = welford_update(hs, weights)
            resid = self.y - self.forward(weights)
            df = self.sigma_df + n
            ss = prior_ss + jnp.sum(resid * resid)
            sigsq = dists.scaled_inv_chisq.sample(ks, df, ss / df)
            return {"weights": weights, "sigsq": sigsq, "_hmc": hs}

        return sweep
