"""Item response theory: 2PL binary items and the partial credit model.

Reference: Models/IRT — IrtModel.hpp, Subject/Item classes,
PartialCreditModel.hpp, with DAFE/RWM/slice subject+item samplers in
Models/IRT/PosteriorSamplers.

TPU form: all subjects' abilities update in ONE vectorized slice pass
(independent conditionals given items), all items' parameters likewise
given abilities; the [N, J] response-probability matrices are single
batched ops. Missing responses are a mask.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from boom_tpu.inference.kernels.slice import slice_step


@dataclasses.dataclass(frozen=True)
class TwoPl:
    """2PL: P(y_ij = 1) = sigmoid(a_j (theta_i - b_j)); theta ~ N(0,1),
    log a ~ N(0, .5^2), b ~ N(0, 2^2). State: theta [N], log_a [J],
    b [J]."""

    responses: jax.Array  # [N, J] in {0, 1}
    observed: jax.Array | None = None  # [N, J] bool

    @property
    def _obs(self):
        if self.observed is None:
            return jnp.ones(self.responses.shape, bool)
        return self.observed

    def init_state(self, key):
        n, j = self.responses.shape
        k1 = key
        score = jnp.sum(jnp.where(self._obs, self.responses, 0.0), 1)
        nn = jnp.maximum(jnp.sum(self._obs, 1), 1.0)
        theta0 = jax.scipy.special.logit(
            jnp.clip(score / nn, 0.05, 0.95)) * 0.5
        return {"theta": theta0, "log_a": jnp.zeros((j,)),
                "b": jnp.zeros((j,))}

    def _loglik_matrix(self, theta, log_a, b):
        eta = jnp.exp(log_a)[None, :] * (theta[:, None] - b[None, :])
        ll = (self.responses * jax.nn.log_sigmoid(eta)
              + (1.0 - self.responses) * jax.nn.log_sigmoid(-eta))
        return jnp.where(self._obs, ll, 0.0)

    def kernel(self):
        def sweep(key, state):
            kt, ka, kb = jax.random.split(key, 3)

            def theta_target(th):
                ll = self._loglik_matrix(th, state["log_a"], state["b"])
                return jnp.sum(ll, 1) - 0.5 * th * th

            theta = slice_step(kt, state["theta"], theta_target,
                               width=1.0)

            def a_target(la):
                ll = self._loglik_matrix(theta, la, state["b"])
                return jnp.sum(ll, 0) - 0.5 * (la / 0.5) ** 2

            log_a = slice_step(ka, state["log_a"], a_target, width=0.5)

            def b_target(bb):
                ll = self._loglik_matrix(theta, log_a, bb)
                return jnp.sum(ll, 0) - 0.5 * (bb / 2.0) ** 2

            b = slice_step(kb, state["b"], b_target, width=1.0)
            return {"theta": theta, "log_a": log_a, "b": b}

        return sweep

    @staticmethod
    def simulate(key, n, j, a_spread=0.4):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        theta = jax.random.normal(k1, (n,))
        a = jnp.exp(a_spread * jax.random.normal(k2, (j,)))
        b = 1.5 * jax.random.normal(k3, (j,))
        p = jax.nn.sigmoid(a[None, :] * (theta[:, None] - b[None, :]))
        y = jnp.asarray(jax.random.uniform(k4, (n, j)) < p, jnp.float64)
        return y, theta, a, b


@dataclasses.dataclass(frozen=True)
class PartialCredit:
    """Partial credit model for ordered categories 0..M-1 (reference
    PartialCreditModel.hpp): P(y_ij = m) prop exp(sum_{l<=m}
    (theta_i - delta_jl)) with delta_j0 = 0. State: theta [N],
    delta [J, M-1]."""

    responses: jax.Array  # [N, J] ints in [0, M)
    num_categories: int

    def init_state(self, key):
        n, j = self.responses.shape
        m = self.num_categories
        score = jnp.mean(jnp.asarray(self.responses,
                                     jnp.result_type(float)), 1)
        theta0 = (score - jnp.mean(score)) / (jnp.std(score) + 1e-6)
        return {"theta": theta0, "delta": jnp.zeros((j, m - 1))}

    def _category_logits(self, theta, delta):
        """[N, J, M] unnormalized log probabilities."""
        m = self.num_categories
        # cum_m = sum_{l<=m} (theta - delta_l); category 0 -> 0
        steps = theta[:, None, None] - delta[None, :, :]  # [N, J, M-1]
        cum = jnp.cumsum(steps, axis=-1)
        zeros = jnp.zeros(cum.shape[:-1] + (1,), cum.dtype)
        return jnp.concatenate([zeros, cum], axis=-1)

    def loglik(self, theta, delta):
        logits = self._category_logits(theta, delta)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return jnp.take_along_axis(
            logp, self.responses[:, :, None], -1)[..., 0]

    def kernel(self):
        j_items = self.responses.shape[1]
        m = self.num_categories

        def sweep(key, state):
            kt, kd = jax.random.split(key)

            def theta_target(th):
                return (jnp.sum(self.loglik(th, state["delta"]), 1)
                        - 0.5 * th * th)

            theta = slice_step(kt, state["theta"], theta_target,
                               width=1.0)

            # update delta one category-step at a time (vectorized over
            # items; steps within an item are correlated so scan them)
            def step_one(delta, inp):
                l_idx, k = inp

                def d_target(dl):
                    d_all = jax.lax.dynamic_update_index_in_dim(
                        delta, dl, l_idx, axis=1)
                    return (jnp.sum(self.loglik(theta, d_all), 0)
                            - 0.5 * (dl / 2.0) ** 2)

                dl_new = slice_step(k, delta[:, l_idx], d_target,
                                    width=1.0)
                return jax.lax.dynamic_update_index_in_dim(
                    delta, dl_new, l_idx, axis=1), None

            delta, _ = jax.lax.scan(
                step_one, state["delta"],
                (jnp.arange(m - 1), jax.random.split(kd, m - 1)))
            return {"theta": theta, "delta": delta}

        return sweep

    @staticmethod
    def simulate(key, n, j, m):
        k1, k2, k3 = jax.random.split(key, 3)
        theta = jax.random.normal(k1, (n,))
        delta = jnp.sort(1.2 * jax.random.normal(k2, (j, m - 1)), axis=1)
        steps = theta[:, None, None] - delta[None, :, :]
        cum = jnp.cumsum(steps, axis=-1)
        zeros = jnp.zeros(cum.shape[:-1] + (1,), cum.dtype)
        logits = jnp.concatenate([zeros, cum], axis=-1)
        y = jax.random.categorical(k3, logits, axis=-1)
        return y, theta, delta
