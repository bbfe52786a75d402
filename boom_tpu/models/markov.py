"""Markov chain model with conjugate Dirichlet transition sampling.

Reference: Models/MarkovModel.hpp (+ MarkovConjSampler in
Models/PosteriorSamplers/): a discrete-state Markov chain over S states
with Dirichlet priors on each transition row and on the initial
distribution. The sufficient statistics are the transition-count matrix
and the initial-state indicator; combine across shards = elementwise sum
(= psum on a mesh).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from boom_tpu import dists


def transition_counts(z, num_states):
    """[S, S] counts of t->t+1 transitions in an integer path z [T]."""
    onehot = jax.nn.one_hot(z, num_states)
    return onehot[:-1].T @ onehot[1:]


def markov_transition_draw(key, prior_counts, counts):
    """Rows of the transition matrix ~ Dirichlet(prior + counts), batched
    over rows (reference MarkovConjSampler::draw)."""
    return dists.dirichlet.sample(key, prior_counts + counts)


def markov_initial_draw(key, prior_counts, first_state_onehot):
    return dists.dirichlet.sample(key, prior_counts + first_state_onehot)


def stationary_distribution(trans, iters: int = 64):
    """Stationary distribution by fixed-trip power iteration (TPU-safe;
    reference MarkovModel::stat_dist uses an eigen solve)."""
    s = trans.shape[-1]
    pi = jnp.full((s,), 1.0 / s, trans.dtype)

    def body(pi, _):
        pi = pi @ trans
        return pi / jnp.sum(pi), None

    pi, _ = jax.lax.scan(body, pi, None, length=iters)
    return pi


def markov_loglik(z, trans, init):
    onehot = jax.nn.one_hot(z, trans.shape[-1])
    ll0 = jnp.log(jnp.clip(init, 1e-300, None)) @ onehot[0]
    counts = onehot[:-1].T @ onehot[1:]
    return ll0 + jnp.sum(counts * jnp.log(jnp.clip(trans, 1e-300, None)))


@dataclasses.dataclass(frozen=True)
class MarkovModel:
    """Observed discrete Markov chain with conjugate Gibbs (reference
    MarkovModel.hpp + MarkovConjSampler). State: trans [S,S], init [S]."""

    z: jax.Array  # [T] observed integer path
    num_states: int
    trans_prior: jax.Array | float = 1.0
    init_prior: jax.Array | float = 1.0

    def _priors(self):
        s = self.num_states
        tp = jnp.broadcast_to(jnp.asarray(self.trans_prior,
                                          jnp.result_type(float)), (s, s))
        ip = jnp.broadcast_to(jnp.asarray(self.init_prior,
                                          jnp.result_type(float)), (s,))
        return tp, ip

    def init_state(self, key):
        tp, ip = self._priors()
        k1, k2 = jax.random.split(key)
        return {"trans": dists.dirichlet.sample(k1, tp),
                "init": dists.dirichlet.sample(k2, ip)}

    def kernel(self):
        counts = transition_counts(self.z, self.num_states)
        first = jax.nn.one_hot(self.z[0], self.num_states)
        tp, ip = self._priors()

        def sweep(key, state):
            k1, k2 = jax.random.split(key)
            return {"trans": markov_transition_draw(k1, tp, counts),
                    "init": markov_initial_draw(k2, ip, first)}

        return sweep

    @staticmethod
    def simulate(key, t_len, trans, init):
        trans, init = jnp.asarray(trans), jnp.asarray(init)
        k0, ks = jax.random.split(key)
        z0 = jax.random.categorical(k0, jnp.log(init))

        def step(z, k):
            z_next = jax.random.categorical(k, jnp.log(trans[z]))
            return z_next, z_next

        _, zs = jax.lax.scan(step, z0, jax.random.split(ks, t_len - 1))
        return jnp.concatenate([z0[None], zs])
