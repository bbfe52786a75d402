"""Variational inference: mean-field ADVI with reparameterized gradients.

The reference has no VI; SURVEY.md §7 phase 9 lists it as a required new
backend. Mean-field Gaussian over an unconstrained pytree (compose with
boom_tpu.inference.transforms for constrained parameters), optimized by
optax.adam on the negative ELBO with a multi-sample reparameterization
estimator. Everything jits; the fit loop is one lax.scan.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax


class MeanField(NamedTuple):
    mu: Any  # pytree
    log_sigma: Any  # pytree like mu


def _sample(key, q: MeanField, num_samples):
    leaves, treedef = jax.tree_util.tree_flatten(q.mu)
    keys = list(jax.random.split(key, len(leaves)))
    ls_leaves = jax.tree_util.tree_leaves(q.log_sigma)
    out = [m + jnp.exp(ls) * jax.random.normal(
        k, (num_samples,) + jnp.shape(m), jnp.result_type(float))
        for m, ls, k in zip(leaves, ls_leaves, keys)]
    return jax.tree_util.tree_unflatten(treedef, out)


def _entropy(q: MeanField):
    total = 0.0
    for ls in jax.tree_util.tree_leaves(q.log_sigma):
        total = total + jnp.sum(ls)
    return total  # + const


def elbo(key, q: MeanField, log_target: Callable, num_samples: int = 8):
    zs = _sample(key, q, num_samples)

    def one(i):
        z = jax.tree_util.tree_map(lambda a: a[i], zs)
        return log_target(z)

    ll = jnp.mean(jax.vmap(one)(jnp.arange(num_samples)))
    return ll + _entropy(q)


class AdviResult(NamedTuple):
    q: MeanField
    elbo_path: jax.Array

    def sample(self, key, num_samples):
        return _sample(key, self.q, num_samples)

    def mean(self):
        return self.q.mu

    def sd(self):
        return jax.tree_util.tree_map(jnp.exp, self.q.log_sigma)


def advi(
    key: jax.Array,
    log_target: Callable[[Any], jax.Array],
    init: Any,
    num_steps: int = 2000,
    num_samples: int = 8,
    learning_rate: float = 0.02,
) -> AdviResult:
    """Fit a mean-field Gaussian to log_target over the init pytree."""
    q0 = MeanField(
        mu=jax.tree_util.tree_map(jnp.asarray, init),
        log_sigma=jax.tree_util.tree_map(
            lambda a: jnp.full(jnp.shape(a), -2.0), init))
    opt = optax.adam(learning_rate)
    opt_state = opt.init(q0)

    def step(carry, k):
        q, opt_state = carry

        def loss(qq):
            return -elbo(k, qq, log_target, num_samples)

        val, grads = jax.value_and_grad(loss)(q)
        updates, opt_state = opt.update(grads, opt_state)
        q = optax.apply_updates(q, updates)
        return (q, opt_state), -val

    (q, _), path = jax.lax.scan(
        step, (q0, opt_state), jax.random.split(key, num_steps))
    return AdviResult(q=q, elbo_path=path)
