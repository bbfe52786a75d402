"""Metropolis-Hastings kernels and proposal library.

Reference: Samplers/MetropolisHastings.hpp:27 (MetropolisHastings,
ScalarMetropolisHastings) and the proposal classes in
Samplers/MH_Proposals.hpp:30-159 (MvnRwmProposal, MvtIndepProposal,
MvtRwmProposal, scalar variants). Here a proposal is a pair of pure
functions; the MH step is one fused vectorized accept/reject that serves
every chain at once. Acceptance counts are carried in the state
(MoveAccounting analog, Samplers/MoveAccounting.hpp:54).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from boom_tpu.dists import mvt


class Proposal(NamedTuple):
    """sample(key, x) -> y ; logpdf(y, x) -> log q(y | x).

    For symmetric proposals set ``symmetric=True`` and logpdf is unused.
    """

    sample: Callable[[jax.Array, Any], Any]
    logpdf: Callable[[Any, Any], jax.Array] | None = None
    symmetric: bool = True


def gaussian_random_walk(scale) -> Proposal:
    """RWM with N(x, scale^2) steps (MvnRwmProposal / scalar RWM analog).
    ``scale`` may be a scalar or a per-coordinate array (diagonal)."""

    def sample(key, x):
        return jax.tree_util.tree_map(
            lambda leaf: leaf + scale * jax.random.normal(
                key, jnp.shape(leaf), jnp.result_type(leaf)), x)

    return Proposal(sample=sample, symmetric=True)


def mvt_independence(mean, sigma, df=3.0) -> Proposal:
    """Independence proposal from a multivariate T centered at a mode —
    the TIM proposal (reference Samplers/TIM.hpp:42, MvtIndepProposal)."""
    chol = jnp.linalg.cholesky(sigma)

    def sample(key, x):
        return mvt.sample(key, mean, sigma, df, chol=chol)

    def logpdf(y, x):
        return mvt.logpdf(y, mean, sigma, df, chol=chol)

    return Proposal(sample=sample, logpdf=logpdf, symmetric=False)


def mh_step(
    key: jax.Array,
    x,
    log_target: Callable[[Any], jax.Array],
    proposal: Proposal,
):
    """One MH accept/reject. Returns (new_x, accepted, log_target(new_x)).

    Works on pytree states; fully vectorized — vmapping this over chains is
    the TPU analog of running the reference's MetropolisHastings::draw
    (Samplers/MetropolisHastings.cpp) once per chain.
    """
    k_prop, k_acc = jax.random.split(key)
    y = proposal.sample(k_prop, x)
    lp_x = log_target(x)
    lp_y = log_target(y)
    log_ratio = lp_y - lp_x
    if not proposal.symmetric:
        log_ratio = log_ratio + proposal.logpdf(x, y) - proposal.logpdf(y, x)
    u = jax.random.uniform(k_acc, jnp.shape(log_ratio),
                           jnp.result_type(log_ratio))
    accept = jnp.log(u) < log_ratio

    def pick(a, b):
        acc = jnp.reshape(accept, jnp.shape(accept) + (1,) * (jnp.ndim(a) - jnp.ndim(accept)))
        return jnp.where(acc, a, b)

    new_x = jax.tree_util.tree_map(pick, y, x)
    return new_x, accept, jnp.where(accept, lp_y, lp_x)


def random_walk_kernel(
    name: str,
    log_target: Callable[[Any, Any], jax.Array],
    scale=0.1,
    accept_counter: str | None = None,
):
    """Kernel updating state[name] by RWM; log_target(value, state)."""

    def kernel(key, state):
        prop = gaussian_random_walk(scale)
        x = state[name]
        new_x, accepted, _ = mh_step(
            key, x, lambda v: log_target(v, state), prop)
        out = dict(state)
        out[name] = new_x
        if accept_counter is not None:
            out[accept_counter] = state[accept_counter] + accepted
        return out

    return kernel
