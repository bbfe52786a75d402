"""MCMC state and kernel protocol.

The reference's composable-Gibbs design (a Model owns PosteriorSampler
objects; ``sample_posterior()`` runs each sampler's ``draw()`` in sequence —
reference Models/Policies/PriorPolicy.cpp:25-29 and
Models/PosteriorSamplers/PosteriorSampler.hpp:44) maps to:

  state   : an arbitrary pytree (usually a dict of named parameter arrays,
            latent data, and kernel bookkeeping) — one per chain, vmapped.
  kernel  : a pure function ``(key, state) -> state``.
  program : ``compose(k1, k2, ...)`` — sequential sweep, one Gibbs cycle.

Kernels carry no Python-side mutable state; anything adaptive (step sizes,
acceptance counters — the reference's MoveAccounting, Samplers/
MoveAccounting.hpp:54) lives inside ``state`` so the whole chain is a single
jitted ``lax.scan``.
"""

from __future__ import annotations

from typing import Any, Callable

import jax

Kernel = Callable[[jax.Array, Any], Any]


def compose(*kernels: Kernel) -> Kernel:
    """Sequential kernel composition: one full Gibbs sweep.

    Equivalent of PriorPolicy::sample_posterior's loop over registered
    samplers (reference Models/Policies/PriorPolicy.cpp:25-29).
    """

    def sweep(key: jax.Array, state):
        keys = jax.random.split(key, len(kernels))
        for k, kern in zip(keys, kernels):
            state = kern(k, state)
        return state

    return sweep


def repeat(kernel: Kernel, n: int) -> Kernel:
    """Apply a kernel n times per sweep (thinning inside jit)."""

    def repeated(key, state):
        def body(carry, k):
            return kernel(k, carry), None

        state, _ = jax.lax.scan(body, state, jax.random.split(key, n))
        return state

    return repeated


def on_site(name: str, site_kernel: Callable) -> Kernel:
    """Adapt a kernel that updates ``state[name]`` given the full state.

    ``site_kernel(key, value, state) -> new_value``.
    """

    def kernel(key, state):
        new_value = site_kernel(key, state[name], state)
        out = dict(state)
        out[name] = new_value
        return out

    return kernel
