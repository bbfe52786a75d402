"""Slice samplers with fixed-trip-count stepping-out and shrinkage.

Reference: Samplers/ScalarSliceSampler.hpp:28 (the default nonconjugate
fallback throughout BOOM), Samplers/SliceSampler.hpp:30 (vector version via
random direction), Samplers/UnivariateSliceSampler.hpp:34 (one-coordinate-
at-a-time). The reference's unbounded while-loops become fixed-trip masked
loops: `expand_iters` doublings bound the stepping-out phase and
`shrink_iters` bound the shrinkage phase. With standard settings the
probability of an unconverged lane is ~2^-shrink_iters; unconverged lanes
keep the current point (a valid, if lazy, MCMC move — the kernel remains
invariant because staying put preserves the target)."""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp


def slice_step(
    key: jax.Array,
    x: jax.Array,
    log_target: Callable[[jax.Array], jax.Array],
    width=1.0,
    *,
    expand_iters: int = 16,
    shrink_iters: int = 32,
    lower=-jnp.inf,
    upper=jnp.inf,
):
    """One scalar slice-sampling update, elementwise over x's shape.

    log_target must map arrays elementwise (each lane an independent
    coordinate/chain). Supports bounded supports via lower/upper.
    """
    x = jnp.asarray(x)
    dtype = x.dtype
    k_h, k_u, k_lr, k_shrink = jax.random.split(key, 4)

    logy = log_target(x) + jnp.log(
        jax.random.uniform(k_h, x.shape, dtype, minval=jnp.finfo(dtype).tiny))

    # initial interval around x
    u = jax.random.uniform(k_u, x.shape, dtype)
    left = jnp.maximum(x - width * u, lower)
    right = jnp.minimum(left + width, upper)

    # stepping out (Neal 2003, fixed step = width): expand each side while
    # its endpoint is inside the slice. Fixed-width steps keep the kernel
    # exactly invariant with plain shrinkage (no doubling acceptance test).
    def expand_body(_, carry):
        left, right = carry
        grow_l = (log_target(left) > logy) & (left > lower)
        grow_r = (log_target(right) > logy) & (right < upper)
        left = jnp.where(grow_l, jnp.maximum(left - width, lower), left)
        right = jnp.where(grow_r, jnp.minimum(right + width, upper), right)
        return left, right

    left, right = jax.lax.fori_loop(0, expand_iters, expand_body,
                                    (left, right))

    # shrinkage: sample in [left, right], shrink toward x on rejection
    def shrink_body(carry, k):
        left, right, cur, done = carry
        u = jax.random.uniform(k, x.shape, dtype)
        prop = left + u * (right - left)
        ok = log_target(prop) > logy
        take = ok & ~done
        cur = jnp.where(take, prop, cur)
        done = done | ok
        # shrink only lanes still searching
        shrink_l = (~done) & (prop < x)
        left = jnp.where(shrink_l, prop, left)
        right = jnp.where((~done) & (prop >= x), prop, right)
        return (left, right, cur, done), None

    keys = jax.random.split(k_shrink, shrink_iters)
    (_, _, cur, done), _ = jax.lax.scan(
        shrink_body, (left, right, x, jnp.zeros(x.shape, bool)), keys)
    return cur


def slice_kernel(
    name: str,
    log_target: Callable[[jax.Array, Any], jax.Array],
    width=1.0,
    lower=-jnp.inf,
    upper=jnp.inf,
    **opts,
):
    """Kernel updating every element of state[name] with an independent
    scalar slice move (UnivariateSliceSampler analog but simultaneous:
    coordinates with independent conditionals update in parallel;
    for correlated coordinates use ``coordinate_slice_kernel``)."""

    def kernel(key, state):
        x = state[name]
        out = dict(state)
        out[name] = slice_step(
            key, x, lambda v: log_target(v, state), width,
            lower=lower, upper=upper, **opts)
        return out

    return kernel


def coordinate_slice_kernel(
    name: str,
    log_target: Callable[[jax.Array, Any], jax.Array],
    width=1.0,
    lower=-jnp.inf,
    upper=jnp.inf,
    **opts,
):
    """One-coordinate-at-a-time slice sweep over the last axis of
    state[name] (the true UnivariateSliceSampler semantics, reference
    Samplers/UnivariateSliceSampler.hpp:34): coordinate j is updated with
    all other coordinates held at their *current* values. The sweep is a
    `lax.scan` over coordinates — serial in p but each step is vectorized
    across chains."""

    def kernel(key, state):
        x0 = state[name]
        p = x0.shape[-1]

        def body(x, inp):
            j, k = inp
            ej = jax.nn.one_hot(j, p, dtype=x.dtype)

            def target_j(v):
                # v is scalar (or batch-shaped); embed into position j
                xj = x * (1.0 - ej) + v[..., None] * ej
                return log_target(xj, state)

            vj = slice_step(k, x[..., 0] * 0.0 + jnp.take(x, j, axis=-1),
                            target_j, width, lower=lower, upper=upper, **opts)
            x = x * (1.0 - ej) + vj[..., None] * ej
            return x, None

        keys = jax.random.split(key, p)
        x, _ = jax.lax.scan(body, x0, (jnp.arange(p), keys))
        out = dict(state)
        out[name] = x
        return out

    return kernel
