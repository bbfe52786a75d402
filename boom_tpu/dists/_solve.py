"""Vectorized root solvers used to implement quantile functions.

The reference computes quantiles with scalar iterative C routines ported from
R's libRmath (reference Bmath/qgamma.cpp, Bmath/qbeta.cpp, Bmath/qnbinom.cpp
...). Those are inherently serial per-element loops; the TPU-native
replacement is a fixed-trip-count, fully vectorized safeguarded
bisection+Newton solve that runs on the VPU for an entire batch of quantiles
at once. Fixed trip counts keep everything jittable with static shapes.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def _finfo(x):
    return jnp.finfo(jnp.result_type(x, jnp.float32))


def expand_bracket(
    cdf: Callable[[jax.Array], jax.Array],
    p: jax.Array,
    lo: jax.Array,
    hi: jax.Array,
    growth: float = 2.0,
    iters: int = 70,
):
    """Grow ``(lo, hi)`` geometrically until ``cdf(lo) <= p <= cdf(hi)``.

    All-lane fixed-trip loop: lanes whose bracket already contains the root
    stop moving. ``lo``/``hi`` must be positive-direction expandable (use on a
    transformed axis if the support is the whole line).
    """
    p, lo, hi = jnp.broadcast_arrays(p, lo, hi)

    def body(_, carry):
        lo, hi = carry
        lo_bad = cdf(lo) > p
        hi_bad = cdf(hi) < p
        width = jnp.maximum(hi - lo, _finfo(hi).tiny)
        new_lo = jnp.where(lo_bad, lo - growth * width, lo)
        new_hi = jnp.where(hi_bad, hi + growth * width, hi)
        return new_lo, new_hi

    return jax.lax.fori_loop(0, iters, body, (lo, hi))


def bisect_cdf(
    cdf: Callable[[jax.Array], jax.Array],
    p: jax.Array,
    lo: jax.Array,
    hi: jax.Array,
    iters: int = 90,
):
    """Solve ``cdf(x) = p`` by bisection on a valid bracket. ~2^-90 interval
    reduction: beyond f64 precision, so accuracy is limited only by the cdf."""
    p, lo, hi = jnp.broadcast_arrays(p, lo, hi)

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        go_right = cdf(mid) < p
        return jnp.where(go_right, mid, lo), jnp.where(go_right, hi, mid)

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return 0.5 * (lo + hi)


def bisect_cdf_bracket(cdf, p, lo, hi, iters: int = 90):
    """Like bisect_cdf but also returns the refined bracket (for Newton)."""
    p, lo, hi = jnp.broadcast_arrays(p, lo, hi)

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        go_right = cdf(mid) < p
        return jnp.where(go_right, mid, lo), jnp.where(go_right, hi, mid)

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return 0.5 * (lo + hi), lo, hi


def newton_cdf(
    cdf: Callable[[jax.Array], jax.Array],
    logpdf: Callable[[jax.Array], jax.Array],
    p: jax.Array,
    x0: jax.Array,
    lo: jax.Array,
    hi: jax.Array,
    iters: int = 8,
):
    """Polish a quantile estimate with safeguarded Newton steps.

    Steps that would exit the bracket fall back to bisection of the current
    bracket. The bracket shrinks monotonically so the result is never worse
    than bisection alone.
    """
    p, x0, lo, hi = jnp.broadcast_arrays(p, x0, lo, hi)

    def body(_, carry):
        x, lo, hi = carry
        f = cdf(x) - p
        lo = jnp.where(f < 0, jnp.maximum(lo, x), lo)
        hi = jnp.where(f > 0, jnp.minimum(hi, x), hi)
        step = f * jnp.exp(-logpdf(x))
        x_new = x - step
        # Strict bounds: x_new == lo/hi means the step underflowed against
        # x (already converged to round-off) — keep it, don't bisect.
        bad = ~jnp.isfinite(x_new) | (x_new < lo) | (x_new > hi)
        x_new = jnp.where(bad, 0.5 * (lo + hi), x_new)
        return x_new, lo, hi

    x, _, _ = jax.lax.fori_loop(0, iters, body, (x0, lo, hi))
    return x


def quantile_via_cdf(
    cdf: Callable[[jax.Array], jax.Array],
    logpdf: Callable[[jax.Array], jax.Array] | None,
    p: jax.Array,
    lo,
    hi,
    expand: bool = True,
    bisect_iters: int = 60,
    newton_iters: int = 6,
):
    """Generic continuous quantile: bracket -> bisect -> Newton polish."""
    p = jnp.asarray(p)
    lo = jnp.broadcast_to(jnp.asarray(lo, p.dtype), p.shape)
    hi = jnp.broadcast_to(jnp.asarray(hi, p.dtype), p.shape)
    if expand:
        lo, hi = expand_bracket(cdf, p, lo, hi)
    x, lo, hi = bisect_cdf_bracket(cdf, p, lo, hi, iters=bisect_iters)
    if logpdf is not None:
        x = newton_cdf(cdf, logpdf, p, x, lo, hi, iters=newton_iters)
    return x


def discrete_quantile(
    cdf: Callable[[jax.Array], jax.Array],
    p: jax.Array,
    hi0,
    iters: int = 64,
):
    """Smallest integer k >= 0 with ``cdf(k) >= p`` (R-style discrete
    quantile). Integer bisection after geometric upper-bound expansion."""
    p = jnp.asarray(p)
    dtype = p.dtype
    hi = jnp.broadcast_to(jnp.asarray(hi0, dtype), p.shape)
    lo = jnp.zeros_like(hi)

    def grow(_, hi):
        return jnp.where(cdf(hi) < p, hi * 2.0 + 16.0, hi)

    hi = jax.lax.fori_loop(0, 64, grow, hi + 16.0)

    def body(_, carry):
        lo, hi = carry
        mid = jnp.floor(0.5 * (lo + hi))
        ok = cdf(mid) >= p  # mid is an upper candidate
        return jnp.where(ok, lo, mid + 1.0), jnp.where(ok, mid, hi)

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return hi
