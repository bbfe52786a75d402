"""Spline bases: B-splines, natural cubic splines, M-splines.

Reference: stats/Bspline.hpp (Cox-de Boor recursion), stats/
NaturalSpline.hpp, stats/Mspline.hpp. Fixed knot vectors -> fixed-shape
basis matrices, built by a fori-style recursion over the degree (fully
vectorized over evaluation points; usable inside jit).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _augment_knots(knots, degree):
    lo = jnp.repeat(knots[:1], degree)
    hi = jnp.repeat(knots[-1:], degree)
    return jnp.concatenate([lo, knots, hi])


def bspline_basis(x, knots, degree: int = 3):
    """B-spline basis matrix [len(x), len(knots) + degree - 1] by the
    Cox-de Boor recursion (reference Bspline.hpp::basis)."""
    x = jnp.asarray(x)
    knots = jnp.asarray(knots)
    t = _augment_knots(knots, degree)
    n_basis = knots.shape[0] + degree - 1
    # degree 0: indicator of [t_i, t_{i+1}) (right-closed at the end)
    t0 = t[:-1]
    t1 = t[1:]
    b = jnp.where(
        (x[:, None] >= t0[None, :]) & (x[:, None] < t1[None, :]), 1.0, 0.0)
    last_active = jnp.argmax(
        jnp.where(t1 > t0, jnp.arange(t0.shape[0]), -1))
    b = b.at[:, last_active].set(
        jnp.where((x >= t0[last_active]) & (x <= t1[last_active]), 1.0,
                  b[:, last_active]))

    for d in range(1, degree + 1):
        i = jnp.arange(t.shape[0] - d - 1)
        denom1 = t[i + d] - t[i]
        denom2 = t[i + d + 1] - t[i + 1]
        w1 = jnp.where(denom1 > 0,
                       (x[:, None] - t[i][None, :]) / denom1[None, :], 0.0)
        w2 = jnp.where(denom2 > 0,
                       (t[i + d + 1][None, :] - x[:, None])
                       / denom2[None, :], 0.0)
        b = w1 * b[:, :-1] + w2 * b[:, 1:]
    return b[:, :n_basis]


def natural_spline_basis(x, knots):
    """Natural cubic spline basis [len(x), len(knots)] (reference
    NaturalSpline.hpp): truncated-power construction with linearity
    constraints beyond the boundary knots."""
    x = jnp.asarray(x)
    knots = jnp.asarray(knots)
    k = knots.shape[0]
    kmax = knots[-1]
    kpen = knots[-2]

    def d(j):
        num = (jnp.maximum(x - knots[j], 0.0) ** 3
               - jnp.maximum(x - kmax, 0.0) ** 3)
        return num / (kmax - knots[j])

    cols = [jnp.ones_like(x), x]
    dkm1 = d(k - 2)
    for j in range(k - 2):
        cols.append(d(j) - dkm1)
    return jnp.stack(cols, axis=-1)


def mspline_basis(x, knots, degree: int = 3):
    """M-spline basis (nonnegative, integrates to 1 per element;
    reference Mspline.hpp): normalized B-splines."""
    b = bspline_basis(x, knots, degree)
    t = _augment_knots(jnp.asarray(knots), degree)
    i = jnp.arange(b.shape[1])
    width = t[i + degree + 1] - t[i]
    scale = jnp.where(width > 0, (degree + 1.0) / width, 0.0)
    return b * scale[None, :]
