"""Masked (fixed-shape) subset linear algebra: the `Selector` replacement.

The reference's spike-and-slab machinery subsets vectors and SPD matrices
with a boolean inclusion vector (`Selector`, reference LinAlg/Selector.hpp:44;
`xtx(g)`, `xty(g)` in Glm/RegressionModel.hpp) and Cholesky-factors the
dynamic-size submatrix per model-indicator flip (BregVsSampler.cpp:216
log_model_prob). Dynamic shapes don't compile on TPU, so here the subset
operations keep the full fixed shape and *embed* the subproblem:

  masked_cholesky(A, m)  factors  B = A restricted to m with unit diagonal
                         elsewhere and zero coupling. Because excluded
                         rows/cols of B are exactly standard basis vectors,
                         chol(B) contains chol(A[m, m]) (in induced order) on
                         the included positions and unit diagonal elsewhere —
                         so one fixed-shape batched Cholesky serves any subset,
                         and vmap evaluates *many candidate subsets at once*
                         (the TPU-native form of the SSVS indicator sweep).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mask_outer(mask):
    """m_i & m_j as a float matrix."""
    m = jnp.asarray(mask)
    return m[..., :, None] * m[..., None, :]


def masked_spd(a, mask):
    """Embed A[m, m] in fixed shape: unit diagonal, zero coupling outside."""
    m = jnp.asarray(mask, a.dtype)
    mo = m[..., :, None] * m[..., None, :]
    eye = jnp.eye(a.shape[-1], dtype=a.dtype)
    return a * mo + eye * (1.0 - m[..., :, None])


def masked_cholesky(a, mask):
    """Cholesky factor of the masked embedding of A.

    Included block equals chol(A[m, m]) in induced order; excluded rows are
    unit basis vectors. Safe under jit/vmap for any mask.
    """
    return jnp.linalg.cholesky(masked_spd(a, mask))


def masked_logdet(chol, mask):
    """log det A[m, m] from a masked Cholesky factor."""
    m = jnp.asarray(mask, chol.dtype)
    d = jnp.diagonal(chol, axis1=-2, axis2=-1)
    return 2.0 * jnp.sum(m * jnp.log(jnp.where(m > 0, d, 1.0)), axis=-1)


def masked_cho_solve(chol, b, mask):
    """Solve A[m, m] x[m] = b[m]; zeros on excluded coordinates."""
    m = jnp.asarray(mask, b.dtype)
    bm = (b * m)[..., None]
    y = jax.scipy.linalg.solve_triangular(chol, bm, lower=True)
    x = jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(chol, -1, -2), y, lower=False)
    return x[..., 0] * m


def masked_quad_form_inv(chol, b, mask):
    """b[m]^T A[m,m]^{-1} b[m] given the masked Cholesky."""
    m = jnp.asarray(mask, b.dtype)
    y = jax.scipy.linalg.solve_triangular(
        chol, (b * m)[..., None], lower=True)[..., 0]
    return jnp.sum(y * y, axis=-1)


def masked_mvn_suf_sample(key, chol, prec_mean, mask):
    """Draw x ~ N(A[m,m]^{-1} b[m], A[m,m]^{-1}) embedded in fixed shape with
    zeros outside the subset. This is the reference's ``rmvn_suf_mt`` on a
    Selector subset (BregVsSampler.cpp:326 draw_beta) in one fixed-shape op."""
    m = jnp.asarray(mask, prec_mean.dtype)
    w = jax.scipy.linalg.solve_triangular(
        chol, (prec_mean * m)[..., None], lower=True)[..., 0]
    z = jax.random.normal(key, w.shape, w.dtype) * m
    x = jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(chol, -1, -2), (w + z)[..., None], lower=False)[..., 0]
    return x * m
