"""Batched linear algebra for MCMC: masked-subset ops, SWEEP, helpers.

Replaces the reference's LinAlg/ layer (Vector/Matrix/SpdMatrix/Selector,
Cholesky/LU/QR/SVD via vendored Eigen — reference LinAlg/Cholesky.cpp:39).
Dense containers are plain jnp arrays with batch dims; decompositions are
``jax.lax.linalg`` batched ops; the Selector becomes fixed-shape boolean
masks (see masked.py).
"""

import jax
import jax.numpy as jnp

from boom_tpu.linalg.masked import (
    mask_outer,
    masked_cho_solve,
    masked_cholesky,
    masked_logdet,
    masked_mvn_suf_sample,
    masked_quad_form_inv,
    masked_spd,
)
from boom_tpu.linalg.sweep import sweep, sweep_subset, unsweep


def symmetrize(a):
    """0.5 (A + A^T) — guards accumulated asymmetry in sufstat updates."""
    return 0.5 * (a + jnp.swapaxes(a, -1, -2))


def add_to_diag(a, v):
    """A + v*I for scalar v, or A + diag(v) for v with trailing dim d."""
    eye = jnp.eye(a.shape[-1], dtype=a.dtype)
    v = jnp.asarray(v)
    if v.ndim == 0:
        return a + eye * v
    return a + eye * v[..., None, :]


def cho_logdet(chol):
    return 2.0 * jnp.sum(
        jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1)), axis=-1)


def cho_solve(chol, b):
    """Solve A x = b given lower Cholesky, batched; b may be vector or
    matrix (trailing dims)."""
    vec = b.ndim == chol.ndim - 1
    bb = b[..., None] if vec else b
    y = jax.scipy.linalg.solve_triangular(chol, bb, lower=True)
    x = jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(chol, -1, -2), y, lower=False)
    return x[..., 0] if vec else x


__all__ = [
    "mask_outer", "masked_spd", "masked_cholesky", "masked_logdet",
    "masked_cho_solve", "masked_quad_form_inv", "masked_mvn_suf_sample",
    "sweep", "unsweep", "sweep_subset",
    "symmetrize", "add_to_diag", "cho_logdet", "cho_solve",
]
