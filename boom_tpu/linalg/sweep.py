"""Batched SWEEP operator.

Reference: LinAlg/SWEEP.{hpp,cpp} (`SweptVarianceMatrix`) — sweeping index k
of an SPD matrix conditions a Gaussian on coordinate k; sweeping a subset
yields regression coefficients and conditional variances. Used by the
reference for conditional distributions and model search.

The TPU formulation: rank-1 update expressed as outer products (VPU
friendly), batched over leading dims, and a mask-driven `sweep_subset` that
scans a fixed number of indices so it jits with static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _rank1_sweep(a, k, row_sign):
    """Shared body for sweep/unsweep.

    sweep:   A'[i,j] = A[i,j] - A[i,k]A[k,j]/p ;  A'[k,j] =  A[k,j]/p ;
             A'[i,k] = A[i,k]/p ;                 A'[k,k] = -1/p
    unsweep: same with row/col scaled by -1/p (row_sign = -1).
    """
    a = jnp.asarray(a)
    d = a.shape[-1]
    col = jax.lax.dynamic_slice_in_dim(a, k, 1, axis=-1)  # (..., d, 1)
    row = jax.lax.dynamic_slice_in_dim(a, k, 1, axis=-2)  # (..., 1, d)
    pivot = jax.lax.dynamic_slice_in_dim(col, k, 1, axis=-2)  # (..., 1, 1)
    inv_pivot = 1.0 / pivot
    ek_row = jax.nn.one_hot(k, d, dtype=a.dtype)[None, :]  # (1, d)
    ek_col = ek_row.reshape(d, 1)  # (d, 1)
    not_k_row = 1.0 - ek_row
    not_k_col = 1.0 - ek_col

    out = a - col * inv_pivot * row
    # zero row k and col k, then write them explicitly
    out = out * not_k_col * not_k_row
    out = out + ek_col * (row * (row_sign * inv_pivot) * not_k_row)
    out = out + ek_row * (col * (row_sign * inv_pivot) * not_k_col)
    out = out - (ek_col * ek_row) * inv_pivot
    return out


def sweep(a, k):
    """Sweep index k of SPD matrix a (batched over leading dims).

    After sweeping indices in set S of covariance matrix Sigma, the matrix
    holds -Sigma_SS^{-1} in the S block, regression coefficients
    Sigma_SS^{-1} Sigma_S,~S in the off-blocks, and the conditional
    covariance of the complement in the ~S block.
    """
    return _rank1_sweep(a, k, row_sign=1.0)


def unsweep(a, k):
    """Inverse of sweep(a, k) (reference SWEEP.hpp RSW operator)."""
    return _rank1_sweep(a, k, row_sign=-1.0)


def sweep_subset(a, mask):
    """Sweep every index where mask is True, via a fixed-length scan.

    Unswept lanes pass through unchanged, so this compiles once for any
    subset mask (the Selector analog for conditional Gaussians).
    """
    a = jnp.asarray(a)
    d = a.shape[-1]
    maskf = jnp.asarray(mask)

    def body(carry, k):
        swept = sweep(carry, k)
        take = maskf[..., k]
        take_b = jnp.reshape(take, jnp.shape(take) + (1, 1)) if jnp.ndim(take) else take
        out = jnp.where(take_b, swept, carry)
        return out, None

    out, _ = jax.lax.scan(body, a, jnp.arange(d))
    return out
