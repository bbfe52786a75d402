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


def flip_sweep(a, k, currently_swept):
    """sweep(a, k) when `currently_swept` is False, unsweep(a, k) when
    True — in ONE rank-1 pass. The two operations share the entire
    rank-1 body and differ only in the sign applied to row/col k
    (row_sign), which may be a traced per-batch scalar. This halves the
    matrix work of a data-dependent flip versus computing both results
    and selecting (the select form also materializes three [d, d]
    buffers; under a chain vmap that extra HBM traffic is the dominant
    cost of the SSVS flip scan)."""
    a = jnp.asarray(a)
    sign = jnp.where(currently_swept, -1.0, 1.0).astype(a.dtype)
    return _rank1_sweep(a, k, row_sign=sign)


def gated_flip_sweep(a, k, currently_swept, gate):
    """flip_sweep(a, k, currently_swept) when `gate` is True, `a`
    unchanged when False — the gate folded INTO the rank-1 pass instead
    of a post-hoc select over the full matrix. In a Gibbs flip scan the
    accept decision is per-chain data, so a `lax.cond` lowers to a
    select under vmap anyway; this form removes that extra full-matrix
    read-write per iteration."""
    a = jnp.asarray(a)
    d = a.shape[-1]
    g = jnp.asarray(gate, a.dtype)
    sign = jnp.where(currently_swept, -1.0, 1.0).astype(a.dtype)
    col = jax.lax.dynamic_slice_in_dim(a, k, 1, axis=-1)  # (..., d, 1)
    row = jax.lax.dynamic_slice_in_dim(a, k, 1, axis=-2)  # (..., 1, d)
    pivot = jax.lax.dynamic_slice_in_dim(col, k, 1, axis=-2)
    inv_pivot = 1.0 / pivot
    ek_row = jax.nn.one_hot(k, d, dtype=a.dtype)[None, :]
    ek_col = ek_row.reshape(d, 1)
    not_k_row = 1.0 - ek_row
    not_k_col = 1.0 - ek_col
    g_b = jnp.reshape(g, jnp.shape(g) + (1, 1)) if jnp.ndim(g) else g

    out = a - g_b * (col * inv_pivot * row)
    out = out * not_k_col * not_k_row
    # row/col k: scaled by sign/pivot when gated, passed through when not
    edge = g_b * (sign * inv_pivot) + (1.0 - g_b)
    out = out + ek_col * (row * edge * not_k_row)
    out = out + ek_row * (col * edge * not_k_col)
    corner = g_b * (-inv_pivot) + (1.0 - g_b) * pivot
    out = out + (ek_col * ek_row) * corner
    return out


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
