"""Parallel-prefix (associative-scan) HMM forward filtering.

The sequential `forward_filter` in hmm.py is a T-step `lax.scan` — the
same serial-by-nature recursion as the reference's HmmFilter::fwd
(HmmFilter.cpp:84). Like the Kalman filter, the HMM forward recursion
admits an O(log T)-depth reformulation (SURVEY.md §5 'parallel-prefix
forward-backward' plan): the forward message is a prefix PRODUCT of the
per-step transition-x-emission matrices

    M_t[i, j] = P(z_t = j | z_{t-1} = i) p(y_t | z_t = j),

and matrix product is associative, so `jax.lax.associative_scan`
computes all prefixes in parallel. Products are carried in normalized
probability space with an accumulated log scale (the standard
stabilization: each combine renormalizes by its max element), matching
the sequential filter to float tolerance for T in the thousands.

This is the few-chains / long-series lever (the same regime where the
Pallas Kalman smoother wins): at large chain counts the batch axis
already fills the machine and the sequential scan is preferred.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _combine(ea, eb):
    """Associative combine of (prob-space matrix, log scale) pairs."""
    mat_a, log_a = ea
    mat_b, log_b = eb
    prod = mat_a @ mat_b
    norm = jnp.max(prod, axis=(-2, -1), keepdims=True)
    norm = jnp.maximum(norm, 1e-300)
    return prod / norm, log_a + log_b + jnp.log(norm[..., 0, 0])


def parallel_forward_filter(log_lik, log_trans, log_init):
    """Drop-in parallel equivalent of hmm.forward_filter.

    log_lik: [T, S], log_trans: [S, S] (row = from), log_init: [S].
    Returns (log_alpha [T, S] normalized per t, loglike scalar), equal
    to the sequential filter up to float round-off.
    """
    t_len, s = log_lik.shape
    # element 0: a matrix whose every ROW is the unnormalized alpha_1,
    # so every prefix product's rows all equal the (unnormalized)
    # filtered message at t
    la0 = log_init + log_lik[0]
    m0 = jnp.broadcast_to(la0[None, :], (s, s))
    rest = log_trans[None, :, :] + log_lik[1:, None, :]  # [T-1, S, S]
    log_mats = jnp.concatenate([m0[None], rest], axis=0)

    shift = jnp.max(log_mats, axis=(-2, -1), keepdims=True)
    mats = jnp.exp(log_mats - shift)
    elems = (mats, shift[..., 0, 0])
    prefixes, log_scales = jax.lax.associative_scan(_combine, elems,
                                                    axis=0)

    row = prefixes[:, 0, :]  # all rows equal; [T, S]
    row_norm = jnp.sum(row, axis=1, keepdims=True)
    log_alpha = jnp.log(jnp.maximum(row / row_norm, 1e-300))
    loglike = log_scales[-1] + jnp.log(row_norm[-1, 0])
    return log_alpha, loglike


def parallel_smoothed_marginals(log_lik, log_trans, log_init):
    """Parallel forward + parallel backward: P(z_t = s | y_{1:T}).

    The backward messages are SUFFIX products of the same matrices
    applied to the all-ones vector — one more associative scan with
    `reverse=True`."""
    t_len, s = log_lik.shape
    log_alpha, loglike = parallel_forward_filter(log_lik, log_trans,
                                                 log_init)
    rest = log_trans[None, :, :] + log_lik[1:, None, :]  # [T-1, S, S]
    # pad with identity at the end so suffix_t = M_{t+1} ... M_T
    eye = jnp.zeros((1, s, s)).at[0].set(jnp.eye(s))
    log_mats = jnp.concatenate(
        [rest, jnp.where(eye > 0, 0.0, -jnp.inf)], axis=0)
    shift = jnp.max(jnp.where(jnp.isfinite(log_mats), log_mats, 0.0),
                    axis=(-2, -1), keepdims=True)
    mats = jnp.exp(log_mats - shift)
    # reverse associative_scan composes operands in reversed order —
    # wrong for matrix products — so scan the TRANSPOSES: suffix
    # (M_{t+1} ... M_T)^T = M_T^T ... M_{t+1}^T matches its order
    elems = (jnp.swapaxes(mats, -1, -2), shift[..., 0, 0])
    suffixes_t, log_scales = jax.lax.associative_scan(
        _combine, elems, axis=0, reverse=True)
    beta = jnp.sum(suffixes_t, axis=1)  # [T, S] (suffix^T)^T @ ones
    log_beta = jnp.log(jnp.maximum(beta, 1e-300)) + log_scales[:, None]
    post = log_alpha + log_beta
    post = post - jax.scipy.special.logsumexp(post, axis=1,
                                              keepdims=True)
    return jnp.exp(post), loglike
