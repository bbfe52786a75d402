"""Collective-computed convergence diagnostics on a chain-sharded mesh.

The host-side versions (inference/diagnostics.py) require all draws on
one device. Here the draws STAY sharded over the chain axis — each
device reduces its own chains to tiny per-chain summary statistics
(means, variances, FFT autocovariances), and only those [param]-sized
summaries cross the ICI via psum/pmean. No raw-draw gather ever happens,
so diagnostics scale to draw volumes that exceed any single device's
memory (SURVEY §7 phase 8 "distributed diagnostics"; the reference
computes diagnostics in R on a single host, Interfaces/R/bsts).

Both functions reproduce their host-side counterparts exactly (same
split-chain, same Geyer initial-monotone truncation) — tested for
equality on the virtual 8-device mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from boom_tpu.parallel.mesh import shard_map


def _local_split(x):
    """Split each local chain into halves: [c, n, p] -> [2c, n//2, p]."""
    c, n = x.shape[0], x.shape[1]
    half = n // 2
    return x[:, : 2 * half].reshape(c * 2, half, *x.shape[2:])


def sharded_rhat(draws, mesh: Mesh, chain_axis: str = "chains"):
    """Split R-hat with the chain axis sharded. draws: [chains, n, ...]
    (chain axis sharded over ``mesh[chain_axis]``) -> replicated [...]."""
    draws = jnp.asarray(draws)
    trailing = draws.shape[2:]
    flat = draws.reshape(draws.shape[0], draws.shape[1], -1)

    def local(x):
        x = _local_split(x)  # [2c_local, n/2, p]
        m_local = jnp.asarray(x.shape[0], x.dtype)
        means = jnp.mean(x, axis=1)  # [2c_local, p]
        vars_ = jnp.var(x, axis=1, ddof=1)
        # global counts / moments via psum of local sums
        m = jax.lax.psum(m_local, chain_axis)
        w = jax.lax.psum(jnp.sum(vars_, 0), chain_axis) / m
        gmean = jax.lax.psum(jnp.sum(means, 0), chain_axis) / m
        b_over_n = jax.lax.psum(
            jnp.sum((means - gmean) ** 2, 0), chain_axis) / (m - 1.0)
        n = x.shape[1]
        var_plus = (n - 1) / n * w + b_over_n
        return jnp.sqrt(var_plus / w)

    fn = shard_map(local, mesh=mesh, in_specs=P(chain_axis),
                   out_specs=P(), check_rep=False)
    out = jax.jit(fn)(flat)
    return out.reshape(trailing) if trailing else out[0]


def sharded_ess(draws, mesh: Mesh, chain_axis: str = "chains"):
    """Geyer initial-monotone ESS with the chain axis sharded.
    draws: [chains, n, ...] -> replicated [...]. Identical estimator to
    inference.diagnostics.effective_sample_size; per-chain FFT
    autocovariances are local, only their [n, p] sums cross devices."""
    draws = jnp.asarray(draws)
    trailing = draws.shape[2:]
    flat = draws.reshape(draws.shape[0], draws.shape[1], -1)

    def local(x):
        x = _local_split(x)
        m_local, n, p = x.shape
        m = jax.lax.psum(jnp.asarray(m_local, x.dtype), chain_axis)

        chain_vars = jnp.var(x, axis=1, ddof=1)
        w = jax.lax.psum(jnp.sum(chain_vars, 0), chain_axis) / m
        means = jnp.mean(x, axis=1)
        gmean = jax.lax.psum(jnp.sum(means, 0), chain_axis) / m
        b_over_n = jax.lax.psum(
            jnp.sum((means - gmean) ** 2, 0), chain_axis) / (m - 1.0)
        var_plus = (n - 1) / n * w + b_over_n

        # local per-chain autocovariance (FFT), then cross-device mean
        xc = x - means[:, None, :]
        size = 2 * n
        f = jnp.fft.rfft(xc, n=size, axis=1)
        acov = jnp.fft.irfft(f * jnp.conj(f), n=size, axis=1)[:, :n] / n
        mean_acov = jax.lax.psum(jnp.sum(acov, 0), chain_axis) / m

        rho = 1.0 - (w[None, :] - mean_acov) / var_plus[None, :]
        rho = rho.at[0].set(1.0)
        n_pairs = n // 2
        pairs = rho[: 2 * n_pairs].reshape(n_pairs, 2, p).sum(axis=1)
        positive = jnp.cumprod(pairs > 0.0, axis=0).astype(bool)
        monotone = jax.lax.associative_scan(jnp.minimum, pairs, axis=0)
        tau = -rho[0] + 2.0 * jnp.sum(
            jnp.where(positive, monotone, 0.0), axis=0)
        tau = jnp.maximum(tau, 1.0 / (m * n))
        ess = m * n / tau
        return jnp.clip(ess, 1.0, m * n * 10.0)

    fn = shard_map(local, mesh=mesh, in_specs=P(chain_axis),
                   out_specs=P(), check_rep=False)
    out = jax.jit(fn)(flat)
    return out.reshape(trailing) if trailing else out[0]
