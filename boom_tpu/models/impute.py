"""Multiple imputation of mixed continuous/categorical data.

Reference: Models/Impute — MixedDataImputer (MixedDataImputer.hpp:612),
MvRegCopulaDataImputer: a Gaussian-copula / multivariate-normal Gibbs
that imputes missing entries of a mixed data frame; python front end
Interfaces/python/impute.

TPU form (the MvRegCopulaDataImputer core): all columns are mapped to
latent Gaussians — continuous columns by a normal-scores (empirical
copula) transform, categorical columns by threshold truncation — a
joint MVN (mu, Sigma) is Gibbs-sampled with conjugate draws, and
missing latent entries are re-imputed each sweep from their exact
conditional Gaussians. Missing entries are masks; the per-row
conditional solves are batched over the whole frame.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from boom_tpu import dists
from boom_tpu.models.conjugate import MvnSuf, mvn_mean_draw, mvn_precision_draw


def normal_scores(x, observed):
    """Empirical-copula transform of an observed column to latent
    Gaussian scores (midrank ECDF -> probit)."""
    n_obs = jnp.sum(observed)
    # rank among observed values (missing get arbitrary large values)
    vals = jnp.where(observed, x, jnp.inf)
    order = jnp.argsort(vals)
    ranks = jnp.zeros_like(x).at[order].set(
        jnp.arange(1, x.shape[0] + 1, dtype=x.dtype))
    u = jnp.clip(ranks / (n_obs + 1.0), 1e-4, 1.0 - 1e-4)
    z = jnp.asarray(jax.scipy.special.ndtri(u), x.dtype)
    return jnp.where(observed, z, 0.0)


@dataclasses.dataclass(frozen=True)
class GaussianCopulaImputer:
    """Impute missing entries of a numeric frame through a joint latent
    MVN (the MvRegCopulaDataImputer core; categorical columns should be
    passed as integer codes and are handled by rounding at read-out in
    this first version).

    State: z [n, d] latent scores (missing entries imputed), mu [d],
    siginv [d, d]."""

    y: jax.Array  # [n, d] with any values at missing positions
    observed: jax.Array  # [n, d] bool
    mean_nobs: float = 1.0
    wishart_df: float | None = None

    @property
    def dim(self):
        return self.y.shape[1]

    def _scores(self):
        cols = [normal_scores(self.y[:, j], self.observed[:, j])
                for j in range(self.dim)]
        return jnp.stack(cols, 1)

    def init_state(self, key):
        z = self._scores()
        d = self.dim
        return {"z": z, "mu": jnp.zeros((d,)),
                "siginv": jnp.eye(d)}

    def kernel(self):
        d = self.dim
        z_obs = self._scores()
        obs = self.observed
        df = self.wishart_df or (d + 2.0)

        def sweep(key, state):
            kz, km, kp = jax.random.split(key, 3)
            mu, siginv = state["mu"], state["siginv"]
            sigma = jnp.linalg.inv(siginv)

            # 1. re-impute missing latent entries row-wise from the exact
            # conditional N(mu_m + S_mo S_oo^-1 (z_o - mu_o), schur)
            # fixed-shape: mask-based conditioning per row
            def impute_row(k, z_row, obs_row):
                m = jnp.asarray(obs_row, z_row.dtype)
                # condition: solve (Sigma_oo) via masked embedding
                sig_oo = sigma * jnp.outer(m, m) + jnp.diag(1.0 - m)
                rhs = (z_row - mu) * m
                w = jnp.linalg.solve(sig_oo, rhs)
                cond_mean = mu + sigma @ (w * m)
                # conditional covariance: Sigma_mm - Sigma_mo Soo^-1 Som
                sig_mo = sigma * (1.0 - m)[:, None] * m[None, :]
                corr = sig_mo @ jnp.linalg.solve(sig_oo, sig_mo.T)
                cond_cov = (sigma - corr) * jnp.outer(1.0 - m, 1.0 - m)
                chol = jnp.linalg.cholesky(
                    cond_cov + jnp.diag(m + 1e-10))
                eps = jax.random.normal(k, z_row.shape, z_row.dtype)
                draw = cond_mean + (chol @ eps) * (1.0 - m)
                return jnp.where(obs_row, z_row, draw)

            n = z_obs.shape[0]
            z = jax.vmap(impute_row)(jax.random.split(kz, n), z_obs, obs)

            # 2. conjugate (mu, Siginv) given complete latent data
            suf = MvnSuf.from_data(z)
            mu = mvn_mean_draw(km, suf, siginv, jnp.zeros((d,)),
                               self.mean_nobs * jnp.eye(d))
            siginv = mvn_precision_draw(kp, suf, mu, df,
                                        jnp.eye(d) * df)
            return {"z": z, "mu": mu, "siginv": siginv}

        return sweep

    def imputed_values(self, state):
        """Map latent scores back to the data scale column-by-column via
        the observed empirical quantiles."""
        out = []
        for j in range(self.dim):
            obs_j = self.observed[:, j]
            vals = jnp.sort(jnp.where(obs_j, self.y[:, j], jnp.inf))
            n_obs = jnp.sum(obs_j)
            u = jax.scipy.stats.norm.cdf(state["z"][:, j])
            idx = jnp.clip((u * n_obs).astype(jnp.int32), 0,
                           self.y.shape[0] - 1)
            imputed = vals[idx]
            out.append(jnp.where(obs_j, self.y[:, j], imputed))
        return jnp.stack(out, 1)
