"""Multivariate regression with conjugate matrix-normal/inverse-Wishart.

Reference: Models/Glm/MultivariateRegression.hpp (+
MultivariateRegressionSampler): Y [n, m] = X B + E with E rows
N(0, Sigma); conjugate prior B | Sigma ~ MatrixNormal(B0, Omega^-1,
Sigma), Sigma ~ InverseWishart(df, SS).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from boom_tpu import dists


class MvRegSuf(NamedTuple):
    """xtx [p,p], xty [p,m], yty [m,m], n (reference MvRegSuf)."""

    xtx: jax.Array
    xty: jax.Array
    yty: jax.Array
    n: jax.Array

    @staticmethod
    def from_data(x, y):
        return MvRegSuf(xtx=x.T @ x, xty=x.T @ y, yty=y.T @ y,
                        n=jnp.asarray(x.shape[0], x.dtype))

    def combine(self, other):
        return MvRegSuf(*(a + b for a, b in zip(self, other)))


@dataclasses.dataclass(frozen=True)
class MultivariateRegression:
    """State: B [p, m], siginv [m, m]."""

    suf: MvRegSuf
    prior_mean: jax.Array  # [p, m]
    prior_precision: jax.Array  # [p, p] Omega
    prior_df: float
    prior_ss: jax.Array  # [m, m]

    @staticmethod
    def from_data(x, y, prior_nobs=1.0, prior_df=None):
        n, p = x.shape
        m = y.shape[1]
        suf = MvRegSuf.from_data(x, y)
        return MultivariateRegression(
            suf=suf,
            prior_mean=jnp.zeros((p, m)),
            prior_precision=prior_nobs * suf.xtx / n,
            prior_df=prior_df or (m + 2.0),
            prior_ss=jnp.eye(m) * (prior_df or (m + 2.0)),
        )

    def posterior_params(self):
        """(B_tilde, posterior row precision, IW df, IW sum of squares)."""
        prec = self.prior_precision + self.suf.xtx
        rhs = self.prior_precision @ self.prior_mean + self.suf.xty
        b_tilde = jnp.linalg.solve(prec, rhs)
        ss = (self.prior_ss + self.suf.yty
              + self.prior_mean.T @ self.prior_precision @ self.prior_mean
              - b_tilde.T @ prec @ b_tilde)
        ss = 0.5 * (ss + ss.T)
        df = self.prior_df + self.suf.n
        return b_tilde, prec, df, ss

    def init_state(self, key):
        b_tilde, _, _, ss = self.posterior_params()
        m = ss.shape[0]
        return {"B": b_tilde,
                "siginv": jnp.eye(m)}

    def kernel(self):
        b_tilde, prec, df, ss = self.posterior_params()
        row_cov = jnp.linalg.inv(prec)
        row_cov = 0.5 * (row_cov + row_cov.T)

        def sweep(key, state):
            k1, k2 = jax.random.split(key)
            # Sigma^-1 | data (B integrated out: conjugate MNIW marginal)
            siginv = dists.wishart.sample(
                k1, df, jnp.linalg.inv(ss))
            sigma = jnp.linalg.inv(siginv)
            sigma = 0.5 * (sigma + sigma.T)
            # B | Sigma, data ~ MatrixNormal(B_tilde, prec^-1, Sigma)
            b = dists.matrix_normal.sample(k2, b_tilde, row_cov, sigma)
            return {"B": b, "siginv": siginv}

        return sweep

    @staticmethod
    def simulate(key, n, p, m, noise_scale=0.5):
        k1, k2, k3 = jax.random.split(key, 3)
        x = jax.random.normal(k1, (n, p))
        b = jax.random.normal(k2, (p, m))
        y = x @ b + noise_scale * jax.random.normal(k3, (n, m))
        return x, y, b
