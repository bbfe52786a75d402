"""Multivariate distributions, batched over leading dimensions.

Reference: distributions.hpp:219-372 (rmvn_mt, rmvn_ivar_mt, rmvn_suf_mt,
rmatrix_normal_ivar_mt), distributions/Wishart.cpp, dirichlet.cpp, mvt.cpp,
matrix_normal.cpp, rmulti.cpp. All functions operate on the Cholesky factor
where possible so a single factorization is shared between density and
sampling, and everything maps onto batched ``lax.linalg`` ops (MXU-friendly).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.scipy import special as jsp

_LOG_2PI = math.log(2.0 * math.pi)


def _solve_tri(chol, b, lower=True, trans=False):
    """Triangular solve with full batch broadcasting between chol and b."""
    chol = jnp.asarray(chol)
    b = jnp.asarray(b)
    batch = jnp.broadcast_shapes(chol.shape[:-2], b.shape[:-2])
    chol = jnp.broadcast_to(chol, batch + chol.shape[-2:])
    b = jnp.broadcast_to(b, batch + b.shape[-2:])
    if trans:
        chol = jnp.swapaxes(chol, -1, -2)
        lower = not lower
    return jax.scipy.linalg.solve_triangular(chol, b, lower=lower)


def _solve_tri_lower(chol, b):
    return _solve_tri(chol, b, lower=True)


def _cho_solve_bc(chol, b_mat):
    """A^{-1} B given lower Cholesky of A, batch-broadcast."""
    y = _solve_tri(chol, b_mat, lower=True)
    return _solve_tri(chol, y, lower=True, trans=True)


def log_det_from_chol(chol):
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1)), axis=-1)


# ---------------------------------------------------------------------------
# Multivariate normal
# ---------------------------------------------------------------------------
class mvn:
    """MVN in several parameterizations, mirroring the reference's rmvn_mt /
    rmvn_ivar_mt / rmvn_suf_mt (distributions.hpp:219-:256) and dmvn."""

    @staticmethod
    def logpdf(x, mean, cov=None, chol=None):
        if chol is None:
            chol = jnp.linalg.cholesky(cov)
        d = x.shape[-1]
        z = _solve_tri_lower(chol, (x - mean)[..., None])[..., 0]
        maha = jnp.sum(z * z, axis=-1)
        return -0.5 * (d * _LOG_2PI + log_det_from_chol(chol) + maha)

    @staticmethod
    def logpdf_prec(x, mean, prec=None, prec_chol=None):
        """Density given the precision matrix (ivar form)."""
        if prec_chol is None:
            prec_chol = jnp.linalg.cholesky(prec)
        d = x.shape[-1]
        z = jnp.einsum("...ij,...i->...j", prec_chol, x - mean)
        maha = jnp.sum(z * z, axis=-1)
        return -0.5 * (d * _LOG_2PI - log_det_from_chol(prec_chol) + maha)

    @staticmethod
    def sample(key, mean, cov=None, chol=None, shape=None):
        if chol is None:
            chol = jnp.linalg.cholesky(cov)
        mean = jnp.asarray(mean)
        fs = jnp.broadcast_shapes(mean.shape, chol.shape[:-1])
        if shape is not None:
            fs = tuple(shape) + fs
        z = jax.random.normal(key, fs, mean.dtype)
        return mean + jnp.einsum("...ij,...j->...i", chol, z)

    @staticmethod
    def sample_prec(key, mean, prec=None, prec_chol=None, shape=None):
        """Draw from N(mean, prec^{-1}) via back-substitution on the
        precision Cholesky: x = mean + L^-T z (reference rmvn_ivar_mt)."""
        if prec_chol is None:
            prec_chol = jnp.linalg.cholesky(prec)
        mean = jnp.asarray(mean)
        fs = jnp.broadcast_shapes(mean.shape, prec_chol.shape[:-1])
        if shape is not None:
            fs = tuple(shape) + fs
        z = jax.random.normal(key, fs, mean.dtype)
        x = _solve_tri(prec_chol, z[..., None], lower=True, trans=True)[..., 0]
        return mean + x

    @staticmethod
    def sample_suf(key, prec_mean, prec=None, prec_chol=None, shape=None):
        """Draw from N(prec^{-1} b, prec^{-1}) given natural parameters
        (b = prec * mean). This is the reference's rmvn_suf_mt
        (distributions.hpp:256) — the workhorse of every conjugate
        regression/coefficient draw. One Cholesky serves both the mean solve
        and the noise draw."""
        if prec_chol is None:
            prec_chol = jnp.linalg.cholesky(prec)
        w = _solve_tri_lower(prec_chol, jnp.asarray(prec_mean)[..., None])[..., 0]
        fs = jnp.broadcast_shapes(w.shape, prec_chol.shape[:-1])
        if shape is not None:
            fs = tuple(shape) + fs
        z = jax.random.normal(key, fs, w.dtype)
        x = _solve_tri(prec_chol, (w + z)[..., None], lower=True,
                       trans=True)[..., 0]
        return x


# ---------------------------------------------------------------------------
# Multivariate T — reference distributions/mvt.cpp
# ---------------------------------------------------------------------------
class mvt:
    @staticmethod
    def logpdf(x, mean, sigma, df, chol=None):
        if chol is None:
            chol = jnp.linalg.cholesky(sigma)
        d = x.shape[-1]
        z = _solve_tri_lower(chol, (x - mean)[..., None])[..., 0]
        maha = jnp.sum(z * z, axis=-1)
        h = 0.5 * (df + d)
        return (
            jsp.gammaln(h)
            - jsp.gammaln(0.5 * df)
            - 0.5 * d * jnp.log(df * math.pi)
            - 0.5 * log_det_from_chol(chol)
            - h * jnp.log1p(maha / df)
        )

    @staticmethod
    def sample(key, mean, sigma, df, chol=None, shape=None):
        if chol is None:
            chol = jnp.linalg.cholesky(sigma)
        k1, k2 = jax.random.split(key)
        g = mvn.sample(k1, jnp.zeros_like(jnp.asarray(mean)), chol=chol,
                       shape=shape)
        w = jax.random.gamma(k2, 0.5 * jnp.asarray(df, g.dtype),
                             g.shape[:-1]) / (0.5 * df)
        return mean + g / jnp.sqrt(w)[..., None]


# ---------------------------------------------------------------------------
# Dirichlet — reference distributions/dirichlet.cpp
# ---------------------------------------------------------------------------
class dirichlet:
    @staticmethod
    def logpdf(x, alpha):
        return (
            jnp.sum((alpha - 1.0) * jnp.log(x), axis=-1)
            + jsp.gammaln(jnp.sum(alpha, axis=-1))
            - jnp.sum(jsp.gammaln(alpha), axis=-1)
        )

    @staticmethod
    def sample(key, alpha, shape=None):
        alpha = jnp.asarray(alpha)
        fs = alpha.shape if shape is None else tuple(shape) + alpha.shape
        g = jax.random.gamma(key, jnp.broadcast_to(alpha, fs), fs)
        return g / jnp.sum(g, axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# Wishart / inverse Wishart — reference distributions/Wishart.cpp
# ---------------------------------------------------------------------------
def lmultigamma(a, d: int):
    """Log multivariate gamma (reference math/lmultigamma.cpp)."""
    dt = jnp.result_type(a)
    if not jnp.issubdtype(dt, jnp.floating):
        dt = jnp.result_type(float)
    j = jnp.arange(d, dtype=dt)
    return (
        0.25 * d * (d - 1) * math.log(math.pi)
        + jnp.sum(jsp.gammaln(jnp.asarray(a)[..., None] - 0.5 * j), axis=-1)
    )


class wishart:
    """W(df, S) with mean df*S (scale parameterization)."""

    @staticmethod
    def logpdf(w, df, scale, scale_chol=None):
        d = w.shape[-1]
        if scale_chol is None:
            scale_chol = jnp.linalg.cholesky(scale)
        w_chol = jnp.linalg.cholesky(w)
        # tr(S^-1 W): solve L z = W columns
        z = _cho_solve_bc(scale_chol, w)
        trace = jnp.trace(z, axis1=-2, axis2=-1)
        return (
            0.5 * (df - d - 1.0) * log_det_from_chol(w_chol)
            - 0.5 * trace
            - 0.5 * df * d * math.log(2.0)
            - 0.5 * df * log_det_from_chol(scale_chol)
            - lmultigamma(0.5 * df, d)
        )

    @staticmethod
    def sample(key, df, scale=None, scale_chol=None, shape=None):
        """Bartlett decomposition: W = L A A^T L^T with A lower triangular,
        diag A_ii ~ sqrt(chisq(df-i)), offdiag ~ N(0,1)."""
        if scale_chol is None:
            scale_chol = jnp.linalg.cholesky(scale)
        d = scale_chol.shape[-1]
        fs = scale_chol.shape[:-2] if shape is None else tuple(shape) + scale_chol.shape[:-2]
        k1, k2 = jax.random.split(key)
        dtype = scale_chol.dtype
        i = jnp.arange(d, dtype=dtype)
        df_arr = jnp.asarray(df, dtype)
        c = jax.random.gamma(
            k2, jnp.broadcast_to(0.5 * (df_arr[..., None] - i), fs + (d,)),
            fs + (d,)) * 2.0
        n = jax.random.normal(k1, fs + (d, d), dtype)
        a = jnp.tril(n, -1) + jnp.sqrt(c)[..., :, None] * jnp.eye(d, dtype=dtype)
        la = jnp.einsum("...ij,...jk->...ik", scale_chol, a)
        return jnp.einsum("...ik,...jk->...ij", la, la)


class inverse_wishart:
    """IW(df, S): X^-1 ~ W(df, S^-1). Conjugate prior for MVN covariance
    (reference Models/PosteriorSamplers/MvnVarSampler)."""

    @staticmethod
    def logpdf(x, df, scale):
        d = x.shape[-1]
        scale_chol = jnp.linalg.cholesky(scale)
        x_chol = jnp.linalg.cholesky(x)
        z = _cho_solve_bc(x_chol, jnp.broadcast_to(
            scale, x_chol.shape[:-2] + jnp.shape(scale)[-2:]))
        trace = jnp.trace(z, axis1=-2, axis2=-1)
        return (
            0.5 * df * log_det_from_chol(scale_chol)
            - 0.5 * (df + d + 1.0) * log_det_from_chol(x_chol)
            - 0.5 * trace
            - 0.5 * df * d * math.log(2.0)
            - lmultigamma(0.5 * df, d)
        )

    @staticmethod
    def sample(key, df, scale, shape=None):
        prec_scale = jnp.linalg.inv(scale)
        w = wishart.sample(key, df, prec_scale, shape=shape)
        return jnp.linalg.inv(w)


# ---------------------------------------------------------------------------
# Matrix normal — reference distributions/matrix_normal.cpp
# ---------------------------------------------------------------------------
class matrix_normal:
    """MN(M, U, V): vec(X) ~ N(vec(M), V kron U). U is row covariance
    (r x r), V column covariance (c x c)."""

    @staticmethod
    def logpdf(x, mean, row_cov, col_cov):
        r, c = x.shape[-2], x.shape[-1]
        lu = jnp.linalg.cholesky(row_cov)
        lv = jnp.linalg.cholesky(col_cov)
        z = _solve_tri_lower(lu, x - mean)
        z = jnp.swapaxes(
            _solve_tri_lower(lv, jnp.swapaxes(z, -1, -2)), -1, -2)
        maha = jnp.sum(z * z, axis=(-2, -1))
        return -0.5 * (
            r * c * _LOG_2PI
            + c * log_det_from_chol(lu)
            + r * log_det_from_chol(lv)
            + maha
        )

    @staticmethod
    def sample(key, mean, row_cov, col_cov, shape=None):
        mean = jnp.asarray(mean)
        lu = jnp.linalg.cholesky(row_cov)
        lv = jnp.linalg.cholesky(col_cov)
        fs = mean.shape if shape is None else tuple(shape) + mean.shape
        z = jax.random.normal(key, fs, mean.dtype)
        return mean + jnp.einsum("...ij,...jk,...lk->...il", lu, z, lv)


class lkj:
    """LKJ distribution over correlation matrices.

    The reference's UniformCorrelationModel / MarginallyUniformCorrelation
    (Models/UniformCorrelationModel.hpp): LKJ(eta=1) IS the uniform
    distribution over correlation matrices, and larger eta concentrates
    toward identity (the marginally-uniform prior corresponds to a
    specific eta per dimension). Sampling by the onion method (Lewandowski,
    Kurowicka, Joe 2009) with fixed-shape loops."""

    @staticmethod
    def logpdf(corr, eta, d=None):
        d = corr.shape[-1]
        chol = jnp.linalg.cholesky(corr)
        logdet = 2.0 * jnp.sum(
            jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1)), -1)
        # unnormalized: det(C)^(eta-1)
        return (eta - 1.0) * logdet

    @staticmethod
    def sample(key, eta, d, shape=None):
        """Onion method: build the Cholesky factor row by row."""
        shape = tuple(shape or ())
        beta0 = eta + 0.5 * (d - 2)
        k_r, k_u = jax.random.split(key)
        # partial correlations via beta draws, mapped to (-1, 1)
        chol = jnp.zeros(shape + (d, d)).at[..., 0, 0].set(1.0)
        for i in range(1, d):
            k_r, k1, k2 = jax.random.split(k_r, 3)
            bshape = shape
            b = eta + 0.5 * (d - 1 - i)
            y = jax.random.beta(k1, i / 2.0, b, bshape)
            r = jnp.sqrt(y)
            u = jax.random.normal(k2, bshape + (i,))
            u = u / jnp.linalg.norm(u, axis=-1, keepdims=True)
            w = r[..., None] * u
            chol = chol.at[..., i, :i].set(w)
            chol = chol.at[..., i, i].set(
                jnp.sqrt(jnp.clip(1.0 - y, 1e-12, None)))
        return chol @ jnp.swapaxes(chol, -1, -2)
