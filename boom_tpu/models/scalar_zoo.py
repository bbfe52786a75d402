"""Scalar/matrix model-zoo stragglers: Lognormal, TruncatedGamma,
UniformShrinkage, ProductDirichlet, Mvt, MatrixNormal.

Reference: Models/LognormalModel.hpp:33, Models/TruncatedGammaModel.hpp:29,
Models/UniformShrinkagePriorModel.hpp:36 (Christiansen-Morris 1997),
Models/ProductDirichletModel.hpp:47, Models/MvtModel.hpp:37 (latent-weight
EM via ScaledChisqModel), Models/MatrixNormalModel.hpp.

TPU form: each model is a frozen dataclass of data + hyperparameters with
pure-functional `kernel()` sweeps (conjugate / slice) or `mle()` drivers
built on numopt; everything vectorizes over chains with vmap and over
observations with fixed-shape reductions.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from boom_tpu import dists
from boom_tpu.inference.kernels.slice import slice_step


# ---------------------------------------------------------------------------
# Lognormal (reference Models/LognormalModel.hpp:33)
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class Lognormal:
    """y > 0 with log y ~ N(mu, sigsq); conjugate normal-inverse-chisq
    prior on (mu, sigsq) so the Gibbs sweep is exact (the reference pairs
    LognormalModel with GaussianConjSampler on the logs). State: mu,
    sigsq."""

    y: jax.Array  # [n] positive
    mean_guess: float = 0.0
    mean_nobs: float = 0.01
    sigma_df: float = 1.0
    sigma_guess: float = 1.0

    def init_state(self, key):
        ly = jnp.log(self.y)
        return {"mu": jnp.mean(ly),
                "sigsq": jnp.maximum(jnp.var(ly), 1e-3)}

    def kernel(self):
        ly = jnp.log(self.y)
        n = self.y.shape[0]
        sum_l, sumsq_l = jnp.sum(ly), jnp.sum(ly * ly)

        def sweep(key, state):
            km, ks = jax.random.split(key)
            # mu | sigsq
            prec = (self.mean_nobs + n) / state["sigsq"]
            mean = ((self.mean_nobs * self.mean_guess + sum_l)
                    / (self.mean_nobs + n))
            mu = mean + jax.random.normal(km, dtype=ly.dtype) / jnp.sqrt(prec)
            # sigsq | mu  (inverse-chisq)
            ss = (sumsq_l - 2.0 * mu * sum_l + n * mu * mu
                  + self.sigma_df * self.sigma_guess ** 2)
            df = self.sigma_df + n
            sigsq = ss / (2.0 * dists.gamma.sample(ks, df / 2.0, 1.0))
            return {"mu": mu, "sigsq": sigsq}

        return sweep

    @staticmethod
    def logpdf(y, mu, sigsq):
        ly = jnp.log(y)
        return (-0.5 * (math.log(2.0 * math.pi) + jnp.log(sigsq))
                - 0.5 * (ly - mu) ** 2 / sigsq - ly)

    @staticmethod
    def mean(mu, sigsq):
        return jnp.exp(mu + 0.5 * sigsq)

    @staticmethod
    def variance(mu, sigsq):
        m = jnp.exp(mu + 0.5 * sigsq)
        return (jnp.exp(sigsq) - 1.0) * m * m

    @staticmethod
    def simulate(key, n, mu, sigma):
        return jnp.exp(mu + sigma * jax.random.normal(key, (n,)))


# ---------------------------------------------------------------------------
# Truncated Gamma (reference Models/TruncatedGammaModel.hpp:29 — "not a
# fully fledged model": density + simulation only)
# ---------------------------------------------------------------------------
class TruncatedGamma:
    """Gamma(a, b) restricted to [lo, hi], matching the reference's
    log-normalizing-constant semantics."""

    def __init__(self, a, b, lo=0.0, hi=jnp.inf):
        self.a, self.b, self.lo, self.hi = a, b, lo, hi
        plo = dists.gamma.cdf(jnp.asarray(lo), a, b) if lo > 0 else 0.0
        phi = dists.gamma.cdf(jnp.asarray(hi), a, b) if jnp.isfinite(
            hi) else 1.0
        self._lognc = jnp.log(phi - plo)

    def logp(self, x):
        inside = (x >= self.lo) & (x <= self.hi)
        return jnp.where(inside,
                         dists.gamma.logpdf(x, self.a, self.b) - self._lognc,
                         -jnp.inf)

    def dlogp(self, x):
        return (self.a - 1.0) / x - self.b

    def sim(self, key, shape=None):
        return dists.trun_gamma.sample(key, self.a, self.b, lo=self.lo,
                                       hi=self.hi, shape=shape)


# ---------------------------------------------------------------------------
# Uniform shrinkage prior (reference UniformShrinkagePriorModel.hpp:36)
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class UniformShrinkage:
    """f(x | z0) = z0 / (z0 + x)^2 on x > 0 (z0 = median). Reference is a
    NumOptModel (loglike + derivatives); here loglike is closed-form and
    `mle` solves the score equation, while `kernel` gives a slice-Gibbs
    posterior over log z0 under a flat-on-log prior."""

    y: jax.Array  # [n] positive

    @staticmethod
    def loglike(z0, y):
        return y.shape[0] * jnp.log(z0) - 2.0 * jnp.sum(jnp.log(z0 + y))

    def mle(self, lo=None, hi=None, iters=60):
        """Golden-section/bisection on the scalar score in log space."""
        y = self.y
        lo = jnp.log(jnp.min(y) * 1e-3) if lo is None else jnp.log(lo)
        hi = jnp.log(jnp.max(y) * 1e3) if hi is None else jnp.log(hi)
        score = jax.grad(lambda lz: self.loglike(jnp.exp(lz), y))

        def body(bounds, _):
            a, b = bounds
            m = 0.5 * (a + b)
            up = score(m) > 0
            return (jnp.where(up, m, a), jnp.where(up, b, m)), None

        (a, b), _ = jax.lax.scan(body, (lo, hi), None, length=iters)
        return jnp.exp(0.5 * (a + b))

    def init_state(self, key):
        return {"z0": jnp.median(self.y)}

    def kernel(self, width=1.0):
        y = self.y

        def sweep(key, state):
            def logpost(lz):
                return self.loglike(jnp.exp(lz), y)

            lz = slice_step(key, jnp.log(state["z0"]), logpost,
                                     width=width)
            return {"z0": jnp.exp(lz)}

        return sweep

    @staticmethod
    def simulate(key, n, z0):
        u = jax.random.uniform(key, (n,))
        return z0 * u / (1.0 - u)


# ---------------------------------------------------------------------------
# Product Dirichlet (reference ProductDirichletModel.hpp:47)
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class ProductDirichlet:
    """Data are stochastic matrices Pi (each row a probability vector);
    rows independent Dirichlet(Nu[i]). Sufficient statistic: sum of log Pi
    (reference ProductDirichletSuf). `loglike`/`dloglike` in the stacked
    Nu parametrization; `mle` by BFGS on log Nu; `kernel` slice-Gibbs over
    log Nu entries under a flat-on-log prior."""

    pi: jax.Array  # [n, k, k] stack of observed stochastic matrices

    @property
    def sumlog(self):
        return jnp.sum(jnp.log(self.pi), axis=0)  # [k, k]

    @property
    def n(self):
        return self.pi.shape[0]

    @staticmethod
    def _loglike(nu, sumlog, n):
        """nu: [k, k] positive."""
        row = (jax.scipy.special.gammaln(jnp.sum(nu, axis=1))
               - jnp.sum(jax.scipy.special.gammaln(nu), axis=1))
        return n * jnp.sum(row) + jnp.sum((nu - 1.0) * sumlog)

    def loglike(self, nu):
        return self._loglike(nu, self.sumlog, self.n)

    def dloglike(self, nu):
        return jax.grad(self.loglike)(nu)

    def mle(self, nu0=None):
        from boom_tpu.numopt import bfgs

        k = self.pi.shape[1]
        x0 = jnp.zeros((k * k,)) if nu0 is None else jnp.log(nu0).ravel()
        sl, n = self.sumlog, self.n

        def neg(lognu):
            return -self._loglike(jnp.exp(lognu).reshape(k, k), sl, n)

        res = bfgs(neg, x0)
        return jnp.exp(res.x).reshape(k, k)

    def init_state(self, key):
        k = self.pi.shape[1]
        return {"nu": jnp.ones((k, k), self.pi.dtype)}

    def kernel(self, width=1.0):
        sl, n = self.sumlog, self.n
        k = self.pi.shape[1]

        def sweep(key, state):
            lognu = jnp.log(state["nu"]).ravel()

            def upd(carry, inp):
                lognu_flat, = carry
                i, ki = inp

                def logpost(v):
                    cand = lognu_flat.at[i].set(v)
                    return (self._loglike(jnp.exp(cand).reshape(k, k), sl, n)
                            )

                v = slice_step(ki, lognu_flat[i], logpost,
                                        width=width)
                return (lognu_flat.at[i].set(v),), None

            keys = jax.random.split(key, k * k)
            idx = jnp.arange(k * k)
            (lognu,), _ = jax.lax.scan(upd, (lognu,), (idx, keys))
            return {"nu": jnp.exp(lognu).reshape(k, k)}

        return sweep

    @staticmethod
    def simulate(key, n, nu):
        """Draw n stochastic matrices with independent Dirichlet rows."""
        k = nu.shape[0]
        a = jnp.broadcast_to(nu, (n, k, k))
        g = dists.gamma.sample(key, a, 1.0)
        return g / jnp.sum(g, axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# Multivariate T (reference MvtModel.hpp:37)
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class Mvt:
    """y_i ~ t_nu(mu, Sigma). `em` runs the latent-scaled-chisq EM the
    reference implements via its weighted MVN suf (MvtModel.cpp mle):
    w_i = (nu + p) / (nu + d_i); nu is profiled on a grid/Brent. `kernel`
    is a DA Gibbs: draw latent weights ~ Gamma, then conjugate
    (mu, Sigma) | w, then slice nu."""

    y: jax.Array  # [n, p]
    mu0_nobs: float = 0.0
    sigma_df: float = 0.0
    nu_lo: float = 2.1
    nu_hi: float = 200.0

    def em(self, iters=100, fit_nu=True):
        y = self.y
        n, p = y.shape
        from boom_tpu.numopt import brent_minimize

        def estep_mstep(carry, _):
            mu, sigma, nu = carry
            diff = y - mu
            sol = jnp.linalg.solve(sigma, diff.T).T
            d = jnp.sum(diff * sol, axis=1)
            w = (nu + p) / (nu + d)
            mu_new = jnp.sum(w[:, None] * y, axis=0) / jnp.sum(w)
            diff = y - mu_new
            sigma_new = (w[:, None, None] * diff[:, :, None]
                         * diff[:, None, :]).sum(0) / n

            if fit_nu:
                # profile nu on the exact t log likelihood
                def neg_ll(nu_c):
                    return -jnp.sum(dists.mvt.logpdf(
                        y, mu_new, sigma_new, nu_c))

                nu_new = brent_minimize(neg_ll, self.nu_lo, self.nu_hi).x
            else:
                nu_new = nu
            return (mu_new, sigma_new, nu_new), None

        mu0 = jnp.mean(y, axis=0)
        sigma0 = jnp.cov(y.T) + 1e-6 * jnp.eye(p, dtype=y.dtype)
        (mu, sigma, nu), _ = jax.lax.scan(
            estep_mstep, (mu0, sigma0, jnp.asarray(30.0, y.dtype)), None,
            length=iters)
        return {"mu": mu, "sigma": sigma, "nu": nu}

    def loglike(self, mu, sigma, nu):
        return jnp.sum(dists.mvt.logpdf(self.y, mu, sigma, nu))

    def init_state(self, key):
        p = self.y.shape[1]
        return {"mu": jnp.mean(self.y, axis=0),
                "sigma": jnp.cov(self.y.T) + 1e-6 * jnp.eye(
                    p, dtype=self.y.dtype),
                "nu": jnp.asarray(30.0, self.y.dtype)}

    def kernel(self):
        y = self.y
        n, p = y.shape

        def sweep(key, state):
            kw, km, ks, kn = jax.random.split(key, 4)
            mu, sigma, nu = state["mu"], state["sigma"], state["nu"]
            diff = y - mu
            sol = jnp.linalg.solve(sigma, diff.T).T
            d = jnp.sum(diff * sol, axis=1)
            # w_i | rest ~ Gamma((nu + p)/2, (nu + d_i)/2)
            w = dists.gamma.sample(kw, (nu + p) / 2.0, (nu + d) / 2.0)
            sw = jnp.sum(w)
            ybar = jnp.sum(w[:, None] * y, axis=0) / sw
            # mu | w, Sigma ~ N(ybar, Sigma / sum w)
            mu = dists.mvn.sample(km, ybar, sigma / sw)
            diff = y - mu
            ss = (w[:, None, None] * diff[:, :, None] * diff[:, None, :]
                  ).sum(0) + self.sigma_df * jnp.eye(p, dtype=y.dtype)
            sigma = dists.inverse_wishart.sample(
                ks, self.sigma_df + n, ss)

            def log_nu_post(lnu):
                nu_c = jnp.exp(lnu)
                # p(w | nu) = prod Gamma(w; nu/2, nu/2)
                return jnp.sum(dists.gamma.logpdf(w, nu_c / 2.0, nu_c / 2.0))

            lnu = slice_step(kn, jnp.log(nu), log_nu_post, width=0.5)
            nu = jnp.clip(jnp.exp(lnu), self.nu_lo, self.nu_hi)
            return {"mu": mu, "sigma": sigma, "nu": nu}

        return sweep

    @staticmethod
    def simulate(key, n, mu, sigma, nu):
        return dists.mvt.sample(key, mu, sigma, nu, shape=(n,))


# ---------------------------------------------------------------------------
# Matrix Normal (reference Models/MatrixNormalModel.hpp)
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class MatrixNormal:
    """Y_i ~ MN(M, U, V) (row covariance U [r, r], column covariance V
    [c, c]). `mle` is the flip-flop algorithm (alternating closed-form
    row/column covariance updates — the matrix-normal analog of the
    reference's mle()); identification fixes V[0, 0] = 1."""

    y: jax.Array  # [n, r, c]

    def mle(self, iters=50):
        y = self.y
        n, r, c = y.shape
        m = jnp.mean(y, axis=0)
        diff = y - m

        def step(carry, _):
            u, v = carry
            vinv = jnp.linalg.inv(v)
            u_new = jnp.einsum("nij,jk,nlk->il", diff, vinv, diff) / (n * c)
            uinv = jnp.linalg.inv(u_new)
            v_new = jnp.einsum("nji,jk,nkl->il", diff, uinv, diff) / (n * r)
            scale = v_new[0, 0]
            return (u_new * scale, v_new / scale), None

        u0 = jnp.eye(r, dtype=y.dtype)
        v0 = jnp.eye(c, dtype=y.dtype)
        (u, v), _ = jax.lax.scan(step, (u0, v0), None, length=iters)
        return {"mean": m, "row_cov": u, "col_cov": v}

    def loglike(self, mean, row_cov, col_cov):
        return jnp.sum(dists.matrix_normal.logpdf(
            self.y, mean, row_cov, col_cov))

    @staticmethod
    def simulate(key, n, mean, row_cov, col_cov):
        return dists.matrix_normal.sample(key, mean, row_cov, col_cov,
                                          shape=(n,))


@dataclasses.dataclass(frozen=True)
class GaussianGivenSigma:
    """N(mu0, sigma^2 / kappa) with sigma^2 owned elsewhere — the
    conjugate prior for a Gaussian mean conditional on its variance
    (reference Models/GaussianModelGivenSigma.hpp:36: mu0 + kappa
    'sample size' scaling an external sigma^2). Functional form: pass
    the current sigma^2 in; the conjugate update of (mu0, kappa) given
    draws of the child mean is a Gaussian-suf weighted average."""

    mean: float = 0.0
    sample_size: float = 1.0  # kappa

    def variance(self, sigsq):
        return sigsq / self.sample_size

    def logpdf(self, x, sigsq):
        v = self.variance(sigsq)
        return -0.5 * (jnp.log(2.0 * jnp.pi * v)
                       + (x - self.mean) ** 2 / v)

    def sample(self, key, sigsq, shape=None):
        v = self.variance(sigsq)
        shp = shape if shape is not None else jnp.shape(
            jnp.asarray(sigsq))
        return self.mean + jnp.sqrt(v) * jax.random.normal(
            key, shp, jnp.result_type(float))

    def posterior_mean_draw(self, key, suf_n, suf_sum, sigsq):
        """Conjugate draw of the child mean mu | data, sigma^2 with
        THIS model as its prior: the standard N(mu0, sigsq/kappa) x
        N-likelihood update."""
        prec = (self.sample_size + suf_n) / sigsq
        mean = (self.sample_size * self.mean + suf_sum) / (
            self.sample_size + suf_n)
        return mean + jax.random.normal(
            key, jnp.shape(mean), jnp.result_type(float)) / jnp.sqrt(
                prec)


@dataclasses.dataclass(frozen=True)
class ExponentialIncrement:
    """A vector of increasing values: x_1 ~ Exp(lambda_1), increments
    x_i - x_{i-1} ~ Exp(lambda_i) independently (reference
    Models/ExponentialIncrementModel.hpp:36). Gibbs: each rate gets a
    conjugate Gamma(a, b) update from its observed increments."""

    x: jax.Array  # [n, d] increasing rows
    prior_shape: float = 1.0
    prior_rate: float = 1.0

    @property
    def _increments(self):
        return jnp.diff(self.x, axis=-1, prepend=0.0)  # [n, d]

    def loglik(self, rates):
        inc = self._increments
        return jnp.sum(jnp.log(rates)[None, :] * 1.0
                       - rates[None, :] * inc)

    def init_state(self, key):
        inc_mean = jnp.maximum(jnp.mean(self._increments, axis=0), 1e-8)
        return {"rates": 1.0 / inc_mean}

    def kernel(self):
        inc_sum = jnp.sum(self._increments, axis=0)
        n = self.x.shape[0]
        d = self.x.shape[1]

        def sweep(key, state):
            rates = dists.gamma.sample(
                key, self.prior_shape + n,
                self.prior_rate + inc_sum)
            return {"rates": rates}

        return sweep

    def simulate(self, key, n, rates):
        rates = jnp.asarray(rates)
        inc = dists.exponential.sample(
            key, rates[None, :], shape=(n, rates.shape[0]))
        return jnp.cumsum(inc, axis=-1)
