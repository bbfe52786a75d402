"""MVN straggler models: weighted, low-rank, and composite components.

Reference: Models/WeightedMvnModel.hpp (WeightedMvnSuf :32,
WeightedMvnModel :70), Models/LowRankMvnModel.hpp:45,
Models/CompositeModel.hpp:36 (mixture component over CompositeData —
tuples of mixed-type observations).

TPU form: sufficient statistics are weighted GEMMs ([n,p] matmuls on
the MXU); conjugate Normal-Inverse-Wishart Gibbs draws are batched
linear algebra; the composite mixture shares one cluster indicator
across per-column families, so responsibilities are a single [n, K]
logsumexp and every family's sufstats come from the same one-hot
matmul.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from boom_tpu.dists import multivariate as mv
from boom_tpu.dists import continuous as dists


@dataclasses.dataclass(frozen=True)
class WeightedMvnModel:
    """y_i ~ N(mu, Sigma / w_i) with Normal-Inverse-Wishart prior
    (reference WeightedMvnModel.hpp:70; its sufstats sum/sumsq/n/sumw
    are the weighted GEMMs below).

    State: mu [p], sigma [p, p].
    """

    y: jax.Array  # [n, p]
    w: jax.Array  # [n] positive weights
    mu0: jax.Array | None = None  # prior mean
    kappa: float = 1.0            # prior mean sample size
    nu: float | None = None       # IW df (default p + 2)
    psi: jax.Array | None = None  # IW scale (default I)

    def _prior(self):
        p = self.y.shape[1]
        mu0 = jnp.zeros(p) if self.mu0 is None else self.mu0
        nu = float(p + 2) if self.nu is None else self.nu
        psi = jnp.eye(p) if self.psi is None else self.psi
        return mu0, nu, psi

    def suf(self):
        """(sum_w_y [p], sum_w_yyT [p,p], n, sumw, sumlogw) — the
        WeightedMvnSuf quantities."""
        wy = self.w[:, None] * self.y
        return (jnp.sum(wy, 0), self.y.T @ wy,
                jnp.asarray(self.y.shape[0], self.y.dtype),
                jnp.sum(self.w), jnp.sum(jnp.log(self.w)))

    def ybar(self):
        s, _, _, sumw, _ = self.suf()
        return s / sumw

    def loglik(self, mu, sigma):
        """Sum over observations of N(y_i; mu, Sigma/w_i)."""
        p = self.y.shape[1]
        chol = jnp.linalg.cholesky(sigma)
        d = self.y - mu
        z = jax.scipy.linalg.solve_triangular(chol, d.T, lower=True)
        quad = jnp.sum(z * z, 0) * self.w
        ld = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol)))
        return jnp.sum(-0.5 * (quad + p * jnp.log(2 * jnp.pi) + ld
                               - p * jnp.log(self.w)))

    def init_state(self, key):
        return {"mu": self.ybar(),
                "sigma": jnp.eye(self.y.shape[1], dtype=self.y.dtype)}

    def kernel(self):
        mu0, nu, psi = self._prior()

        def sweep(key, state):
            k1, k2 = jax.random.split(key)
            s, syy, n, sumw, _ = self.suf()
            # Sigma | y: IW(nu + n, psi + sum_i w_i (y_i-mu)(y_i-mu)' +
            #            kappa (mu - mu0)(mu - mu0)')
            mu = state["mu"]
            center = (syy - jnp.outer(s, mu) - jnp.outer(mu, s)
                      + sumw * jnp.outer(mu, mu))
            dmu = mu - mu0
            scale = psi + center + self.kappa * jnp.outer(dmu, dmu)
            sigma = mv.inverse_wishart.sample(k1, nu + n + 1.0, scale)
            # mu | Sigma, y: N((kappa mu0 + sum w y)/(kappa + sumw),
            #                  Sigma/(kappa + sumw))
            denom = self.kappa + sumw
            mean = (self.kappa * mu0 + s) / denom
            chol = jnp.linalg.cholesky(sigma / denom)
            z = jax.random.normal(k2, mean.shape, mean.dtype)
            return {"mu": mean + chol @ z, "sigma": sigma}

        return sweep

    @staticmethod
    def simulate(key, n, mu, sigma, w=None):
        p = mu.shape[0]
        kw, ky = jax.random.split(key)
        if w is None:
            w = jnp.exp(jax.random.normal(kw, (n,)) * 0.3)
        chol = jnp.linalg.cholesky(sigma)
        z = jax.random.normal(ky, (n, p))
        y = mu + (z @ chol.T) / jnp.sqrt(w)[:, None]
        return y, w


@dataclasses.dataclass(frozen=True)
class LowRankMvn:
    """Degenerate MVN y = mu + A z, z ~ N(0, I_m), m <= p (reference
    LowRankMvnModel.hpp:45). Built from a PSD Sigma by truncated
    eigendecomposition; has no full-space density (matches the
    reference), but supports simulation, the subspace density, and
    projections."""

    mu: jax.Array      # [p]
    a: jax.Array       # [p, m] factor loadings, Sigma = A A'

    @staticmethod
    def from_covariance(mu, sigma, rank=None, tol=1e-10):
        """Keep eigenpairs above tol (or exactly `rank` of them)."""
        evals, evecs = jnp.linalg.eigh(sigma)
        order = jnp.argsort(evals)[::-1]
        evals, evecs = evals[order], evecs[:, order]
        if rank is None:
            rank = int(jnp.sum(evals > tol))
        a = evecs[:, :rank] * jnp.sqrt(jnp.clip(evals[:rank], 0.0))
        return LowRankMvn(mu=jnp.asarray(mu), a=a)

    @property
    def rank(self):
        return self.a.shape[1]

    def variance(self):
        return self.a @ self.a.T

    def sim(self, key, shape=()):
        z = jax.random.normal(key, (*shape, self.a.shape[1]),
                              self.mu.dtype)
        return self.mu + z @ self.a.T

    def project(self, y):
        """Least-squares coordinates z of y - mu in the column space
        of A (exact when y lies in the support)."""
        r = y - self.mu
        return jnp.linalg.lstsq(self.a, r.T)[0].T

    def subspace_logpdf(self, y):
        """Density of the coordinates z = project(y) under N(0, I),
        -inf off-support: the 'density on linear transformations to
        the full-rank space' of the reference's comments."""
        z = self.project(y)
        recon = self.mu + z @ self.a.T
        off = jnp.sum((y - recon) ** 2, -1) > 1e-8 * (
            1.0 + jnp.sum(y * y, -1))
        m = self.a.shape[1]
        logp = (-0.5 * jnp.sum(z * z, -1)
                - 0.5 * m * jnp.log(2 * jnp.pi))
        return jnp.where(off, -jnp.inf, logp)


@dataclasses.dataclass(frozen=True)
class CompositeMixture:
    """Finite mixture over composite (mixed-type) observations: each
    row is (numeric [d_num], categorical codes [d_cat], counts
    [d_pois]); one shared cluster indicator ties the per-column
    component models together (reference CompositeModel.hpp:36 as a
    MixtureComponent over CompositeData, used by the BoomMix
    create_mixture_component machinery).

    Per column family, conditionally conjugate draws:
      numeric    ~ N(mu_kj, sigsq_kj)      (normal-inv-chisq prior)
      categorical ~ Cat(theta_kj)          (Dirichlet prior)
      counts     ~ Poisson(lambda_kj)      (Gamma prior)

    State: weights [K], mu/sigsq [K, d_num], theta [K, d_cat, L],
    lam [K, d_pois], z [n].
    """

    numeric: jax.Array | None      # [n, d_num] or None
    categorical: jax.Array | None  # [n, d_cat] int codes or None
    counts: jax.Array | None       # [n, d_pois] or None
    num_levels: int = 2            # shared level count for categoricals
    num_components: int = 2
    alpha: float = 1.0             # Dirichlet weight prior
    mu_sd: float = 10.0            # N(0, mu_sd^2) prior on mu
    sigsq_df: float = 1.0
    sigsq_guess: float = 1.0
    theta_alpha: float = 1.0
    lam_a: float = 1.0
    lam_b: float = 1.0

    def _n(self):
        for block in (self.numeric, self.categorical, self.counts):
            if block is not None:
                return block.shape[0]
        raise ValueError("no data blocks")

    def init_state(self, key):
        k = self.num_components
        kz, km = jax.random.split(key)
        n = self._n()
        state = {"z": jax.random.randint(kz, (n,), 0, k),
                 "weights": jnp.full((k,), 1.0 / k)}
        if self.numeric is not None:
            d = self.numeric.shape[1]
            noise = jax.random.normal(km, (k, d))
            state["mu"] = jnp.mean(self.numeric, 0) + noise
            state["sigsq"] = jnp.ones((k, d)) * jnp.var(self.numeric, 0)
        if self.categorical is not None:
            d = self.categorical.shape[1]
            state["theta"] = jnp.full((k, d, self.num_levels),
                                      1.0 / self.num_levels)
        if self.counts is not None:
            d = self.counts.shape[1]
            state["lam"] = jnp.maximum(
                jnp.mean(self.counts, 0), 0.1) * jnp.ones((k, d))
        return state

    def _log_lik_matrix(self, state):
        """[n, K] composite log likelihood — the CompositeModel::pdf
        sum over components."""
        n = self._n()
        total = jnp.zeros((n, self.num_components))
        if self.numeric is not None:
            x = self.numeric  # [n, d]
            mu, s2 = state["mu"], state["sigsq"]  # [K, d]
            ll = (-0.5 * (x[:, None, :] - mu[None]) ** 2 / s2[None]
                  - 0.5 * jnp.log(2 * jnp.pi * s2)[None])
            total = total + jnp.sum(ll, -1)
        if self.categorical is not None:
            c_onehot = jax.nn.one_hot(
                self.categorical, self.num_levels)  # [n, d, L]
            logth = jnp.log(jnp.clip(state["theta"], 1e-12, None))
            total = total + jnp.einsum("ndl,kdl->nk", c_onehot, logth)
        if self.counts is not None:
            y = self.counts
            lam = state["lam"]
            ll = (y[:, None, :] * jnp.log(lam)[None] - lam[None]
                  - jax.scipy.special.gammaln(y + 1.0)[:, None, :])
            total = total + jnp.sum(ll, -1)
        return total

    def log_lik(self, state):
        ll = self._log_lik_matrix(state)
        return jnp.sum(jax.scipy.special.logsumexp(
            ll + jnp.log(jnp.clip(state["weights"], 1e-12, None)),
            axis=1))

    def kernel(self):
        k = self.num_components

        def sweep(key, state):
            keys = jax.random.split(key, 6)
            # 1. indicators
            logw = jnp.log(jnp.clip(state["weights"], 1e-12, None))
            z = jax.random.categorical(
                keys[0], self._log_lik_matrix(state) + logw, axis=1)
            one_hot = jax.nn.one_hot(z, k)  # [n, K]
            nk = jnp.sum(one_hot, 0)
            # 2. weights
            weights = mv.dirichlet.sample(keys[1], self.alpha + nk)
            new = {"z": z, "weights": weights}
            # 3. numeric columns: conjugate normal-inv-chisq per (k, d)
            if self.numeric is not None:
                x = self.numeric
                sx = one_hot.T @ x            # [K, d]
                sxx = one_hot.T @ (x * x)
                # sigsq | mu: centered at the CURRENT mu (exact Gibbs)
                mu_cur = state["mu"]
                ss = sxx - 2.0 * mu_cur * sx + nk[:, None] * mu_cur**2
                df = self.sigsq_df + nk[:, None]
                scale = (self.sigsq_df * self.sigsq_guess + ss) / df
                sigsq = dists.scaled_inv_chisq.sample(
                    keys[2], df, jnp.maximum(scale, 1e-12))
                prec = nk[:, None] / sigsq + 1.0 / self.mu_sd**2
                mean = (sx / sigsq) / prec
                mu = mean + jax.random.normal(
                    keys[3], mean.shape) / jnp.sqrt(prec)
                new["mu"], new["sigsq"] = mu, sigsq
            # 4. categorical columns: Dirichlet per (k, d)
            if self.categorical is not None:
                c_onehot = jax.nn.one_hot(
                    self.categorical, self.num_levels)  # [n, d, L]
                counts = jnp.einsum("nk,ndl->kdl", one_hot, c_onehot)
                theta = mv.dirichlet.sample(
                    keys[4], self.theta_alpha + counts)
                new["theta"] = theta
            # 5. count columns: Gamma per (k, d)
            if self.counts is not None:
                sy = one_hot.T @ self.counts  # [K, d]
                lam = dists.gamma.sample(
                    keys[5], self.lam_a + sy,
                    self.lam_b + nk[:, None])
                new["lam"] = lam
            return new

        return sweep

    @staticmethod
    def simulate(key, n, weights, mu, sigsq, theta=None, lam=None):
        """Draw composite rows from known parameters (test fixture)."""
        keys = jax.random.split(key, 4)
        z = jax.random.categorical(
            keys[0], jnp.log(weights), shape=(n,))
        numeric = (mu[z] + jax.random.normal(keys[1], (n, mu.shape[1]))
                   * jnp.sqrt(sigsq[z]))
        out = {"z": z, "numeric": numeric}
        if theta is not None:
            logits = jnp.log(jnp.clip(theta[z], 1e-12, None))
            cat = jax.vmap(
                lambda k_, lg: jax.random.categorical(k_, lg, axis=-1)
            )(jax.random.split(keys[2], n), logits)
            out["categorical"] = cat
        if lam is not None:
            out["counts"] = jax.random.poisson(keys[3], lam[z])
        return out


# ---------------------------------------------------------------------------
# Remaining root-model micro-variants of the Gaussian/MVN family.
# Reference: Models/ZeroMeanGaussianModel.hpp (variance-only Gaussian),
# ZeroMeanMvnModel.hpp (covariance-only MVN), IndependentMvnModel.hpp
# (diagonal MVN, per-coordinate conjugate draws),
# IndependentMvnModelGivenScalarSigma.hpp (diagonal MVN whose variances
# are sigma^2 * v_i with an externally owned sigma^2),
# MvnGivenSigma.hpp (the conjugate N(mu0, Sigma/kappa) prior for an MVN
# mean given its covariance), ProductVectorModel.hpp (independent
# scalar models glued into one vector model).
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class ZeroMeanGaussian:
    """y ~ N(0, sigma^2) — variance is the only parameter (reference
    ZeroMeanGaussianModel.hpp). Conjugate scaled-inv-chisq Gibbs."""

    y: jax.Array
    sigma_df: float = 1.0
    sigma_guess: float = 1.0

    def init_state(self, key):
        return {"sigsq": jnp.var(self.y) + 1e-12}

    def kernel(self):
        n = self.y.shape[0]
        ss = jnp.sum(self.y * self.y)

        def sweep(key, state):
            df = self.sigma_df + n
            s = (self.sigma_df * self.sigma_guess**2 + ss) / df
            return {"sigsq": dists.scaled_inv_chisq.sample(key, df, s)}

        return sweep

    def loglik(self, sigsq):
        n = self.y.shape[0]
        return -0.5 * (n * jnp.log(2.0 * jnp.pi * sigsq)
                       + jnp.sum(self.y * self.y) / sigsq)


@dataclasses.dataclass(frozen=True)
class ZeroMeanMvn:
    """y ~ MVN(0, Sigma) — covariance-only MVN (reference
    ZeroMeanMvnModel.hpp). Conjugate inverse-Wishart Gibbs."""

    y: jax.Array  # [n, p]
    prior_df: float | None = None  # default p + 2

    def init_state(self, key):
        p = self.y.shape[1]
        cov = jnp.cov(self.y.T) + 1e-9 * jnp.eye(p)
        return {"Sigma": 0.5 * (cov + cov.T)}

    def kernel(self):
        n, p = self.y.shape
        scatter = self.y.T @ self.y
        df0 = self.prior_df if self.prior_df is not None else p + 2.0
        s0 = jnp.eye(p) * df0

        def sweep(key, state):
            ss = s0 + scatter
            siginv = mv.wishart.sample(
                key, df0 + n, jnp.linalg.inv(0.5 * (ss + ss.T)))
            sigma = jnp.linalg.inv(siginv)
            return {"Sigma": 0.5 * (sigma + sigma.T)}

        return sweep


@dataclasses.dataclass(frozen=True)
class IndependentMvn:
    """MVN with diagonal covariance: p independent Gaussian coordinates
    sharing one model object (reference IndependentMvnModel.hpp).
    Conjugate normal/scaled-inv-chisq draws, ALL coordinates batched."""

    y: jax.Array  # [n, p]
    mean_guess: float = 0.0
    mean_nobs: float = 1e-3
    sigma_df: float = 1.0
    sigma_guess: float = 1.0

    def init_state(self, key):
        return {"mu": jnp.mean(self.y, 0),
                "sigsq": jnp.var(self.y, 0) + 1e-12}

    def kernel(self):
        n, p = self.y.shape
        ybar = jnp.mean(self.y, 0)
        ss_within = jnp.sum((self.y - ybar[None, :]) ** 2, 0)

        def sweep(key, state):
            km, ks = jax.random.split(key)
            # sigsq_j | mu_j
            dev = ss_within + n * (ybar - state["mu"]) ** 2
            df = self.sigma_df + n
            s = (self.sigma_df * self.sigma_guess**2 + dev) / df
            # NOTE: no shape arg — `s` is already [p], and the dists
            # convention PREPENDS shape to the params' broadcast shape
            # (shape=(p,) here returned [p, p], growing the state's
            # rank by one every sweep until XLA's rank limit aborted
            # the process ~200 sweeps in; caught in round 5)
            sigsq = dists.scaled_inv_chisq.sample(ks, df, s)
            # mu_j | sigsq_j
            prec = (self.mean_nobs + n) / sigsq
            mean = (self.mean_nobs * self.mean_guess
                    + n * ybar) / (self.mean_nobs + n)
            mu = mean + jax.random.normal(
                km, (p,), mean.dtype) / jnp.sqrt(prec)
            return {"mu": mu, "sigsq": sigsq}

        return sweep


@dataclasses.dataclass(frozen=True)
class IndependentMvnGivenScalarSigma:
    """Diagonal MVN whose variances are sigma^2 * v_j with sigma^2
    owned by another model (reference
    IndependentMvnModelGivenScalarSigma.hpp) — the vector analog of
    GaussianGivenSigma, used as a coefficient prior."""

    mean: jax.Array  # [p] mu0
    unscaled_variance_diagonal: jax.Array  # [p] v_j

    def variance(self, sigsq):
        return sigsq * self.unscaled_variance_diagonal

    def logpdf(self, x, sigsq):
        v = self.variance(sigsq)
        return jnp.sum(-0.5 * (jnp.log(2.0 * jnp.pi * v)
                               + (x - self.mean) ** 2 / v), -1)

    def sample(self, key, sigsq, shape=None):
        v = self.variance(sigsq)
        shp = (shape or ()) + self.mean.shape
        return self.mean + jnp.sqrt(v) * jax.random.normal(
            key, shp, jnp.result_type(float))


@dataclasses.dataclass(frozen=True)
class MvnGivenSigma:
    """N(mu0, Sigma / kappa) with Sigma owned elsewhere — the conjugate
    prior for an MVN mean given its covariance (reference
    MvnGivenSigma.hpp). posterior_mean_draw is the standard
    Normal-Normal update used by MvnConjSampler."""

    mean: jax.Array  # [p] mu0
    sample_size: float = 1.0  # kappa

    def logpdf(self, x, sigma):
        return mv.mvn.logpdf(x, self.mean, sigma / self.sample_size)

    def sample(self, key, sigma, shape=None):
        return mv.mvn.sample(key, self.mean,
                             sigma / self.sample_size, shape=shape)

    def posterior_mean_draw(self, key, suf_n, suf_sum, sigma):
        """mu | data, Sigma with this prior: N(w mu0 + (1-w) ybar,
        Sigma / (kappa + n))."""
        denom = self.sample_size + suf_n
        mean = (self.sample_size * self.mean + suf_sum) / denom
        return mv.mvn.sample(key, mean, sigma / denom)


@dataclasses.dataclass(frozen=True)
class ProductVector:
    """Independent scalar families glued into one vector model
    (reference ProductVectorModel.hpp: a vector observation whose
    coordinates follow unrelated scalar models). Here: per-coordinate
    (family, data-column) pairs each running their own kernel; the
    composite kernel is their product, mirroring
    CompositeParamPolicy."""

    components: tuple  # of scalar models with init_state/kernel

    def init_state(self, key):
        keys = jax.random.split(key, len(self.components))
        return {f"c{i}": m.init_state(k)
                for i, (m, k) in enumerate(zip(self.components, keys))}

    def kernel(self):
        kernels = [m.kernel() for m in self.components]

        def sweep(key, state):
            keys = jax.random.split(key, len(kernels))
            return {f"c{i}": kern(k, state[f"c{i}"])
                    for i, (kern, k) in enumerate(zip(kernels, keys))}

        return sweep
