"""Dirichlet-process mixtures via truncated stick-breaking (blocked Gibbs).

Reference: Models/Mixtures/DirichletProcessMixture.hpp:79
(DirichletProcessMixtureModel), DirichletProcessMvnModel (:34), with
samplers DirichletProcessCollapsedGibbsSampler / DirichletProcessSliceSampler
/ SplitMerge. The reference's samplers grow/shrink the component list
dynamically — impossible under fixed shapes — so the TPU-native design is
the Ishwaran-James (2001) blocked Gibbs on a truncation of the
stick-breaking representation (SURVEY.md §7 phase 6: "fixed max-cluster
truncation ... to stay fixed-shape"):

    v_k ~ Beta(1, alpha), w_k = v_k prod_{j<k}(1 - v_j), k < K_max
    z_i ~ Categorical(w),  y_i | z_i ~ component(theta_{z_i})

Every update is a fixed-shape batched op: indicators are one categorical
over K_max, sticks are K_max Beta draws from suffstat tail sums, component
params are conjugate draws batched over K_max, and the concentration
alpha gets its conjugate Gamma update given the sticks (Escobar-West
style). Truncation error decays geometrically in K_max.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from boom_tpu import dists
from boom_tpu.models.conjugate import (
    GaussianSuf,
    MvnSuf,
    gaussian_mean_var_draw,
    mvn_mean_draw,
    mvn_precision_draw,
)


def stick_breaking_weights(v):
    """[..., K] stick lengths -> mixture weights (last stick absorbs the
    remainder so weights sum to one at the truncation). Dtype-aware
    clipping: naive 1 - 1e-12 rounds to exactly 1 in float32 and produces
    log1p(-1) = -inf -> NaN weights."""
    eps = jnp.finfo(v.dtype).eps
    v = jnp.clip(v, jnp.finfo(v.dtype).tiny, 1.0 - eps)
    log1mv = jnp.log1p(-v)
    prior_cum = jnp.cumsum(log1mv, axis=-1) - log1mv  # sum_{j<k}
    logw = jnp.log(v) + prior_cum
    # last weight = remainder prod_{j<K-1}(1 - v_j)
    logw = logw.at[..., -1].set(prior_cum[..., -1])
    return jnp.exp(logw)


def draw_sticks(key, counts, alpha):
    """v_k | z ~ Beta(1 + n_k, alpha + sum_{j>k} n_j), batched over K."""
    tail = jnp.cumsum(counts[..., ::-1], -1)[..., ::-1] - counts
    return dists.beta.sample(key, 1.0 + counts, alpha + tail)


def draw_concentration(key, v, prior_shape=1.0, prior_rate=1.0):
    """alpha | v ~ Gamma(a + K - 1, b - sum_{k<K-1} log(1 - v_k))
    (conjugate under the stick-breaking Beta(1, alpha) likelihood)."""
    k = v.shape[-1]
    eps = jnp.finfo(v.dtype).eps
    s = jnp.sum(jnp.log1p(-jnp.clip(v[..., :-1], 0.0, 1.0 - eps)), -1)
    return dists.gamma.sample(key, prior_shape + k - 1.0,
                              prior_rate - s)


@dataclasses.dataclass(frozen=True)
class DpGaussianMixture:
    """DP mixture of univariate Gaussians with NIX component priors
    (reference DirichletProcessMixtureModel with Gaussian components)."""

    y: jax.Array  # [n]
    max_components: int = 20
    alpha_shape: float = 1.0  # Gamma prior on concentration
    alpha_rate: float = 1.0
    mean_guess: float = 0.0
    mean_nobs: float = 0.01
    sigma_df: float = 1.0
    sigma_guess: float = 1.0

    def init_state(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        k = self.max_components
        qs = jax.random.uniform(k1, (k,), self.y.dtype, 0.02, 0.98)
        mu = jnp.quantile(self.y, qs)
        sigsq = jnp.full((k,), jnp.var(self.y))
        alpha = jnp.asarray(1.0, self.y.dtype)
        v = dists.beta.sample(k2, jnp.ones(k), alpha * jnp.ones(k))
        return {"mu": mu, "sigsq": sigsq, "v": v, "alpha": alpha}

    def kernel(self):
        k_max = self.max_components

        def sweep(key, state):
            kz, kv, ka, kc = jax.random.split(key, 4)
            w = stick_breaking_weights(state["v"])
            logits = (dists.normal.logpdf(
                self.y[:, None], state["mu"][None, :],
                jnp.sqrt(state["sigsq"])[None, :])
                + jnp.log(jnp.clip(w, 1e-300, None))[None, :])
            z = jax.random.categorical(kz, logits, axis=-1)
            onehot = jax.nn.one_hot(z, k_max, dtype=self.y.dtype)
            counts = onehot.sum(0)
            suf = GaussianSuf(n=counts, sum=onehot.T @ self.y,
                              sumsq=onehot.T @ (self.y * self.y))
            mu, sigsq = gaussian_mean_var_draw(
                kc, suf, self.mean_guess, self.mean_nobs,
                self.sigma_df, self.sigma_guess**2)
            v = draw_sticks(kv, counts, state["alpha"])
            alpha = draw_concentration(ka, v, self.alpha_shape,
                                       self.alpha_rate)
            return {"mu": mu, "sigsq": sigsq, "v": v, "alpha": alpha}

        return sweep

    def occupied_components(self, state, threshold=0):
        """Number of clusters with > threshold members at the current
        indicator imputation (an analysis helper)."""
        w = stick_breaking_weights(state["v"])
        logits = (dists.normal.logpdf(
            self.y[:, None], state["mu"][None, :],
            jnp.sqrt(state["sigsq"])[None, :])
            + jnp.log(jnp.clip(w, 1e-300, None))[None, :])
        z = jnp.argmax(logits, -1)
        counts = jnp.bincount(z, length=self.max_components)
        return jnp.sum(counts > threshold)


@dataclasses.dataclass(frozen=True)
class DpMvnMixture:
    """DP mixture of multivariate Gaussians (reference
    DirichletProcessMvnModel, DirichletProcessMixture.hpp:34) with
    Normal/Wishart component priors; blocked Gibbs as above, component
    draws batched over K_max via vmap."""

    y: jax.Array  # [n, d]
    max_components: int = 20
    alpha_shape: float = 1.0
    alpha_rate: float = 1.0
    # prior weight on the component-mean prior N(data_mean, data_cov /
    # mean_nobs): ~1 keeps empty-component birth proposals on data scale
    # (a too-diffuse prior makes cluster birth nearly impossible — the
    # same tuning BOOM's DirichletProcessMvnModel docs warn about)
    mean_nobs: float = 1.0
    wishart_df: float | None = None  # default d + 2

    @property
    def dim(self):
        return self.y.shape[1]

    def init_state(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        k, d = self.max_components, self.dim
        idx = jax.random.choice(k1, self.y.shape[0], (k,), replace=False)
        mu = self.y[idx]
        # start components tighter than the marginal data covariance
        # (roughly 1/k of the volume each) so the indicator draw can
        # separate clusters instead of one broad component absorbing all
        scale = float(k) ** (2.0 / d)
        siginv = jnp.broadcast_to(
            scale * jnp.linalg.inv(jnp.cov(self.y.T) + 1e-6 * jnp.eye(d)),
            (k, d, d))
        alpha = jnp.asarray(1.0, self.y.dtype)
        v = dists.beta.sample(k2, jnp.ones(k), alpha * jnp.ones(k))
        return {"mu": mu, "siginv": siginv, "v": v, "alpha": alpha}

    def kernel(self):
        k_max, d = self.max_components, self.dim
        df = self.wishart_df or (d + 2.0)
        data_mean = jnp.mean(self.y, 0)
        data_cov = jnp.cov(self.y.T) + 1e-6 * jnp.eye(d)
        prior_scatter = data_cov * df

        def sweep(key, state):
            kz, kv, ka, km, kp = jax.random.split(key, 5)
            w = stick_breaking_weights(state["v"])
            logp = jax.vmap(
                lambda m, si: dists.mvn.logpdf_prec(self.y, m, si),
                out_axes=1)(state["mu"], state["siginv"])  # [n, K]
            logits = logp + jnp.log(jnp.clip(w, 1e-300, None))[None, :]
            z = jax.random.categorical(kz, logits, axis=-1)
            onehot = jax.nn.one_hot(z, k_max, dtype=self.y.dtype)
            counts = onehot.sum(0)  # [K]
            sums = onehot.T @ self.y  # [K, d]
            sumsq = jnp.einsum("nk,ni,nj->kij", onehot, self.y, self.y)
            suf = MvnSuf(n=counts, sum=sums, sumsq=sumsq)
            mu = jax.vmap(
                lambda k_, s, si: mvn_mean_draw(
                    k_, s, si, data_mean,
                    self.mean_nobs * jnp.linalg.inv(data_cov)))(
                jax.random.split(km, k_max), suf, state["siginv"])
            siginv = jax.vmap(
                lambda k_, s, m: mvn_precision_draw(
                    k_, s, m, df, prior_scatter))(
                jax.random.split(kp, k_max), suf, mu)
            v = draw_sticks(kv, counts, state["alpha"])
            alpha = draw_concentration(ka, v, self.alpha_shape,
                                       self.alpha_rate)
            return {"mu": mu, "siginv": siginv, "v": v, "alpha": alpha}

        return sweep
