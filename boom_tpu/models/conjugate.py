"""Conjugate posterior updates for the scalar model zoo.

Replaces the reference's per-family conjugate PosteriorSamplers
(Models/PosteriorSamplers/: GaussianConjSampler, BetaPosteriorSampler,
PoissonGammaSampler, GammaPosteriorSampler, DirichletPosteriorSampler,
MarkovConjSampler, MvnVarSampler, ...; ~45 files). Each update is a pure
function (key, prior, sufstats) -> draw, batched over arbitrary leading
dims so one call serves all chains/groups. Sufficient statistics are plain
arrays or small NamedTuples (the Sufstat analog, reference
Models/Sufstat.hpp:38); merging across shards is `psum` of these pytrees
(the combine_data contract, reference Models/ModelTypes.hpp:89).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from boom_tpu import dists


# ---------------------------------------------------------------------------
# Gaussian sufstats (reference GaussianSuf in Models/GaussianModelBase.hpp)
# ---------------------------------------------------------------------------
class GaussianSuf(NamedTuple):
    n: jax.Array
    sum: jax.Array
    sumsq: jax.Array  # sum of squares (uncentered)

    @staticmethod
    def from_data(y, weights=None, axis=-1):
        if weights is None:
            n = jnp.asarray(y.shape[axis] if axis is not None else y.size,
                            y.dtype)
            return GaussianSuf(n=jnp.broadcast_to(n, y.sum(axis).shape),
                               sum=y.sum(axis), sumsq=(y * y).sum(axis))
        return GaussianSuf(n=weights.sum(axis), sum=(weights * y).sum(axis),
                           sumsq=(weights * y * y).sum(axis))

    def centered_sumsq(self, center=None):
        mean = self.sum / jnp.maximum(self.n, 1e-30)
        c = mean if center is None else center
        return self.sumsq - 2.0 * c * self.sum + self.n * c * c


# ---------------------------------------------------------------------------
# Beta-Bernoulli / Beta-Binomial conjugacy
# (reference BetaPosteriorSampler / BinomialModel + BetaModel prior)
# ---------------------------------------------------------------------------
def beta_binomial_draw(key, prior_a, prior_b, successes, failures):
    """p | data ~ Beta(a + s, b + f)."""
    return dists.beta.sample(key, prior_a + successes, prior_b + failures)


# ---------------------------------------------------------------------------
# Gaussian conjugate draws
# (reference GaussianConjSampler, GaussianMeanSampler, GaussianVarSampler)
# ---------------------------------------------------------------------------
def gaussian_mean_draw(key, suf: GaussianSuf, sigsq, prior_mean, prior_nobs):
    """mu | sigma^2, data with N(prior_mean, sigma^2/prior_nobs) prior."""
    n_post = suf.n + prior_nobs
    mean_post = (suf.sum + prior_nobs * prior_mean) / n_post
    sd_post = jnp.sqrt(sigsq / n_post)
    return dists.normal.sample(key, mean_post, sd_post)


def gaussian_var_draw(key, suf: GaussianSuf, mu, prior_df, prior_sigsq):
    """sigma^2 | mu, data with ScaledInvChisq(prior_df, prior_sigsq) prior
    (reference GaussianVarSampler; also BregVsSampler.cpp:313 draw_sigma)."""
    ss = suf.centered_sumsq(mu)
    df_post = prior_df + suf.n
    ss_post = prior_df * prior_sigsq + ss
    return dists.scaled_inv_chisq.sample(key, df_post, ss_post / df_post)


def gaussian_mean_var_draw(key, suf: GaussianSuf, prior_mean, prior_nobs,
                           prior_df, prior_sigsq):
    """(mu, sigma^2) joint conjugate draw: sigma^2 from its marginal under
    the normal-inverse-chi-square prior, then mu | sigma^2
    (reference GaussianConjSampler::draw)."""
    k1, k2 = jax.random.split(key)
    n_post = suf.n + prior_nobs
    ybar = suf.sum / jnp.maximum(suf.n, 1e-30)
    mean_post = (suf.sum + prior_nobs * prior_mean) / n_post
    ss = suf.centered_sumsq()  # sum (y - ybar)^2
    shrink = suf.n * prior_nobs / n_post * (ybar - prior_mean) ** 2
    df_post = prior_df + suf.n
    ss_post = prior_df * prior_sigsq + ss + shrink
    sigsq = dists.scaled_inv_chisq.sample(k1, df_post, ss_post / df_post)
    mu = dists.normal.sample(k2, mean_post, jnp.sqrt(sigsq / n_post))
    return mu, sigsq


# ---------------------------------------------------------------------------
# Poisson-Gamma (reference PoissonGammaSampler)
# ---------------------------------------------------------------------------
def poisson_gamma_draw(key, prior_a, prior_b, event_count, exposure):
    """lambda | data ~ Gamma(a + sum y, b + n)."""
    return dists.gamma.sample(key, prior_a + event_count, prior_b + exposure)


# ---------------------------------------------------------------------------
# Gamma posterior for an exponential rate
# ---------------------------------------------------------------------------
def exponential_gamma_draw(key, prior_a, prior_b, n, sum_y):
    """rate | data ~ Gamma(a + n, b + sum y) (reference
    ExponentialGammaSampler)."""
    return dists.gamma.sample(key, prior_a + n, prior_b + sum_y)


# ---------------------------------------------------------------------------
# Dirichlet-Multinomial / Markov chain conjugacy
# (reference MultinomialDirichletSampler, MarkovConjSampler)
# ---------------------------------------------------------------------------
def dirichlet_multinomial_draw(key, prior_counts, counts):
    """probs | counts ~ Dirichlet(prior + counts); batched over leading
    dims — a [S, S] batch gives the Markov transition-matrix conjugate draw
    row-wise (reference MarkovConjSampler)."""
    return dists.dirichlet.sample(key, prior_counts + counts)


# ---------------------------------------------------------------------------
# MVN conjugate draws (reference MvnConjSampler, MvnVarSampler)
# ---------------------------------------------------------------------------
class MvnSuf(NamedTuple):
    n: jax.Array
    sum: jax.Array  # [d]
    sumsq: jax.Array  # [d, d] uncentered scatter sum x x^T

    @staticmethod
    def from_data(y):
        """y: [n, d]."""
        return MvnSuf(
            n=jnp.asarray(y.shape[0], y.dtype),
            sum=y.sum(0),
            sumsq=y.T @ y,
        )

    def centered_scatter(self, center):
        return (self.sumsq - jnp.outer(self.sum, center)
                - jnp.outer(center, self.sum)
                + self.n * jnp.outer(center, center))


def mvn_mean_draw(key, suf: MvnSuf, siginv, prior_mean, prior_siginv):
    """mu | Sigma, data with N(prior_mean, prior_siginv^{-1}) prior."""
    prec = prior_siginv + suf.n * siginv
    b = prior_siginv @ prior_mean + siginv @ suf.sum
    return dists.mvn.sample_suf(key, b, prec)


def mvn_precision_draw(key, suf: MvnSuf, mu, prior_df, prior_scatter):
    """Siginv | mu, data ~ Wishart(prior_df + n,
    (prior_scatter + centered scatter)^{-1}) (reference MvnVarSampler)."""
    scatter = suf.centered_scatter(mu)
    df_post = prior_df + suf.n
    scale = jnp.linalg.inv(prior_scatter + scatter)
    scale = 0.5 * (scale + scale.T)
    return dists.wishart.sample(key, df_post, scale)
