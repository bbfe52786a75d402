"""Known-variance weighted SSVS: the shared engine for GLM spike-and-slab.

The reference's GLM spike-slab samplers (probit/logit/Poisson/multinomial)
all reduce, by data augmentation, to a Gaussian regression with *known*
heteroscedastic residual variances: latent z_i = x_i'beta + eps_i with
eps_i ~ N(mu_i, s_i^2) from a (truncated-normal or normal-mixture) imputer,
then run the Gaussian variable-selection machinery on complete-data
sufficient statistics (reference Models/Glm/PosteriorSamplers/
SpikeSlabSampler.{hpp,cpp} — draw_model_indicators / draw_beta given
"information-weighted" sufstats; used by BinomialLogitSpikeSlabSampler,
BinomialProbitSpikeSlabSampler, PoissonRegressionSpikeSlabSampler, MLVS).

This module is the fixed-shape TPU form: weighted sufstats are two dense
reductions (one matmul each, MXU-friendly), the indicator sweep is a
`lax.scan` over coordinates with exact two-point conditionals, and the
whole thing vmaps over chains.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from boom_tpu.linalg import masked
from boom_tpu.models.glm.regression import SpikeSlabPrior


class WeightedRegSuf(NamedTuple):
    """Complete-data weighted regression sufstats: xtwx = X'WX,
    xtwz = X'Wz with W = diag(w). Combining across data shards is an
    elementwise sum => `psum` (reference Model::combine_data contract)."""

    xtwx: jax.Array  # [p, p]
    xtwz: jax.Array  # [p]

    @staticmethod
    def from_data(x, z, w=None):
        if w is None:
            return WeightedRegSuf(xtwx=x.T @ x, xtwz=x.T @ z)
        xw = x * w[..., :, None]
        return WeightedRegSuf(xtwx=jnp.swapaxes(x, -1, -2) @ xw,
                              xtwz=jnp.einsum("...np,...n->...p", xw, z))

    def combine(self, other):
        return WeightedRegSuf(*(a + b for a, b in zip(self, other)))


class KvPostParams(NamedTuple):
    chol: jax.Array  # masked Cholesky of (Omega + X'WX)_g
    prec_mean: jax.Array  # (Omega b + X'Wz), full shape
    beta_tilde: jax.Array  # posterior mean, zeros off-mask


def kv_post_params(suf: WeightedRegSuf, prior: SpikeSlabPrior,
                   mask) -> KvPostParams:
    m = jnp.asarray(mask, suf.xtwz.dtype)
    prec = masked.masked_spd(prior.unscaled_precision + suf.xtwx, mask)
    chol = jnp.linalg.cholesky(prec)
    om_masked = prior.unscaled_precision * masked.mask_outer(m)
    prec_mean = om_masked @ (prior.mean * m) + suf.xtwz * m
    beta_tilde = masked.masked_cho_solve(chol, prec_mean, mask)
    return KvPostParams(chol=chol, prec_mean=prec_mean,
                        beta_tilde=beta_tilde)


def kv_log_model_prob(suf: WeightedRegSuf, prior: SpikeSlabPrior, mask):
    """log p(gamma | z) up to a gamma-free constant, beta integrated out
    with residual variance fixed at the imputed mixture variances
    (reference SpikeSlabSampler::log_model_prob analog):

      log p(g) + 1/2 [ logdet Omega_g - logdet(Omega+X'WX)_g
                       + beta_tilde' (Omega+X'WX)_g beta_tilde
                       - (b'Omega b)_g ]
    """
    m = jnp.asarray(mask, suf.xtwz.dtype)
    post = kv_post_params(suf, prior, mask)
    om_chol = masked.masked_cholesky(prior.unscaled_precision, mask)
    ld_om = masked.masked_logdet(om_chol, mask)
    ld_post = masked.masked_logdet(post.chol, mask)
    fit = jnp.sum(post.beta_tilde * post.prec_mean, -1)
    bm = prior.mean * m
    om_masked = prior.unscaled_precision * masked.mask_outer(m)
    prior_fit = jnp.sum(bm * (om_masked @ bm), -1)
    return (prior.spike_logp(mask)
            + 0.5 * (ld_om - ld_post + fit - prior_fit))


def kv_draw_indicators(key, suf: WeightedRegSuf, prior: SpikeSlabPrior,
                       mask, max_flips: int | None = None,
                       mode_jump: bool = False):
    """Random-order Gibbs sweep over inclusion indicators with exact
    two-point conditionals (the known-variance analog of
    draw_model_indicators, reference BregVsSampler.cpp:353). With
    mode_jump=True the sweep is preceded by one independence-MH global
    move (kv_mode_jump) whose proposal is fitted per call at the
    CURRENT imputation's weighted screening statistics."""
    if mode_jump:
        k_jump, key = jax.random.split(key)
        mask = kv_mode_jump(k_jump, suf, prior, mask,
                            kv_screening_proposal_probs(suf))
    p = mask.shape[-1]
    k_perm, k_scan = jax.random.split(key)
    order = jax.random.permutation(k_perm, p)
    if max_flips is not None:
        order = order[:max_flips]
    logp_cur = kv_log_model_prob(suf, prior, mask)

    def flip_one(carry, inp):
        mask, logp_cur = carry
        j, k = inp
        flipped = mask.at[j].set(~mask[j])
        logp_flip = kv_log_model_prob(suf, prior, flipped)
        take = jnp.log(jax.random.uniform(k, (), logp_cur.dtype)) < (
            jax.nn.log_sigmoid(logp_flip - logp_cur))
        return (jnp.where(take, flipped, mask),
                jnp.where(take, logp_flip, logp_cur)), None

    keys = jax.random.split(k_scan, order.shape[0])
    (mask, _), _ = jax.lax.scan(flip_one, (mask, logp_cur), (order, keys))
    return mask


def kv_mode_jump(key, suf: WeightedRegSuf, prior: SpikeSlabPrior, mask,
                 qprobs):
    """Independence-MH between-mode move on gamma for the known-variance
    engine: propose g' ~ prod Bernoulli(qprobs) and accept with the
    exact collapsed odds (kv_log_model_prob). The GLM composites'
    analog of regression.mode_jump_move — one global refresh per sweep
    rescues chains stuck in a local model basin that one-flip-at-a-time
    SSVS exits slowly (reference escape machinery:
    AdaptiveSpikeSlabRegressionSampler.hpp:39). Cost: two extra masked-
    Cholesky evaluations per sweep — a small fraction of a GLM sweep,
    which already pays imputation + p flip Choleskys."""
    k_prop, k_acc = jax.random.split(key)
    p = mask.shape[-1]
    prop = jax.random.uniform(k_prop, (p,), qprobs.dtype) < qprobs
    logq = jnp.log(qprobs)
    log1mq = jnp.log1p(-qprobs)

    def lq(m):
        mf = jnp.asarray(m, qprobs.dtype)
        return jnp.sum(mf * logq + (1.0 - mf) * log1mq, -1)

    log_ratio = (kv_log_model_prob(suf, prior, prop)
                 - kv_log_model_prob(suf, prior, mask)
                 + lq(mask) - lq(prop))
    take = jnp.log(jax.random.uniform(k_acc, (), log_ratio.dtype)) \
        < log_ratio
    return jnp.where(take, prop, mask)


def kv_screening_proposal_probs(suf: WeightedRegSuf, lo=0.02, hi=0.98):
    """Product-Bernoulli proposal fitted at the weighted marginal
    screening statistics: z_j^2 = (X'Wz)_j^2 / (X'WX)_jj (the
    information-weighted single-variable evidence), thresholded at
    2 log p — the known-variance analog of
    regression.screening_proposal_probs."""
    p = suf.xtwz.shape[-1]
    z2 = suf.xtwz ** 2 / (jnp.diagonal(suf.xtwx, axis1=-2, axis2=-1)
                          + 1e-30)
    raw = jax.nn.sigmoid(0.5 * (z2 - 2.0 * jnp.log(float(p))))
    return jnp.clip(raw, lo, hi)


def kv_draw_beta(key, suf: WeightedRegSuf, prior: SpikeSlabPrior, mask):
    """beta | gamma, z ~ N(beta_tilde, (Omega+X'WX)_g^{-1}), zeros
    off-mask (reference SpikeSlabSampler::draw_beta_given_complete_data)."""
    post = kv_post_params(suf, prior, mask)
    return masked.masked_mvn_suf_sample(key, post.chol, post.prec_mean, mask)


def sample_mixture_indicator(key, resid, weights, means, sds):
    """Given residual eps (any batch shape) and a normal mixture table,
    sample the mixture component for each residual. Returns the component
    index array with resid's shape (reference
    NormalMixtureApproximation::unmix, NormalMixtureApproximation.hpp:38)."""
    r = resid[..., None]
    z = (r - means) / sds
    logp = jnp.log(weights) - jnp.log(sds) - 0.5 * z * z
    return jax.random.categorical(key, logp, axis=-1)
