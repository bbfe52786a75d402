"""Gaussian linear regression with spike-and-slab variable selection (SSVS).

Reference: Models/Glm/RegressionModel.hpp:256 (+ NeRegSuf xtx/xty sufstats
at :156), Models/Glm/PosteriorSamplers/BregVsSampler.cpp — draw() at :252,
draw_model_indicators at :353, mcmc_one_flip at :241, log_model_prob at
:216, set_reg_post_params at :100ish, draw_sigma at :313, draw_beta at
:326 — and the prior structure of BoomSpikeSlab's SpikeSlabPrior
(Interfaces/python/spikeslab/priors.py RegressionSpikeSlabPrior).

TPU-native design decisions (SURVEY.md §7 phase 5):
  * `Selector` subsets become fixed-shape boolean masks; every
    `xtx(g)` Cholesky is a masked Cholesky of the full (p, p) matrix
    (boom_tpu.linalg.masked) so one compiled program serves every subset.
  * The one-variable-at-a-time indicator sweep stays a `lax.scan` over a
    fresh random permutation (statistically it is BOOM's random-order
    sweep), but each flip's conditional two-point distribution is sampled
    exactly (Gibbs) instead of MH — same invariant distribution, fewer
    rejections — and the *chains* axis is vmapped so thousands of sweeps
    run in lockstep on the MXU.
  * sigma^2 and beta draws reuse the same conjugate quantities
    (rmvn_suf-style draw via masked Cholesky back-substitution).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from boom_tpu import dists
from boom_tpu.linalg import masked


class RegSuf(NamedTuple):
    """Regression sufficient statistics (reference NeRegSuf,
    Models/Glm/RegressionModel.hpp:156). `combine` across data shards is an
    elementwise sum => `psum` on a mesh (the combine_data contract)."""

    xtx: jax.Array  # [p, p]
    xty: jax.Array  # [p]
    yty: jax.Array  # scalar
    n: jax.Array  # scalar

    @staticmethod
    def from_data(x, y):
        return RegSuf(
            xtx=x.T @ x, xty=x.T @ y, yty=y @ y,
            n=jnp.asarray(x.shape[0], x.dtype))

    def combine(self, other):
        return RegSuf(*(a + b for a, b in zip(self, other)))


@dataclasses.dataclass(frozen=True)
class SpikeSlabPrior:
    """Spike-and-slab prior: independent Bernoulli spike + conditional
    Gaussian slab beta | g, sigma^2 ~ N(b_g, sigma^2 (Omega_g)^{-1}) and
    sigma^2 ~ ScaledInvChisq(sigma_df, sigma_guess^2).

    Matches BoomSpikeSlab's SpikeSlabPrior construction: Omega is the
    "information matrix" prior kappa * [(1-alpha) XtX + alpha diag(XtX)]/n
    (reference Models/MvnGivenX.hpp via RegressionSlabPrior).
    """

    mean: jax.Array  # [p] prior mean of beta (b)
    unscaled_precision: jax.Array  # [p, p] Omega
    log_inclusion_odds: jax.Array  # [p]  log(pi/(1-pi))
    log_inclusion_norm: jax.Array  # scalar  sum log(1-pi)
    sigma_df: jax.Array  # prior df for sigma^2
    prior_ss: jax.Array  # sigma_df * sigma_guess^2
    max_size: int | None = None
    # Upper truncation for sigma (NOT sigma^2), or None for no limit —
    # the sigma_upper_limit knob of BoomSpikeSlab's SpikeSlabPrior.
    sigma_upper_limit: float | None = None

    @staticmethod
    def from_data(x, y, expected_model_size=1.0, expected_rsq=0.5,
                  prior_information_weight=1.0, diagonal_shrinkage=0.05,
                  sigma_df=0.01, optional_coefficient_estimate=None,
                  max_size=None, prior_inclusion_probabilities=None,
                  sigma_upper_limit=None):
        """Default construction mirroring R's SpikeSlabPrior /
        python spikeslab.RegressionSpikeSlabPrior defaults."""
        n, p = x.shape
        xtx = x.T @ x
        if prior_inclusion_probabilities is None:
            pi = jnp.clip(jnp.asarray(expected_model_size / p, x.dtype),
                          1e-6, 1.0)
            pi = jnp.broadcast_to(pi, (p,))
        else:
            pi = jnp.clip(jnp.asarray(prior_inclusion_probabilities,
                                      x.dtype), 1e-6, 1.0 - 1e-12)
        sample_var = jnp.var(y)
        sigma_guess = jnp.sqrt((1.0 - expected_rsq) * sample_var)
        mean = (jnp.zeros(p, x.dtype)
                if optional_coefficient_estimate is None
                else jnp.asarray(optional_coefficient_estimate, x.dtype))
        a = diagonal_shrinkage
        omega = prior_information_weight * (
            (1.0 - a) * xtx + a * jnp.diag(jnp.diag(xtx))) / n
        return SpikeSlabPrior(
            mean=mean,
            unscaled_precision=omega,
            log_inclusion_odds=jnp.log(pi) - jnp.log1p(-pi),
            log_inclusion_norm=jnp.sum(jnp.log1p(-pi)),
            sigma_df=jnp.asarray(sigma_df, x.dtype),
            prior_ss=sigma_df * sigma_guess**2,
            max_size=max_size,
            sigma_upper_limit=sigma_upper_limit,
        )

    def spike_logp(self, mask):
        """log P(g) under independent Bernoulli inclusion."""
        m = jnp.asarray(mask, self.mean.dtype)
        logp = jnp.sum(m * self.log_inclusion_odds, -1) + self.log_inclusion_norm
        if self.max_size is not None:
            logp = jnp.where(jnp.sum(m, -1) > self.max_size, -jnp.inf, logp)
        return logp


class RegPostParams(NamedTuple):
    """Conjugate posterior quantities for a given mask (the analog of
    BVS::set_reg_post_params' cached state)."""

    chol: jax.Array  # masked Cholesky of Omega_g + XtX_g
    beta_tilde: jax.Array  # posterior mean, zeros off-mask
    df: jax.Array
    ss: jax.Array


def reg_post_params(suf: RegSuf, prior: SpikeSlabPrior, mask) -> RegPostParams:
    m = jnp.asarray(mask, suf.xty.dtype)
    prec = masked.masked_spd(prior.unscaled_precision + suf.xtx, mask)
    chol = jnp.linalg.cholesky(prec)
    om_masked = prior.unscaled_precision * masked.mask_outer(m)
    bm = prior.mean * m
    prec_mean = om_masked @ bm + suf.xty * m
    beta_tilde = masked.masked_cho_solve(chol, prec_mean, mask)
    df = suf.n + prior.sigma_df
    lik_ss = (suf.yty - 2.0 * beta_tilde @ (suf.xty * m)
              + beta_tilde @ (suf.xtx @ beta_tilde))
    diff = beta_tilde - bm
    mismatch = diff @ (om_masked @ diff)
    ss = prior.prior_ss + lik_ss + mismatch
    return RegPostParams(chol=chol, beta_tilde=beta_tilde, df=df, ss=ss)


def log_model_prob(suf: RegSuf, prior: SpikeSlabPrior, mask):
    """Marginal log probability of the inclusion vector with beta and
    sigma^2 integrated out (reference BregVsSampler.cpp:216). The empty
    model falls out of the same masked formulas (identity embeddings give
    logdets of 0 and SS = prior_ss + yty)."""
    post = reg_post_params(suf, prior, mask)
    om_chol = masked.masked_cholesky(prior.unscaled_precision, mask)
    ldoi = masked.masked_logdet(om_chol, mask)
    ld_post = masked.masked_logdet(post.chol, mask)
    return (prior.spike_logp(mask)
            + 0.5 * (ldoi - ld_post)
            - (0.5 * post.df - 1.0) * jnp.log(post.ss))


def draw_indicators_sweep(key, suf: RegSuf, prior: SpikeSlabPrior, mask,
                          max_flips: int | None = None):
    """One random-order Gibbs sweep over inclusion indicators (reference
    draw_model_indicators at BregVsSampler.cpp:353). Each coordinate's
    two-point conditional is sampled exactly; the scan carries the current
    log model probability so each flip costs one masked Cholesky."""
    p = mask.shape[-1]
    k_perm, k_scan = jax.random.split(key)
    order = jax.random.permutation(k_perm, p)
    if max_flips is not None:
        order = order[:max_flips]
    logp_cur = log_model_prob(suf, prior, mask)

    def flip_one(carry, inp):
        mask, logp_cur = carry
        j, k = inp
        flipped = mask.at[j].set(~mask[j])
        logp_flip = log_model_prob(suf, prior, flipped)
        # conditional P(g_j = flipped state) = sigmoid(logp_flip - logp_cur)
        take = jnp.log(jax.random.uniform(k, (), logp_cur.dtype)) < (
            jax.nn.log_sigmoid(logp_flip - logp_cur))
        new_mask = jnp.where(take, flipped, mask)
        new_logp = jnp.where(take, logp_flip, logp_cur)
        return (new_mask, new_logp), None

    keys = jax.random.split(k_scan, order.shape[0])
    (mask, _), _ = jax.lax.scan(flip_one, (mask, logp_cur), (order, keys))
    return mask


def screening_proposal_probs(suf: RegSuf, prior: SpikeSlabPrior,
                             lo=0.02, hi=0.98):
    """Product-Bernoulli inclusion probabilities fitted at the marginal
    screening statistics (the BigAss screen's per-variable evidence):
    z_j^2 = the marginal regression t^2 of x_j on y, mapped through
    sigmoid((z_j^2 - 2 log p) / 2) — a Bonferroni-style evidence
    threshold — and clipped to [lo, hi] so the proposal has full
    support. Strong predictors get pi ~= hi, noise gets pi ~= lo, so a
    proposed model concentrates near the high-evidence mode while
    remaining a valid independence proposal everywhere."""
    p = suf.xty.shape[-1]
    s2 = suf.yty / jnp.maximum(suf.n, 1.0)
    z2 = suf.xty ** 2 / (jnp.diagonal(suf.xtx, axis1=-2, axis2=-1)
                         * s2 + 1e-30)
    raw = jax.nn.sigmoid(0.5 * (z2 - 2.0 * jnp.log(float(p))))
    return jnp.clip(raw, lo, hi)


def mode_jump_move(key, suf: RegSuf, prior: SpikeSlabPrior, mask, qprobs):
    """Independence Metropolis-Hastings on the whole inclusion vector:
    propose g' ~ prod_j Bernoulli(qprobs_j), accept with the exact
    collapsed posterior odds (beta and sigma^2 integrated out via
    log_model_prob, so the move is exact for the same target as the
    one-flip sweep). This is the between-MODE move the one-flip-at-a-
    time sweep lacks: a chain stuck in the high-sigsq null-model basin
    (the 4096-chain pathology diagnosed in PERF.md section 3) exits in
    one accepted jump instead of an exponentially unlikely sequence of
    single flips. TPU analog of the reference's adaptive birth/death
    escape machinery (Models/Glm/PosteriorSamplers/
    AdaptiveSpikeSlabRegressionSampler.hpp:39), recast as a single
    batched independence proposal so it vmaps over chains."""
    k_prop, k_acc = jax.random.split(key)
    p = mask.shape[-1]
    prop = jax.random.uniform(k_prop, (p,), qprobs.dtype) < qprobs
    logq = jnp.log(qprobs)
    log1mq = jnp.log1p(-qprobs)

    def lq(m):
        mf = jnp.asarray(m, qprobs.dtype)
        return jnp.sum(mf * logq + (1.0 - mf) * log1mq, -1)

    log_ratio = (log_model_prob(suf, prior, prop)
                 - log_model_prob(suf, prior, mask)
                 + lq(mask) - lq(prop))
    take = jnp.log(jax.random.uniform(k_acc, (), log_ratio.dtype)) \
        < log_ratio
    return jnp.where(take, prop, mask)


def draw_sigsq(key, suf: RegSuf, prior: SpikeSlabPrior, mask):
    """sigma^2 | g, y (beta integrated out) — reference draw_sigma
    (BregVsSampler.cpp:313): scaled inverse chi^2 with DF_, SS_."""
    post = reg_post_params(suf, prior, mask)
    if prior.sigma_upper_limit is not None:
        return dists.scaled_inv_chisq.sample_upper_truncated(
            key, post.df, post.ss / post.df,
            jnp.asarray(prior.sigma_upper_limit) ** 2)
    return dists.scaled_inv_chisq.sample(key, post.df, post.ss / post.df)


def draw_beta(key, suf: RegSuf, prior: SpikeSlabPrior, mask, sigsq):
    """beta_g | g, sigma^2, y ~ N(beta_tilde, sigma^2 (Omega_g+XtX_g)^{-1})
    — reference draw_beta (BregVsSampler.cpp:326); zeros off-mask."""
    post = reg_post_params(suf, prior, mask)
    m = jnp.asarray(mask, post.beta_tilde.dtype)
    z = jax.random.normal(key, post.beta_tilde.shape,
                          post.beta_tilde.dtype) * m
    extra = jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(post.chol, -1, -2), z[..., None], lower=False)[..., 0]
    return post.beta_tilde + jnp.sqrt(sigsq) * extra * m


@dataclasses.dataclass(frozen=True)
class SpikeSlabRegression:
    """The lm.spike / lm_spike model (reference BoomSpikeSlab lm.spike.R,
    python spikeslab.lm_spike at spikeslab.py:85). State keys:
    gamma (bool [p]), beta ([p]), sigsq (scalar)."""

    suf: RegSuf
    prior: SpikeSlabPrior
    max_flips: int | None = None
    # "sweep": incremental SWEEP-operator updates, O(p^2)/flip (default);
    # "cholesky": masked-Cholesky recompute, O(p^3)/flip (reference
    # BregVsSampler's strategy; kept as the numerical oracle).
    method: str = "sweep"
    # Exact independence-MH between-mode move on gamma, run once per
    # sweep before the flip scan (see mode_jump_move). Costs two extra
    # masked-Cholesky log_model_prob evaluations (~2 flips' worth);
    # rescues chains stuck in the null-model basin at high chain counts.
    mode_jump: bool = True

    @staticmethod
    def from_data(x, y, method="sweep", max_flips=None, mode_jump=True,
                  **prior_kwargs):
        return SpikeSlabRegression(
            suf=RegSuf.from_data(x, y),
            prior=SpikeSlabPrior.from_data(x, y, **prior_kwargs),
            max_flips=max_flips, method=method, mode_jump=mode_jump)

    def init_state(self, key):
        p = self.prior.mean.shape[0]
        k1, k2 = jax.random.split(key)
        pi = jax.nn.sigmoid(self.prior.log_inclusion_odds)
        gamma = jax.random.uniform(k1, (p,)) < jnp.maximum(pi, 2.0 / p)
        sigsq = self.prior.prior_ss / jnp.maximum(self.prior.sigma_df, 1.0)
        return {"gamma": gamma,
                "beta": jnp.zeros(p, self.prior.mean.dtype),
                "sigsq": jnp.asarray(sigsq)}

    def kernel(self):
        if self.method == "sweep":
            from boom_tpu.models.glm.regression_sweep import (
                draw_indicators_swept,
                valid_for_prior,
            )

            # fall back to the Cholesky oracle when the incremental SWEEP
            # path is not exact for this prior (nonzero prior mean on a
            # selectable coordinate)
            draw_ind = (draw_indicators_swept if valid_for_prior(self.prior)
                        else draw_indicators_sweep)
        else:
            draw_ind = draw_indicators_sweep

        qprobs = (screening_proposal_probs(self.suf, self.prior)
                  if self.mode_jump else None)
        swept = self.method == "sweep" and (
            draw_ind is not draw_indicators_sweep)

        def sweep(key, state):
            k0, k1, k2, k3 = jax.random.split(key, 4)
            gamma = state["gamma"]
            if self.mode_jump and swept:
                # cheap path: the jump is evaluated incrementally INSIDE
                # the SWEEP machinery (regression_sweep._mode_jump_swept)
                gamma = draw_ind(k1, self.suf, self.prior, gamma,
                                 self.max_flips, qprobs=qprobs)
            else:
                if self.mode_jump:
                    gamma = mode_jump_move(k0, self.suf, self.prior,
                                           gamma, qprobs)
                gamma = draw_ind(
                    k1, self.suf, self.prior, gamma, self.max_flips)
            sigsq = draw_sigsq(k2, self.suf, self.prior, gamma)
            beta = draw_beta(k3, self.suf, self.prior, gamma, sigsq)
            return {"gamma": gamma, "beta": beta, "sigsq": sigsq}

        return sweep

    @staticmethod
    def simulate(key, n, p, nonzero, sigma=1.0, beta_scale=2.0):
        """Simulate a sparse-regression test problem (the reference test
        fixture pattern, Models/Glm/tests/regression_spike_slab_test.cc)."""
        kx, kb, ke, ks = jax.random.split(key, 4)
        x = jax.random.normal(kx, (n, p))
        x = x.at[:, 0].set(1.0)
        beta = jnp.zeros(p)
        idx = jnp.arange(nonzero)
        vals = beta_scale * jnp.where(
            jax.random.uniform(kb, (nonzero,)) < 0.5, -1.0, 1.0)
        beta = beta.at[idx].set(vals)
        y = x @ beta + sigma * jax.random.normal(ke, (n,))
        return x, y, beta


# ---------------------------------------------------------------------------
# Weighted regression — reference Models/Glm/WeightedRegressionModel.hpp:167
# (WeightedRegSuf at :29 accumulates X'WX / X'Wy / y'Wy / sumw / sumlogw).
# y_i ~ N(x_i' beta, sigsq / w_i). Weighted sufstats ARE plain sufstats
# under the W inner product, so both the plain conjugate Gibbs and the
# full spike-slab machinery apply unchanged.
# ---------------------------------------------------------------------------
def weighted_reg_suf(x, y, weights):
    """RegSuf under the W inner product (X'WX, X'Wy, y'Wy).

    n counts rows with POSITIVE weight, not sum-of-weights: each
    observation contributes exactly one chi^2_1 term
    w_i (y_i - x_i'b)^2 / sigsq to the variance posterior whatever its
    precision weight, while zero-weight rows (the 0/1 masking idiom for
    fixed-shape subsets) drop out entirely."""
    xw = x * weights[:, None]
    return RegSuf(xtx=xw.T @ x, xty=xw.T @ y,
                  yty=jnp.sum(weights * y * y),
                  n=jnp.sum(weights > 0).astype(x.dtype))


@dataclasses.dataclass(frozen=True)
class WeightedRegression:
    """Conjugate Bayesian weighted regression (no variable selection):
    beta | sigsq ~ N(b0, sigsq Omega0^-1) with Omega0 = I/prior_sd^2,
    sigsq ~ ScaledInvChisq(sigma_df, sigma_guess^2). State keys:
    beta [p], sigsq. For weighted SPIKE-SLAB regression use
    ``WeightedRegression.spike(...)`` which returns a standard
    SpikeSlabRegression over the weighted sufstats."""

    suf: RegSuf
    prior_sd: float = 100.0
    sigma_df: float = 1.0
    sigma_guess: float = 1.0

    @staticmethod
    def from_data(x, y, weights, **kw):
        return WeightedRegression(suf=weighted_reg_suf(x, y, weights),
                                  **kw)

    @staticmethod
    def spike(x, y, weights, **prior_kwargs):
        """lm.spike on weighted data: SpikeSlabRegression whose sufstats
        carry the W inner product (the reference composes
        WeightedRegSuf with BregVsSampler the same way)."""
        prior = SpikeSlabPrior.from_data(x, y, **prior_kwargs)
        return SpikeSlabRegression(suf=weighted_reg_suf(x, y, weights),
                                   prior=prior)

    def init_state(self, key):
        p = self.suf.xty.shape[0]
        return {"beta": jnp.zeros((p,), self.suf.xty.dtype),
                "sigsq": jnp.asarray(self.sigma_guess**2,
                                     self.suf.xty.dtype)}

    def kernel(self):
        p = self.suf.xty.shape[0]
        omega0 = jnp.eye(p, dtype=self.suf.xty.dtype) / self.prior_sd**2
        prec = omega0 + self.suf.xtx
        chol = jnp.linalg.cholesky(prec)
        mean = jax.scipy.linalg.cho_solve((chol, True), self.suf.xty)

        def sweep(key, state):
            kb, ks = jax.random.split(key)
            beta = mean + jax.scipy.linalg.solve_triangular(
                chol.T,
                jnp.sqrt(state["sigsq"])
                * jax.random.normal(kb, (p,), mean.dtype),
                lower=False)
            sse = (self.suf.yty - 2.0 * beta @ self.suf.xty
                   + beta @ self.suf.xtx @ beta)
            df = self.sigma_df + self.suf.n
            ss = (self.sigma_df * self.sigma_guess**2
                  + jnp.maximum(sse, 1e-12))
            sigsq = dists.scaled_inv_chisq.sample(ks, df, ss / df)
            return {"beta": beta, "sigsq": sigsq}

        return sweep
