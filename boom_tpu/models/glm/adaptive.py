"""Adaptive birth/death spike-slab moves and large-p screening.

Reference: Models/Glm/PosteriorSamplers/
AdaptiveSpikeSlabRegressionSampler.hpp:39 (birth/death MH whose
per-variable proposal rates adapt to running inclusion counts — cheaper
than the full BregVsSampler sweep when p is large) and
BigAssSpikeSlabSampler (candidate screening before the sweep for very
large p; python front end spikeslab.BigAssSpikeSlab, spikeslab.py:814).

TPU form: one birth/death step costs ONE masked Cholesky instead of p
of them, and the adaptive weights live in the chain state (scan-carried,
exactly the reference's bookkeeping). Screening is a correlation filter
producing a fixed-size candidate set; the restricted model reuses the
ordinary machinery on the compressed design.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from boom_tpu.models.glm.regression import (
    RegSuf,
    SpikeSlabPrior,
    draw_beta,
    draw_sigsq,
    log_model_prob,
)


def birth_death_step(key, suf: RegSuf, prior: SpikeSlabPrior, mask,
                     birth_weights, death_weights):
    """One adaptive birth/death MH move (reference
    AdaptiveSpikeSlabRegressionSampler::draw_model_indicators).

    birth_weights/death_weights: positive per-variable proposal weights
    (adapted outside). Returns (new_mask, accepted, was_birth)."""
    k_dir, k_pick, k_acc = jax.random.split(key, 3)
    p = mask.shape[-1]
    n_in = jnp.sum(mask)
    n_out = p - n_in
    # choose birth vs death (forced when one side is empty)
    do_birth = (jax.random.uniform(k_dir, ()) < 0.5) | (n_in == 0)
    do_birth = do_birth & (n_out > 0)

    bw = jnp.where(mask, 0.0, birth_weights)
    dw = jnp.where(mask, death_weights, 0.0)
    logits = jnp.where(do_birth, jnp.log(jnp.clip(bw, 1e-300, None)),
                       jnp.log(jnp.clip(dw, 1e-300, None)))
    j = jax.random.categorical(k_pick, logits)
    flipped = mask.at[j].set(~mask[j])

    logp_cur = log_model_prob(suf, prior, mask)
    logp_new = log_model_prob(suf, prior, flipped)
    # proposal correction: q(reverse)/q(forward)
    bw_sum = jnp.sum(bw)
    dw_sum = jnp.sum(dw)
    bw_new = jnp.where(flipped, 0.0, birth_weights)
    dw_new = jnp.where(flipped, death_weights, 0.0)
    q_fwd = jnp.where(do_birth, bw[j] / jnp.maximum(bw_sum, 1e-300),
                      dw[j] / jnp.maximum(dw_sum, 1e-300))
    q_rev = jnp.where(do_birth,
                      dw_new[j] / jnp.maximum(jnp.sum(dw_new), 1e-300),
                      bw_new[j] / jnp.maximum(jnp.sum(bw_new), 1e-300))
    log_alpha = (logp_new - logp_cur
                 + jnp.log(jnp.clip(q_rev, 1e-300, None))
                 - jnp.log(jnp.clip(q_fwd, 1e-300, None)))
    accept = jnp.log(jax.random.uniform(k_acc, ())) < log_alpha
    return jnp.where(accept, flipped, mask), accept, do_birth


@dataclasses.dataclass(frozen=True)
class AdaptiveSpikeSlabRegression:
    """lm.spike with adaptive birth/death indicator moves. State:
    gamma, beta, sigsq, plus the adaptive weights (inclusion counts)."""

    suf: RegSuf
    prior: SpikeSlabPrior
    steps_per_sweep: int = 10
    adapt_rate: float = 0.05

    @staticmethod
    def from_data(x, y, steps_per_sweep=10, **prior_kw):
        return AdaptiveSpikeSlabRegression(
            suf=RegSuf.from_data(x, y),
            prior=SpikeSlabPrior.from_data(x, y, **prior_kw),
            steps_per_sweep=steps_per_sweep)

    def init_state(self, key):
        p = self.prior.mean.shape[0]
        pi = jax.nn.sigmoid(self.prior.log_inclusion_odds)
        gamma = jax.random.uniform(key, (p,)) < jnp.maximum(pi, 2.0 / p)
        sigsq = self.prior.prior_ss / jnp.maximum(self.prior.sigma_df,
                                                  1.0)
        return {"gamma": gamma,
                "beta": jnp.zeros((p,), self.prior.mean.dtype),
                "sigsq": jnp.asarray(sigsq),
                "birth_w": jnp.ones((p,)),
                "death_w": jnp.ones((p,))}

    def kernel(self):
        def sweep(key, state):
            k_bd, k_sig, k_beta = jax.random.split(key, 3)

            def one(carry, k):
                mask, bw, dw = carry
                mask, accept, was_birth = birth_death_step(
                    k, self.suf, self.prior, mask, bw, dw)
                # adapt: variables currently included become better birth
                # candidates over time (running inclusion frequency; the
                # reference's rate bookkeeping)
                m = jnp.asarray(mask, bw.dtype)
                bw = (1.0 - self.adapt_rate) * bw + self.adapt_rate * (
                    0.5 + m)
                dw = (1.0 - self.adapt_rate) * dw + self.adapt_rate * (
                    1.5 - m)
                return (mask, bw, dw), accept

            (gamma, bw, dw), accepts = jax.lax.scan(
                one, (state["gamma"], state["birth_w"],
                      state["death_w"]),
                jax.random.split(k_bd, self.steps_per_sweep))
            sigsq = draw_sigsq(k_sig, self.suf, self.prior, gamma)
            beta = draw_beta(k_beta, self.suf, self.prior, gamma, sigsq)
            return {"gamma": gamma, "beta": beta, "sigsq": sigsq,
                    "birth_w": bw, "death_w": dw}

        return sweep


def screen_candidates(x, y, max_candidates: int):
    """Correlation screening for very large p (the reference's
    BigAssSpikeSlabSampler candidate filter): keep the max_candidates
    columns with the largest |cor(x_j, y)|, always keeping column 0
    (intercept). Returns sorted candidate indices."""
    xc = x - jnp.mean(x, 0)
    yc = y - jnp.mean(y)
    sd = jnp.std(x, 0) + 1e-12
    cor = jnp.abs(xc.T @ yc) / (sd * jnp.std(y) * x.shape[0])
    cor = cor.at[0].set(jnp.inf)  # keep intercept
    idx = jnp.argsort(-cor)[:max_candidates]
    return jnp.sort(idx)


@dataclasses.dataclass(frozen=True)
class BigAssSpikeSlab:
    """Large-p spike-slab: screen to a fixed candidate set, run the
    ordinary SSVS machinery on the compressed design (reference
    spikeslab.BigAssSpikeSlab, spikeslab.py:814). Coefficients off the
    candidate set are exact zeros."""

    x: jax.Array
    y: jax.Array
    candidates: jax.Array  # [C] sorted column indices
    inner: "object"  # SpikeSlabRegression on the compressed design

    @staticmethod
    def from_data(x, y, max_candidates=200, **prior_kw):
        from boom_tpu.models.glm.regression import SpikeSlabRegression

        cand = screen_candidates(x, y, max_candidates)
        x_sub = x[:, cand]
        inner = SpikeSlabRegression.from_data(x_sub, y, **prior_kw)
        return BigAssSpikeSlab(x=x, y=y, candidates=cand, inner=inner)

    def init_state(self, key):
        return self.inner.init_state(key)

    def kernel(self):
        return self.inner.kernel()

    def expand_beta(self, beta_sub):
        """Map compressed beta draws back to full-p coordinates."""
        p = self.x.shape[1]
        out = jnp.zeros(beta_sub.shape[:-1] + (p,), beta_sub.dtype)
        return out.at[..., self.candidates].set(beta_sub)
