"""Tensor-parallel spike-and-slab regression: the design matrix sharded
by COLUMNS over a device-mesh axis (SURVEY.md §2.8 "shard large GLM
design matrices (n or p) over mesh for BigAssSpikeSlab-scale problems";
reference scale-out points: BregVsSampler.cpp:252/:353 and python
spikeslab.BigAssSpikeSlab, spikeslab.py:814).

Regime: p far too large for a replicated [p, p] XtX. Invariants:

  * X is column-sharded: each device holds x_local [n, p_local]
    (y replicated — shard n over a separate 'data' axis if needed).
  * The active set is capped at S slots (BigAss-style): the state is a
    replicated slot list gamma_idx [S] (p = empty) + slot betas, so all
    devices agree on the current model.
  * The only cross-device traffic per flip is gathering one candidate
    column ([n] psum from its owner) and, once per sweep, the active
    columns ([n, S] masked psum). Everything [p]-sized stays sharded;
    everything dense is [S]-sized.
  * Flip decisions replay the exact two-point Gibbs of the dense
    sampler (regression.log_model_prob on the gathered S+1 subproblem),
    so the kernel is statistically IDENTICAL to the single-device
    sampler restricted to |model| <= S — tested by the CPU-mesh
    equivalence test.

The prior must be separable for this path: diagonal slab precision and
zero prior mean (the BigAss case; a dense [p, p] Omega is incompatible
with column sharding by definition).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from boom_tpu.models.glm.regression import (
    RegSuf,
    SpikeSlabPrior,
    log_model_prob,
    reg_post_params,
)
from boom_tpu import dists


@dataclasses.dataclass(frozen=True)
class TpSpikeSlabConfig:
    p_total: int
    max_size: int  # S: active-set cap (BigAss candidate budget)
    num_flips: int = 16
    omega_diag_value: float = 1.0  # slab precision (diagonal)
    log_odds: float = -4.0  # prior inclusion log-odds per variable
    sigma_df: float = 0.01
    prior_ss: float = 0.01
    axis_name: str = "tp"


def _gather_column(x_local, j, p_local, axis_name):
    """Fetch global column j from its owning shard ([n] psum)."""
    shard = jax.lax.axis_index(axis_name)
    local_j = j - shard * p_local
    mine = (local_j >= 0) & (local_j < p_local)
    col = jnp.where(
        mine,
        jax.lax.dynamic_index_in_dim(
            x_local, jnp.clip(local_j, 0, p_local - 1), axis=1,
            keepdims=False),
        jnp.zeros((x_local.shape[0],), x_local.dtype))
    return jax.lax.psum(col, axis_name)


def _gather_active(x_local, gamma_idx, p_total, p_local, axis_name):
    """[n, S] active columns via one masked psum."""
    shard = jax.lax.axis_index(axis_name)
    local_idx = gamma_idx - shard * p_local
    mine = (local_idx >= 0) & (local_idx < p_local) & (
        gamma_idx < p_total)
    cols = jnp.take(x_local, jnp.clip(local_idx, 0, p_local - 1),
                    axis=1)  # [n, S]
    cols = jnp.where(mine[None, :], cols, 0.0)
    return jax.lax.psum(cols, axis_name)


def _slot_prior(cfg: TpSpikeSlabConfig, s_plus: int, dtype):
    return SpikeSlabPrior(
        mean=jnp.zeros((s_plus,), dtype),
        unscaled_precision=cfg.omega_diag_value * jnp.eye(s_plus, dtype=dtype),
        log_inclusion_odds=jnp.full((s_plus,), cfg.log_odds, dtype),
        log_inclusion_norm=jnp.zeros((), dtype),
        sigma_df=jnp.asarray(cfg.sigma_df, dtype),
        prior_ss=jnp.asarray(cfg.prior_ss, dtype),
    )


def make_tp_ssvs_kernel(x_local, y, cfg: TpSpikeSlabConfig):
    """Kernel over state {gamma_idx [S] int32 (p_total = empty),
    beta [S], sigsq}. Must run inside shard_map over cfg.axis_name with
    x_local sharded on columns and y/state replicated."""
    n, p_local = x_local.shape
    p, s = cfg.p_total, cfg.max_size
    yty = y @ y
    dt = x_local.dtype
    prior = _slot_prior(cfg, s + 1, dt)

    def subproblem(xg_ext):
        """RegSuf of the [n, S+1] gathered columns."""
        return RegSuf(xtx=xg_ext.T @ xg_ext, xty=xg_ext.T @ y,
                      yty=jnp.asarray(yty, dt),
                      n=jnp.asarray(n, dt))

    def kernel(key, state):
        gamma_idx = state["gamma_idx"]
        xg = _gather_active(x_local, gamma_idx, p, p_local,
                            cfg.axis_name)  # [n, S]
        k_flips, k_sig, k_beta = jax.random.split(key, 3)

        def one_flip(carry, k):
            gamma_idx, xg = carry
            kj, ka = jax.random.split(k)
            j = jax.random.randint(kj, (), 0, p)  # replicated draw
            col = _gather_column(x_local, j, p_local, cfg.axis_name)
            occupied = gamma_idx < p
            in_slot = jnp.where(gamma_idx == j, True, False)
            is_member = jnp.any(in_slot)
            member_slot = jnp.argmax(in_slot)
            first_free = jnp.argmax(~occupied)
            has_free = jnp.any(~occupied)
            # candidate occupies its own slot (member) or the first
            # free slot; with no free slot an addition is rejected
            # (the max_size cap, prior.spike_logp's -inf arm)
            slot = jnp.where(is_member, member_slot, first_free)
            xg_ext = jnp.concatenate([xg, jnp.zeros((n, 1), dt)], 1)
            xg_ext = xg_ext.at[:, slot].set(col)
            suf = subproblem(xg_ext)
            base_mask = jnp.concatenate(
                [occupied, jnp.zeros((1,), bool)])
            mask_in = base_mask.at[slot].set(True)
            mask_out = base_mask.at[slot].set(False)
            lp_in = log_model_prob(suf, prior, mask_in)
            lp_out = log_model_prob(suf, prior, mask_out)
            # exact two-point conditional; global prior correction for
            # the (p - S) never-active variables cancels in the diff
            take_in = (jnp.log(jax.random.uniform(ka, (), dt))
                       < jax.nn.log_sigmoid(lp_in - lp_out))
            # no-op when the cap is hit and j is not already active
            acted = is_member | has_free
            take_in = take_in & acted
            new_idx = jnp.where(acted, jnp.where(take_in, j, p),
                                gamma_idx[slot])
            gamma_idx = gamma_idx.at[slot].set(new_idx)
            new_col = jnp.where(acted,
                                jnp.where(take_in, col, 0.0),
                                xg[:, slot])
            xg = xg.at[:, slot].set(new_col)
            return (gamma_idx, xg), None

        (gamma_idx, xg), _ = jax.lax.scan(
            one_flip, (gamma_idx, xg),
            jax.random.split(k_flips, cfg.num_flips))

        # sigma^2 and beta on the final active set (reference
        # draw_sigma/draw_beta, BregVsSampler.cpp:313/:326)
        xg_ext = jnp.concatenate([xg, jnp.zeros((n, 1), dt)], 1)
        suf = subproblem(xg_ext)
        mask = jnp.concatenate([gamma_idx < p, jnp.zeros((1,), bool)])
        post = reg_post_params(suf, prior, mask)
        sigsq = dists.scaled_inv_chisq.sample(k_sig, post.df,
                                              post.ss / post.df)
        m = jnp.asarray(mask, dt)
        z = jax.random.normal(k_beta, (s + 1,), dt) * m
        extra = jax.scipy.linalg.solve_triangular(
            post.chol.T, z, lower=False)
        beta = (post.beta_tilde + jnp.sqrt(sigsq) * extra * m)[:s]
        return {"gamma_idx": gamma_idx, "beta": beta, "sigsq": sigsq}

    return kernel


def init_tp_state(key, cfg: TpSpikeSlabConfig, dtype=None):
    dtype = dtype or jnp.result_type(float)
    return {
        "gamma_idx": jnp.full((cfg.max_size,), cfg.p_total, jnp.int32),
        "beta": jnp.zeros((cfg.max_size,), dtype),
        "sigsq": jnp.ones((), dtype),
    }


def dense_beta(state, p_total):
    """Scatter slot betas back to a dense [p] vector (analysis)."""
    idx = jnp.clip(state["gamma_idx"], 0, p_total)
    out = jnp.zeros((p_total + 1,), state["beta"].dtype)
    out = out.at[idx].add(state["beta"])
    return out[:p_total]
