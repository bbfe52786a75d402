"""Mixed-frequency state-space regression: a model that evolves on a fine
time scale (weeks) but is observed as coarse-scale aggregates (monthly
totals).

Reference: Models/StateSpace/AggregatedStateSpaceRegression.hpp:249 over
FineNowcastingData (x, coarse_observation, contains_end,
fraction_of_value_in_initial_period), with the R front end
bsts/R/mixed.frequency.R. The reference augments the state with
cumulator variables (w_t, W_t) and runs a Kalman filter whose transition
matrix depends on Z_{t+1} (AccumulatorTransitionMatrix) — a
parameter-dependent, time-varying transition.

TPU-native redesign: keep the state small and static. The fine-scale
series w_{1:T} (with w_t = Z_t'alpha_t + x_t'beta + eps_t) is treated as
latent data; the coarse totals are EXACT linear functionals Y = C w with
a static aggregation matrix C built from the month-membership /
fraction-in-initial-period data. The Gibbs sweep alternates:

  1. w | Y, params, alpha: draw w0 ~ N(mu, sigma^2 I) unconditionally,
     then project onto the constraint set:
         w = w0 + C' (C C')^{-1} (Y - C w0)
     (exact conditional of an iid Gaussian on disjoint-or-overlapping
     weighted sums; sigma^2 cancels, and C C' is a tiny [M, M] SPD
     matrix precomputed once).
  2. params, alpha | w: the ordinary Bsts sweep on the now-"observed"
     fine-scale series w (spike-slab regression draw, state-model
     draws, simulation smoother, ASIS interweaving).

This is equivalent in distribution to the reference's cumulator
formulation but keeps the Kalman system static, which is what the TPU
scan wants.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from boom_tpu.models.glm.regression import (
    RegSuf,
    SpikeSlabPrior,
    draw_beta,
    draw_indicators_sweep,
    draw_sigsq,
)
from boom_tpu.models.glm.regression_sweep import (
    draw_indicators_swept,
    valid_for_prior,
)
from boom_tpu.statespace.bsts import Bsts as _Bsts
from boom_tpu.statespace.bsts import asis_redraw
from boom_tpu.statespace.kalman import simulation_smoother
from boom_tpu.statespace.state_models import SdPrior


def build_aggregation_matrix(which_coarse, fraction=None):
    """[M, T] aggregation weights from FineNowcastingData-style inputs.

    which_coarse: [T] int, the coarse period containing the START of
      fine period t (0-based, nondecreasing).
    fraction: [T] in (0, 1], share of fine period t's output belonging
      to that coarse period; the remainder (1 - fraction) spills into
      the next coarse period (reference
      fraction_of_value_in_initial_period). Default all 1.
    """
    which_coarse = np.asarray(which_coarse)
    t_len = which_coarse.shape[0]
    fraction = (np.ones(t_len) if fraction is None
                else np.asarray(fraction, float))
    m = int(which_coarse.max()) + 1
    c = np.zeros((m, t_len))
    for t in range(t_len):
        w = which_coarse[t]
        c[w, t] += fraction[t]
        if fraction[t] < 1.0 and w + 1 < m:
            c[w + 1, t] += 1.0 - fraction[t]
    return jnp.asarray(c)


@dataclasses.dataclass(frozen=True)
class MixedFrequencyRegression:
    """Fine-scale structural time series + regression, observed as
    coarse aggregates.

    coarse_y: [M] observed coarse totals. Rows of `agg` must correspond;
      drop unobserved coarse periods before constructing (their fine
      values are simply unconstrained).
    agg: [M, T] aggregation weight matrix (build_aggregation_matrix).
    predictors: optional [T, p] fine-scale design matrix (spike-slab).
    blocks: state-model blocks for the fine-scale latent series.
    obs_prior: SdPrior on the fine-scale observation sd (used when no
      regression; with a regression the spike-slab sigma is the
      observation sigma, as in Bsts).
    """

    coarse_y: jax.Array
    agg: jax.Array
    blocks: Sequence
    predictors: jax.Array | None = None
    reg_prior: SpikeSlabPrior | None = None
    obs_prior: SdPrior | None = None
    reg_max_flips: int | None = None
    asis: bool = True

    def __post_init__(self):
        if self.obs_prior is None and self.reg_prior is None:
            # scale guess from the implied per-fine-period magnitude
            per_fine = float(jnp.mean(self.coarse_y)
                             / jnp.maximum(jnp.mean(jnp.sum(self.agg, 1)),
                                           1.0))
            sd = max(abs(per_fine), 1.0)
            object.__setattr__(
                self, "obs_prior",
                SdPrior(sigma_guess=0.5 * sd, sample_size=0.01))

    @property
    def t_len(self):
        return self.agg.shape[1]

    # composite system assembly shared with Bsts
    ssm_params = _Bsts.ssm_params
    _slices = _Bsts._slices
    state_dim = _Bsts.state_dim
    _time_varying_z = _Bsts._time_varying_z
    _time_varying_q = _Bsts._time_varying_q
    _time_varying_t = _Bsts._time_varying_t
    # Bsts.ssm_params consults obs_weights (Gaussian irregular-timestamp
    # path); this model has its own multiplexed-observation machinery
    obs_weights = None

    @property
    def _cct(self):
        c = self.agg
        return c @ c.T + 1e-10 * jnp.eye(c.shape[0], dtype=c.dtype)

    def _condition_on_totals(self, w0):
        """Project an unconditional draw onto {w : C w = Y}."""
        resid = self.coarse_y - self.agg @ w0
        lam = jnp.linalg.solve(self._cct, resid)
        return w0 + self.agg.T @ lam

    def _draw_w(self, key, mu, sigsq):
        w0 = mu + jnp.sqrt(sigsq) * jax.random.normal(
            key, (self.t_len,), mu.dtype)
        return self._condition_on_totals(w0)

    def init_state(self, key):
        keys = jax.random.split(key, len(self.blocks) + 4)
        block_params = {
            b.name: b.init_params(k) for b, k in zip(self.blocks, keys[4:])}
        # least-norm fine series consistent with the totals as a start
        w = self.agg.T @ jnp.linalg.solve(self._cct, self.coarse_y)
        denom = jnp.sum(self.agg, 0)
        w = jnp.where(denom > 0, w, jnp.mean(self.coarse_y)
                      / jnp.maximum(jnp.mean(jnp.sum(self.agg, 1)), 1.0))
        var = jnp.maximum(jnp.var(w), 1e-6)
        state = {
            "blocks": block_params,
            "sigsq_obs": var * jax.random.uniform(
                keys[1], (), minval=0.1, maxval=0.8),
            "w": w,
        }
        if self.predictors is not None:
            p = self.predictors.shape[1]
            pi = jax.nn.sigmoid(self.reg_prior.log_inclusion_odds)
            state["gamma"] = jax.random.uniform(
                keys[0], (p,)) < jnp.maximum(pi, 2.0 / p)
            state["beta"] = jnp.zeros((p,), w.dtype)
        params0 = self.ssm_params(state)
        state["alpha"] = simulation_smoother(keys[2], params0, w)
        return state

    def kernel(self):
        has_reg = self.predictors is not None
        if has_reg:
            xtx = self.predictors.T @ self.predictors
            draw_ind = (draw_indicators_swept
                        if valid_for_prior(self.reg_prior)
                        else draw_indicators_sweep)

        def sweep(key, state):
            k_w, k_state, k_obs, k_blocks, k_asis = jax.random.split(
                key, 5)
            out = dict(state)
            params_cur = self.ssm_params(state)
            zs_cur = params_cur.zs(self.t_len)
            state_contrib = jnp.einsum("td,td->t", zs_cur, state["alpha"])
            reg_contrib = (self.predictors @ state["beta"]
                           if has_reg else 0.0)

            # 1. latent fine series | coarse totals, params, alpha
            w = self._draw_w(k_w, state_contrib + reg_contrib,
                             state["sigsq_obs"])
            out["w"] = w

            # 2. observation model | w, alpha (standard Bsts arrangement)
            if has_reg:
                k1, k2, k3 = jax.random.split(k_obs, 3)
                y_reg = w - state_contrib
                suf = RegSuf(xtx=xtx, xty=self.predictors.T @ y_reg,
                             yty=y_reg @ y_reg,
                             n=jnp.asarray(self.t_len, y_reg.dtype))
                gamma = draw_ind(k1, suf, self.reg_prior, state["gamma"],
                                 self.reg_max_flips)
                sigsq = draw_sigsq(k2, suf, self.reg_prior, gamma)
                beta = draw_beta(k3, suf, self.reg_prior, gamma, sigsq)
                out["gamma"], out["beta"] = gamma, beta
                out["sigsq_obs"] = sigsq
                reg_contrib = self.predictors @ beta
            else:
                resid = w - state_contrib
                out["sigsq_obs"] = self.obs_prior.draw_variance(
                    k_obs, resid.shape[0], jnp.sum(resid * resid))

            # 3. state-model parameter draws | current path
            new_blocks = {}
            bkeys = jax.random.split(k_blocks, len(self.blocks))
            for (start, dim), b, bk in zip(self._slices(), self.blocks,
                                           bkeys):
                path = jax.lax.dynamic_slice_in_dim(
                    state["alpha"], start, dim, axis=1)
                new_blocks[b.name] = b.draw_params(
                    bk, state["blocks"][b.name], path)
            out["blocks"] = new_blocks

            # 4. impute state on the fine series
            y_adj = w - (reg_contrib if has_reg else 0.0)
            params = self.ssm_params(out)
            out["alpha"] = simulation_smoother(k_state, params, y_adj)

            # 5. ASIS interweaving
            if self.asis:
                out = asis_redraw(k_asis, self.blocks,
                                  self.ssm_params(out), out, y_adj,
                                  out["sigsq_obs"])
            return out

        return sweep

    def state_contributions(self, state):
        out = {}
        t_len = self.t_len
        for (start, dim), b in zip(self._slices(), self.blocks):
            path = state["alpha"][:, start:start + dim]
            if hasattr(b, "z_seq_params"):
                z_b = b.z_seq_params(state["blocks"][b.name], t_len)
                out[b.name] = jnp.einsum("td,td->t", z_b, path)
            elif hasattr(b, "z_seq"):
                out[b.name] = jnp.einsum("td,td->t", b.z_seq(t_len), path)
            else:
                out[b.name] = path @ b.z()
        if self.predictors is not None:
            out["regression"] = self.predictors @ state["beta"]
        return out

    def predict(self, key, final_state, horizon: int,
                future_predictors=None, future_agg=None):
        """Simulate future fine-scale values w_{T+1:T+h}; if future_agg
        [Mf, h] is given, also return the coarse aggregates."""
        params = self.ssm_params(final_state)
        alpha_t = final_state["alpha"][-1]
        q_dim = params.q_mat.shape[0]
        q_chol = jnp.linalg.cholesky(
            params.q_mat + 1e-12 * jnp.eye(q_dim))
        z = params.z if params.z.ndim == 1 else params.z[-1]
        sig = jnp.sqrt(final_state["sigsq_obs"])
        reg = (jnp.asarray(future_predictors) @ final_state["beta"]
               if self.predictors is not None else jnp.zeros((horizon,)))

        def step(alpha, inp):
            k, reg_t = inp
            k_eta, k_eps = jax.random.split(k)
            eta = q_chol @ jax.random.normal(k_eta, (q_dim,))
            alpha_next = params.t_mat @ alpha + params.r_mat @ eta
            w_next = (z @ alpha_next + reg_t
                      + sig * jax.random.normal(k_eps))
            return alpha_next, w_next

        _, ws = jax.lax.scan(
            step, alpha_t, (jax.random.split(key, horizon), reg))
        if future_agg is not None:
            return ws, jnp.asarray(future_agg) @ ws
        return ws
