"""Dynamic intercept regression (dirm): multiplexed observations sharing
a state-space intercept plus a static (spike-slab) regression.

Reference: Models/StateSpace/DynamicInterceptRegression.hpp:100
(DynamicInterceptRegressionModel over TimeSeriesRegressionData — a
response VECTOR and predictor MATRIX per time point, sizes varying by t),
its ConditionalIidKalmanFilter, and the R front end
Interfaces/R/bsts/R/dirm.R.

Model: y_{it} = Z_t' alpha_t + x_{it}' beta + eps_{it},
       eps_{it} ~iid N(0, sigma^2),  i = 1..n_t.

TPU-native reduction: because every observation at time t loads the SAME
state combination Z_t' alpha_t and the errors are iid (the reference's
"conditional IID" structure), the per-time sufficient statistic for the
state is the mean residual:

    ybar_t = mean_i (y_{it} - x_{it}' beta) ~ N(Z_t' alpha_t, sigma^2/n_t)

so state imputation is the ordinary SCALAR Kalman simulation smoother
with a time-varying observation variance H_t = sigma^2 / n_t — no
multivariate filter, no Woodbury, and the bench-critical scalar path is
reused unchanged. Data are padded to [T, n_max] with an observed mask
(fixed shapes for jit); times with n_t = 0 are missing observations.
The regression draw is the standard Gaussian SSVS sweep on the flattened
observed residuals (reference arrangement: the dirm regression sigma IS
the observation sigma).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import jax
import jax.numpy as jnp

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
from boom_tpu.statespace.bsts import asis_redraw
from boom_tpu.statespace.bsts import Bsts as _Bsts
from boom_tpu.statespace.kalman import kalman_filter, simulation_smoother


@dataclasses.dataclass(frozen=True)
class DynamicInterceptRegression:
    """dirm: shared dynamic intercept + static spike-slab regression over
    multiplexed observations.

    y: [T, n_max] padded responses.
    predictors: [T, n_max, p] padded predictor rows.
    observed: [T, n_max] bool mask (False = padding / missing).
    blocks: state-model blocks forming the dynamic intercept. Blocks must
      have constant-within-time observation rows (no per-observation Z),
      which covers the dirm R interface's state specifications.
    """

    y: jax.Array
    predictors: jax.Array
    observed: jax.Array
    blocks: Sequence
    reg_prior: SpikeSlabPrior
    reg_max_flips: int | None = None
    asis: bool = True

    @staticmethod
    def from_ragged(y_list, x_list, blocks, reg_prior,
                    **kw):
        """Build from per-time lists of (response vector, predictor
        matrix) — the TimeSeriesRegressionData layout."""
        t_len = len(y_list)
        n_max = max(len(jnp.atleast_1d(y)) for y in y_list)
        p = jnp.asarray(x_list[0]).shape[-1]
        fdt = jnp.result_type(float)
        y_pad = jnp.zeros((t_len, n_max), fdt)
        x_pad = jnp.zeros((t_len, n_max, p), fdt)
        obs = jnp.zeros((t_len, n_max), bool)
        for t, (yt, xt) in enumerate(zip(y_list, x_list)):
            yt = jnp.atleast_1d(jnp.asarray(yt, fdt))
            xt = jnp.atleast_2d(jnp.asarray(xt, fdt))
            n = yt.shape[0]
            y_pad = y_pad.at[t, :n].set(yt)
            x_pad = x_pad.at[t, :n, :].set(xt)
            obs = obs.at[t, :n].set(True)
        return DynamicInterceptRegression(
            y=y_pad, predictors=x_pad, observed=obs, blocks=blocks,
            reg_prior=reg_prior, **kw)

    # composite system assembly is shared with Bsts
    t_len = _Bsts.t_len
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
    def _counts(self):
        return jnp.sum(self.observed, axis=1)

    @property
    def _total_n(self):
        return jnp.sum(self.observed)

    def _xtx(self):
        w = self.observed[..., None].astype(self.predictors.dtype)
        xw = self.predictors * w
        return jnp.einsum("tnp,tnq->pq", xw, self.predictors)

    def _flat_suf(self, resid):
        """RegSuf over all observed (time, obs) pairs of `resid` [T, n]."""
        w = self.observed.astype(resid.dtype)
        rw = resid * w
        xty = jnp.einsum("tnp,tn->p", self.predictors, rw)
        return RegSuf(xtx=self._xtx(), xty=xty,
                      yty=jnp.sum(rw * resid),
                      n=jnp.asarray(self._total_n, resid.dtype))

    def _ybar(self, beta):
        """Per-time mean residual after removing the regression, plus
        the per-time observed flag (n_t > 0)."""
        resid = self.y - self.predictors @ beta
        w = self.observed.astype(resid.dtype)
        n_t = jnp.maximum(jnp.sum(w, 1), 1.0)
        return jnp.sum(resid * w, 1) / n_t, n_t, self._counts > 0

    def init_state(self, key):
        keys = jax.random.split(key, len(self.blocks) + 3)
        block_params = {
            b.name: b.init_params(k) for b, k in zip(self.blocks, keys[3:])}
        yv = jnp.where(self.observed, self.y, jnp.nan)
        var = jnp.nanvar(yv)
        state = {
            "blocks": block_params,
            "sigsq_obs": var * jax.random.uniform(
                keys[1], (), minval=0.1, maxval=0.8),
        }
        p = self.predictors.shape[-1]
        pi = jax.nn.sigmoid(self.reg_prior.log_inclusion_odds)
        state["gamma"] = jax.random.uniform(keys[0], (p,)) < jnp.maximum(
            pi, 2.0 / p)
        state["beta"] = jnp.zeros((p,), self.y.dtype)
        ybar, n_t, obs_t = self._ybar(state["beta"])
        params0 = self.ssm_params(state)
        params0 = params0._replace(h=state["sigsq_obs"] / n_t)
        state["alpha"] = simulation_smoother(keys[2], params0, ybar,
                                             observed=obs_t)
        return state

    def kernel(self):
        draw_ind = (draw_indicators_swept
                    if valid_for_prior(self.reg_prior)
                    else draw_indicators_sweep)
        t_len = self.y.shape[0]

        def sweep(key, state):
            k_state, k_obs, k_blocks, k_asis = jax.random.split(key, 4)
            out = dict(state)
            params_cur = self.ssm_params(state)
            zs_cur = params_cur.zs(t_len)
            state_contrib = jnp.einsum("td,td->t", zs_cur, state["alpha"])

            # 1. regression + sigma draw | current state (SSVS over the
            #    flattened observed residuals)
            k1, k2, k3 = jax.random.split(k_obs, 3)
            suf = self._flat_suf(self.y - state_contrib[:, None])
            gamma = draw_ind(k1, suf, self.reg_prior, state["gamma"],
                             self.reg_max_flips)
            sigsq = draw_sigsq(k2, suf, self.reg_prior, gamma)
            beta = draw_beta(k3, suf, self.reg_prior, gamma, sigsq)
            out["gamma"], out["beta"], out["sigsq_obs"] = gamma, beta, sigsq

            # 2. state-model parameter draws | current path
            new_blocks = {}
            bkeys = jax.random.split(k_blocks, len(self.blocks))
            for (start, dim), b, bk in zip(self._slices(), self.blocks,
                                           bkeys):
                path = jax.lax.dynamic_slice_in_dim(
                    state["alpha"], start, dim, axis=1)
                new_blocks[b.name] = b.draw_params(
                    bk, state["blocks"][b.name], path)
            out["blocks"] = new_blocks

            # 3. impute state: scalar Kalman on the mean residual with
            #    H_t = sigma^2 / n_t (the conditional-IID collapse)
            ybar, n_t, obs_t = self._ybar(beta)
            params = self.ssm_params(out)._replace(h=sigsq / n_t)
            out["alpha"] = simulation_smoother(k_state, params, ybar,
                                               observed=obs_t)

            # 4. ASIS interweaving on the collapsed series
            if self.asis:
                out = asis_redraw(k_asis, self.blocks,
                                  self.ssm_params(out)._replace(
                                      h=sigsq / n_t),
                                  out, ybar, sigsq / n_t)
            return out

        return sweep

    def log_lik(self, state):
        """Exact marginal log-likelihood: the collapsed scalar filter on
        ybar plus the within-time deviation terms (which carry no state
        information but complete the density)."""
        sigsq = state["sigsq_obs"]
        ybar, n_t, obs_t = self._ybar(state["beta"])
        params = self.ssm_params(state)._replace(h=sigsq / n_t)
        ll = kalman_filter(params, ybar, observed=obs_t).loglik
        resid = self.y - self.predictors @ state["beta"]
        w = self.observed.astype(resid.dtype)
        dev = (resid - ybar[:, None]) * w
        ssw = jnp.sum(dev * dev)
        n_eff = jnp.sum(w, 1)
        within = jnp.where(
            obs_t,
            -0.5 * ((n_eff - 1.0) * jnp.log(2.0 * jnp.pi * sigsq)
                    + jnp.log(n_eff)),
            0.0)
        return ll + jnp.sum(within) - 0.5 * ssw / sigsq

    def state_contributions(self, state):
        """Per-block contribution paths {name: [T]} (Bsts analog; the
        regression contribution is per-observation, so it is reported as
        the per-time mean over observed rows)."""
        out = {}
        t_len = state["alpha"].shape[0]
        for (start, dim), b in zip(self._slices(), self.blocks):
            path = state["alpha"][:, start:start + dim]
            if hasattr(b, "z_seq_params"):
                z_b = b.z_seq_params(state["blocks"][b.name], t_len)
                out[b.name] = jnp.einsum("td,td->t", z_b, path)
            elif hasattr(b, "z_seq"):
                out[b.name] = jnp.einsum("td,td->t", b.z_seq(t_len), path)
            else:
                out[b.name] = path @ b.z()
        w = self.observed.astype(state["beta"].dtype)
        n_t = jnp.maximum(jnp.sum(w, 1), 1.0)
        reg = (self.predictors @ state["beta"]) * w
        out["regression"] = jnp.sum(reg, 1) / n_t
        return out

    def predict(self, key, final_state, future_predictors):
        """Simulate one future observation per horizon step.
        future_predictors: [h, p]."""
        future_predictors = jnp.asarray(future_predictors)
        horizon = future_predictors.shape[0]
        params = self.ssm_params(final_state)
        alpha_t = final_state["alpha"][-1]
        q_dim = params.q_mat.shape[0]
        q_chol = jnp.linalg.cholesky(
            params.q_mat + 1e-12 * jnp.eye(q_dim))
        z = params.z if params.z.ndim == 1 else params.z[-1]
        sig = jnp.sqrt(final_state["sigsq_obs"])
        reg = future_predictors @ final_state["beta"]

        def step(alpha, inp):
            k, reg_t = inp
            k_eta, k_eps = jax.random.split(k)
            eta = q_chol @ jax.random.normal(k_eta, (q_dim,))
            alpha_next = params.t_mat @ alpha + params.r_mat @ eta
            y_next = (z @ alpha_next + reg_t
                      + sig * jax.random.normal(k_eps))
            return alpha_next, y_next

        _, ys = jax.lax.scan(
            step, alpha_t, (jax.random.split(key, horizon), reg))
        return ys
