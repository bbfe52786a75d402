"""Non-Gaussian bsts observation families via latent-Gaussian reduction.

Reference: Models/StateSpace/StateSpaceLogitModel.hpp,
StateSpacePoissonModel.hpp, StateSpaceStudentRegressionModel.hpp — all
implemented through the StateSpaceNormalMixture base: impute per-timestep
latent Gaussians (the same data augmentations as the GLM spike-slab
composites), reducing the model to a Gaussian state-space with
heteroscedastic observation variances H_t, then run the ordinary Kalman
simulation-smoother machinery. Their samplers are
StateSpaceLogitPosteriorSampler / StateSpacePoissonPosteriorSampler /
StateSpaceStudentPosteriorSampler (draw = impute_nonstate_latent_data,
observation-model draw, state draws, impute_state —
StateSpacePosteriorSampler.cpp:42-64).

TPU design: the family-specific imputation is one vectorized pass over
the T axis (truncated-logistic / inter-arrival / gamma-weight draws plus
mixture-component categoricals against our EM-fitted tables), the Kalman
pass uses the time-varying-H path of kalman.py, and the optional
regression component uses the shared known-variance SSVS engine with
per-timestep precisions. Poisson's two pseudo-observations per timestep
are collapsed into one by precision weighting (the same collapse the
reference performs in StateSpacePoissonModel::adjusted_observation).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from boom_tpu import dists
from boom_tpu.models.glm import _mixture_tables as tables
from boom_tpu.models.glm.poisson import (
    _neg_log_gamma_table,
    impute_poisson_latent,
)
from boom_tpu.models.glm.logit import impute_logit_latent
from boom_tpu.models.glm.regression import SpikeSlabPrior
from boom_tpu.models.glm.ssvs import (
    WeightedRegSuf,
    kv_draw_beta,
    kv_draw_indicators,
    sample_mixture_indicator,
)
from boom_tpu.inference.kernels.slice import slice_step
from boom_tpu.statespace.bsts import Bsts, asis_redraw
from boom_tpu.statespace.kalman import simulation_smoother
from boom_tpu.statespace.state_models import SdPrior


@dataclasses.dataclass(frozen=True)
class NonGaussianBsts:
    """Structural time series with logit / Poisson / student observations.

    family:
      "logit":   y in {0,1} (Bernoulli; reference StateSpaceLogitModel)
      "poisson": y counts with optional exposure (StateSpacePoissonModel)
      "student": y continuous with t errors (StateSpaceStudentRegressionModel)
    """

    y: jax.Array  # [T]
    blocks: Sequence
    family: str
    predictors: jax.Array | None = None
    reg_prior: SpikeSlabPrior | None = None
    reg_max_flips: int | None = None
    exposure: jax.Array | None = None  # poisson only
    sigma_prior: SdPrior | None = None  # student only
    nu_prior_rate: float = 0.1  # student only
    asis: bool = True

    def __post_init__(self):
        assert self.family in ("logit", "poisson", "student"), self.family
        if self.family == "student" and self.sigma_prior is None:
            sd = float(jnp.std(self.y))
            object.__setattr__(
                self, "sigma_prior",
                SdPrior(sigma_guess=0.5 * sd, sample_size=0.01,
                        upper_limit=2.0 * sd))

    # reuse the Gaussian composite's system assembly
    t_len = Bsts.t_len
    ssm_params = Bsts.ssm_params
    _slices = Bsts._slices
    state_dim = Bsts.state_dim
    _time_varying_z = Bsts._time_varying_z
    _time_varying_q = Bsts._time_varying_q
    _time_varying_t = Bsts._time_varying_t
    # irregular-timestamp fields exist only on the Gaussian path; the
    # latent-Gaussian reductions always see dense pseudo-data
    observed = None
    obs_weights = None
    extra_obs_ss = 0.0
    state_contributions = Bsts.state_contributions

    @property
    def _log_exposure(self):
        if self.exposure is None:
            return jnp.zeros(self.y.shape, jnp.result_type(float))
        return jnp.log(jnp.asarray(self.exposure))

    def init_state(self, key):
        keys = jax.random.split(key, len(self.blocks) + 4)
        block_params = {
            b.name: b.init_params(k) for b, k in zip(self.blocks, keys[4:])}
        t_len = self.y.shape[0]
        state = {
            "blocks": block_params,
            # family-working observation variance placeholder; replaced by
            # the imputation every sweep (used only for ssm_params)
            "sigsq_obs": jnp.ones((), jnp.result_type(float)),
            "alpha": jnp.zeros((t_len, self.state_dim)),
        }
        if self.family == "student":
            state["sigsq_obs"] = jnp.var(self.y) * jax.random.uniform(
                keys[1], (), minval=0.1, maxval=0.8)
            state["nu"] = jnp.asarray(10.0)
        if self.predictors is not None:
            p = self.predictors.shape[1]
            pi = jax.nn.sigmoid(self.reg_prior.log_inclusion_odds)
            state["gamma"] = jax.random.uniform(keys[0], (p,)) < jnp.maximum(
                pi, 2.0 / p)
            state["beta"] = jnp.zeros((p,), jnp.result_type(float))
        # rough latent start: smoother on a working response
        z0 = self._working_response()
        params0 = self.ssm_params(state)
        state["alpha"] = simulation_smoother(keys[2], params0, z0)
        return state

    def _working_response(self):
        if self.family == "logit":
            p = jnp.clip((jnp.asarray(self.y, jnp.result_type(float))
                          + 0.5) / 2.0, 0.05, 0.95)
            return jnp.log(p / (1.0 - p))
        if self.family == "poisson":
            return (jnp.log(jnp.asarray(self.y, jnp.result_type(float))
                            + 0.5) - self._log_exposure)
        return self.y

    # -- family imputation: (pseudo_y, h) given linear predictor ------------
    def _impute(self, key, eta, state):
        if self.family == "logit":
            kz, km = jax.random.split(key)
            z = impute_logit_latent(kz, eta, self.y)
            s_tab = jnp.asarray(tables.LOGISTIC_SDS)
            comp = sample_mixture_indicator(
                km, z - eta, jnp.asarray(tables.LOGISTIC_WEIGHTS),
                jnp.zeros_like(s_tab), s_tab)
            return z, s_tab[comp] ** 2, {}

        if self.family == "poisson":
            kz, k1, k2 = jax.random.split(key, 3)
            log_lam = eta + self._log_exposure
            nlt1, nlt2 = impute_poisson_latent(kz, log_lam, self.y)
            gw = jnp.asarray(tables.GUMBEL_WEIGHTS)
            gm = jnp.asarray(tables.GUMBEL_MEANS)
            gs = jnp.asarray(tables.GUMBEL_SDS)
            c1 = sample_mixture_indicator(k1, nlt1 - log_lam, gw, gm, gs)
            z1 = nlt1 - self._log_exposure - gm[c1]
            v1 = gs[c1] ** 2
            w_tab, m_tab, s_tab = _neg_log_gamma_table(self.y)
            r2 = (nlt2 - log_lam)[..., None]
            lp = (jnp.log(jnp.maximum(w_tab, 1e-300)) - jnp.log(s_tab)
                  - 0.5 * ((r2 - m_tab) / s_tab) ** 2)
            c2 = jax.random.categorical(k2, lp, axis=-1)
            m2 = jnp.take_along_axis(m_tab, c2[..., None], -1)[..., 0]
            s2 = jnp.take_along_axis(s_tab, c2[..., None], -1)[..., 0]
            z2 = nlt2 - self._log_exposure - m2
            # precision-weighted collapse of the two pseudo-observations
            prec = 1.0 / v1 + jnp.where(self.y > 0, 1.0 / s2**2, 0.0)
            num = z1 / v1 + jnp.where(self.y > 0, z2 / s2**2, 0.0)
            return num / prec, 1.0 / prec, {}

        # student
        kw, ks, kn = jax.random.split(key, 3)
        resid = self.y - eta
        sigsq, nu = state["sigsq_obs"], state["nu"]
        w = dists.gamma.sample(
            kw, 0.5 * (nu + 1.0), 0.5 * (nu + resid * resid / sigsq))
        n = resid.shape[0]
        sigsq_new = self.sigma_prior.draw_variance(
            ks, n, jnp.sum(w * resid * resid))

        def nu_logpost(v):
            half = 0.5 * v
            return (n * (half * jnp.log(half)
                         - jax.scipy.special.gammaln(half))
                    + (half - 1.0) * jnp.sum(jnp.log(w))
                    - half * jnp.sum(w) - self.nu_prior_rate * v)

        nu_new = slice_step(kn, nu, nu_logpost, width=2.0,
                            lower=0.5, upper=500.0)
        return self.y, sigsq_new / w, {"sigsq_obs": sigsq_new,
                                       "nu": nu_new}

    # -- Gibbs sweep ---------------------------------------------------------
    def kernel(self):
        has_reg = self.predictors is not None

        def sweep(key, state):
            k_imp, k_obs, k_blocks, k_state, k_asis = jax.random.split(
                key, 5)
            out = dict(state)
            params_cur = self.ssm_params(state)
            t_len = self.y.shape[0]
            zs_cur = params_cur.zs(t_len)
            state_contrib = jnp.einsum("td,td->t", zs_cur, state["alpha"])
            reg_contrib = (self.predictors @ state["beta"]
                           if has_reg else 0.0)

            # 1. family imputation at the current linear predictor
            pseudo_y, h, extras = self._impute(
                k_imp, state_contrib + reg_contrib, state)
            out.update(extras)

            # 2. regression draw | state (known-variance weighted SSVS)
            if has_reg:
                k1, k2 = jax.random.split(k_obs)
                y_reg = pseudo_y - state_contrib
                suf = WeightedRegSuf.from_data(
                    self.predictors, y_reg, 1.0 / h)
                gamma = kv_draw_indicators(
                    k1, suf, self.reg_prior, state["gamma"],
                    self.reg_max_flips)
                beta = kv_draw_beta(k2, suf, self.reg_prior, gamma)
                out["gamma"], out["beta"] = gamma, beta
                reg_contrib = self.predictors @ beta

            # 3. state-model parameter draws | current state path
            new_blocks = {}
            bkeys = jax.random.split(k_blocks, len(self.blocks))
            for (start, dim), b, bk in zip(self._slices(), self.blocks,
                                           bkeys):
                path = jax.lax.dynamic_slice_in_dim(
                    state["alpha"], start, dim, axis=1)
                if getattr(b, "needs_residual", False):
                    # residual on the latent-Gaussian scale with this
                    # block's own contribution added back; h is the
                    # per-timestep imputed variance
                    z_b = jax.lax.dynamic_slice_in_dim(
                        zs_cur, start, dim, axis=1)
                    contrib_b = jnp.einsum("td,td->t", z_b, path)
                    resid_b = (pseudo_y
                               - (reg_contrib if has_reg else 0.0)
                               - state_contrib + contrib_b)
                    new_blocks[b.name] = b.draw_params(
                        bk, state["blocks"][b.name], path,
                        resid=resid_b, h=h)
                else:
                    new_blocks[b.name] = b.draw_params(
                        bk, state["blocks"][b.name], path)
            out["blocks"] = new_blocks

            # 4. impute state on the latent Gaussian series
            y_adj = pseudo_y - (reg_contrib if has_reg else 0.0)
            params = self.ssm_params(out)._replace(h=h)
            out["alpha"] = simulation_smoother(k_state, params, y_adj)

            # 5. ASIS interweaving with heteroscedastic variances
            if self.asis:
                out = asis_redraw(k_asis, self.blocks,
                                  self.ssm_params(out)._replace(h=h),
                                  out, y_adj, h)
            return out

        return sweep

    # -- posterior predictive ------------------------------------------------
    def predict(self, key, final_state, horizon: int, future_predictors=None,
                future_z=None, future_exposure=None):
        """Simulate y_{T+1:T+h} (counts/binary/continuous per family)."""
        k_state, k_obs = jax.random.split(key)
        gauss = Bsts(y=self.y, blocks=self.blocks,
                     obs_prior=SdPrior(1.0))
        st = dict(final_state)
        # Zero the Gaussian observation noise for ALL families: the
        # family-specific observation noise (Bernoulli draw, Poisson draw,
        # or the explicit t noise below) is added afterwards, so letting
        # Bsts.predict add N(0, sigsq_obs) too would double-count it.
        st["sigsq_obs"] = jnp.zeros(())
        eta_state = gauss.predict(k_state, st, horizon, future_z=future_z)
        if self.predictors is not None:
            assert future_predictors is not None
            eta_state = eta_state + future_predictors @ final_state["beta"]
        if self.family == "logit":
            return jnp.asarray(
                jax.random.uniform(k_obs, (horizon,))
                < jax.nn.sigmoid(eta_state), jnp.int32)
        if self.family == "poisson":
            log_e = (jnp.zeros((horizon,)) if future_exposure is None
                     else jnp.log(jnp.asarray(future_exposure)))
            return jax.random.poisson(k_obs, jnp.exp(eta_state + log_e))
        t_noise = jax.random.t(k_obs, final_state["nu"], (horizon,))
        return eta_state + jnp.sqrt(final_state["sigsq_obs"]) * t_noise
