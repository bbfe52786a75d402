"""Multivariate state space (mbsts): shared-factor model over K series.

Reference: Models/StateSpace/Multivariate/
MultivariateStateSpaceRegressionModel.hpp:137 (the engine of the R
`mbsts` package: K series share low-dimensional state through a loadings
("observation coefficients") matrix, plus per-series spike-slab
regression and per-series observation variances),
StateModels/SharedLocalLevel.hpp (shared random-walk factors with
identification constraints on the loadings), and the multivariate
filters in Models/StateSpace/Filters (ConditionallyIndependentKalman
Filter — diagonal observation error).

Model:
    y_t = Lambda alpha_t + B x_t + eps_t,   eps ~ N(0, diag(sigsq_k))
    alpha_{t+1} = alpha_t + eta_t,          eta ~ N(0, diag(q_j))
    Lambda lower-triangular-constrained (Lambda[j, j] free, Lambda[k, j]
    = 0 for k < j) for factor identification, unit innovation scale per
    factor absorbed into Lambda is avoided by fixing q_j priors.

Gibbs sweep (the MultivariateStateSpacePosteriorSampler blocking):
    1. per-series spike-slab regression on y_k - (Lambda alpha)_k
    2. loadings rows | alpha (conjugate Gaussian, masked constraint)
    3. factor innovation variances | alpha
    4. per-series sigsq | residuals
    5. alpha | everything  (vector-observation Durbin-Koopman smoother)

TPU notes: the filter is a lax.scan whose per-step work is [K, J] x
[J, J] GEMMs (MXU); the K-dim innovation solve is a Cholesky of the
[K, K] predictive covariance. Everything vmaps over chains.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from boom_tpu import dists
from boom_tpu.models.glm.regression import SpikeSlabPrior
from boom_tpu.models.glm.ssvs import (
    WeightedRegSuf,
    kv_draw_beta,
    kv_draw_indicators,
)
from boom_tpu.statespace.state_models import SdPrior


class MvSsmParams(NamedTuple):
    """Vector-observation linear-Gaussian system with diagonal H."""

    z: jax.Array  # [K, d] observation matrix
    t_mat: jax.Array  # [d, d]
    r_mat: jax.Array  # [d, q]
    q_mat: jax.Array  # [q, q]
    h_diag: jax.Array  # [K] or [T, K] observation variances (a [T, K]
    # H carries the latent student-t weights of the heteroscedastic
    # reduction, reference StudentMvssRegressionModel)
    a0: jax.Array  # [d]
    p0: jax.Array  # [d, d]

    @property
    def rqr(self):
        return self.r_mat @ self.q_mat @ self.r_mat.T

    def hs(self, t_len):
        """[T, K] per-time observation variances."""
        if self.h_diag.ndim == 2:
            return self.h_diag
        return jnp.broadcast_to(self.h_diag,
                                (t_len, self.h_diag.shape[0]))


class MvFilterResult(NamedTuple):
    loglik: jax.Array
    v: jax.Array  # [T, K]
    finv_v: jax.Array  # [T, K]  F^{-1} v
    k_gain: jax.Array  # [T, d, K]
    a: jax.Array  # [T, d]
    p: jax.Array  # [T, d, d]


def mv_kalman_filter(params: MvSsmParams, y, observed=None):
    """Vector-observation Kalman filter (reference
    ConditionallyIndependentKalmanFilter). `observed`: [T, K] bool."""
    t_len, k_dim = y.shape
    if observed is None:
        observed = jnp.ones((t_len, k_dim), bool)
    dtype = params.t_mat.dtype
    rqr = params.rqr
    z = params.z

    def step(carry, inp):
        a, p = carry
        y_t, obs_t, h_t = inp
        v = jnp.where(obs_t, y_t - z @ a, 0.0)
        pz = p @ z.T  # [d, K]
        # missing obs: infinite variance == drop row; implement by huge h
        h_eff = jnp.where(obs_t, h_t, 1e12)
        f = z @ pz + jnp.diag(h_eff)
        f = 0.5 * (f + f.T)
        chol = jnp.linalg.cholesky(f)
        finv_v = jax.scipy.linalg.cho_solve((chol, True), v)
        k_gain = params.t_mat @ jax.scipy.linalg.cho_solve(
            (chol, True), pz.T).T  # [d, K]
        a_next = params.t_mat @ a + k_gain @ v
        l_mat = params.t_mat - k_gain @ z
        p_next = params.t_mat @ p @ l_mat.T + rqr
        p_next = 0.5 * (p_next + p_next.T)
        n_obs = jnp.sum(obs_t)
        logdet = 2.0 * jnp.sum(
            jnp.where(obs_t, jnp.log(jnp.diagonal(chol)), 0.0))
        ll = -0.5 * (n_obs * jnp.log(2.0 * jnp.pi) + logdet + v @ finv_v)
        return (a_next, p_next), (v, finv_v, k_gain, a, p, ll)

    (_, _), (v, finv_v, k_gain, a, p, ll) = jax.lax.scan(
        step, (params.a0.astype(dtype), params.p0.astype(dtype)),
        (y.astype(dtype), observed, params.hs(t_len).astype(dtype)))
    return MvFilterResult(loglik=ll.sum(), v=v, finv_v=finv_v,
                          k_gain=k_gain, a=a, p=p)


def mv_fast_state_smoother(params: MvSsmParams, filt: MvFilterResult):
    """Koopman fast smoother for the vector-observation system."""
    z = params.z
    rqr = params.rqr

    def bstep(r, inp):
        finv_v, k_gain = inp
        l_mat = params.t_mat - k_gain @ z
        r_prev = z.T @ finv_v + l_mat.T @ r
        return r_prev, r_prev

    zero_r = jnp.zeros_like(params.a0)
    _, rs = jax.lax.scan(bstep, zero_r, (filt.finv_v, filt.k_gain),
                         reverse=True)
    alpha0 = filt.a[0] + filt.p[0] @ rs[0]

    def fstep(alpha, r_t):
        alpha_next = params.t_mat @ alpha + rqr @ r_t
        return alpha_next, alpha_next

    _, alphas = jax.lax.scan(fstep, alpha0, rs[1:])
    return jnp.concatenate([alpha0[None], alphas], axis=0)


def mv_simulate(key, params: MvSsmParams, t_len: int):
    k0, ka, ke = jax.random.split(key, 3)
    dtype = params.t_mat.dtype
    d = params.a0.shape[0]
    p0c = jnp.linalg.cholesky(params.p0 + 1e-12 * jnp.eye(d, dtype=dtype))
    alpha1 = params.a0 + p0c @ jax.random.normal(k0, (d,), dtype)
    q_dim = params.q_mat.shape[0]
    qc = jnp.linalg.cholesky(
        params.q_mat + 1e-12 * jnp.eye(q_dim, dtype=dtype))

    def step(alpha, k):
        eta = qc @ jax.random.normal(k, (q_dim,), dtype)
        nxt = params.t_mat @ alpha + params.r_mat @ eta
        return nxt, nxt

    _, alphas = jax.lax.scan(step, alpha1,
                             jax.random.split(ka, t_len - 1))
    alphas = jnp.concatenate([alpha1[None], alphas], axis=0)
    eps = (jnp.sqrt(params.hs(t_len))
           * jax.random.normal(ke, (t_len, params.z.shape[0]), dtype))
    y = alphas @ params.z.T + eps
    return alphas, y


def mv_simulation_smoother(key, params: MvSsmParams, y, observed=None):
    """Durbin-Koopman mean-correction draw of alpha | y (one filter on
    the difference series; see kalman.simulation_smoother)."""
    alpha_plus, y_plus = mv_simulate(key, params, y.shape[0])
    params0 = params._replace(a0=jnp.zeros_like(params.a0))
    filt = mv_kalman_filter(params0, y - y_plus, observed)
    return alpha_plus + mv_fast_state_smoother(params0, filt)


@dataclasses.dataclass(frozen=True)
class MultivariateBsts:
    """mbsts: K series, J shared local-level factors, optional per-series
    spike-slab regression (reference
    MultivariateStateSpaceRegressionModel.hpp:137; R mbsts.R).

    State keys: loadings [K, J], factor_sigsq [J], sigsq_obs [K],
    alpha [T, J], and (if predictors) gamma/beta [K, p].
    """

    y: jax.Array  # [T, K]
    num_factors: int
    predictors: jax.Array | None = None  # [T, p] shared design
    reg_prior: SpikeSlabPrior | None = None
    factor_sd_prior: SdPrior | None = None
    obs_sd_prior: SdPrior | None = None
    loading_prior_sd: float = 1.0
    reg_max_flips: int | None = None

    def __post_init__(self):
        sd = float(jnp.std(self.y))
        if self.factor_sd_prior is None:
            object.__setattr__(
                self, "factor_sd_prior",
                SdPrior(sigma_guess=0.05 * sd, upper_limit=sd))
        if self.obs_sd_prior is None:
            object.__setattr__(
                self, "obs_sd_prior",
                SdPrior(sigma_guess=0.5 * sd, upper_limit=2.0 * sd))

    @property
    def num_series(self):
        return self.y.shape[1]

    def _loading_mask(self):
        """Lower-triangular identification: Lambda[k, j] = 0 for k < j;
        diagonal positive handled by leaving it free (sign flips are
        resolved at analysis time, as the reference does)."""
        k, j = self.num_series, self.num_factors
        return jnp.tril(jnp.ones((k, j))) if k >= j else jnp.tril(
            jnp.ones((k, j)))

    def ssm_params(self, state):
        j = self.num_factors
        return MvSsmParams(
            z=state["loadings"],
            t_mat=jnp.eye(j),
            r_mat=jnp.eye(j),
            q_mat=jnp.diag(state["factor_sigsq"]),
            h_diag=state["sigsq_obs"],
            a0=jnp.zeros(j),
            p0=jnp.eye(j) * jnp.var(self.y),
        )

    def init_state(self, key):
        t_len, k = self.y.shape
        j = self.num_factors
        keys = jax.random.split(key, 4)
        mask = self._loading_mask()
        loadings = mask * (jnp.ones((k, j))
                           + 0.1 * jax.random.normal(keys[0], (k, j)))
        sd = jnp.std(self.y)
        state = {
            "loadings": loadings,
            "factor_sigsq": jnp.full((j,), (0.1 * sd) ** 2),
            "sigsq_obs": jnp.full((k,), (0.5 * sd) ** 2),
        }
        if self.predictors is not None:
            p = self.predictors.shape[1]
            pi = jax.nn.sigmoid(self.reg_prior.log_inclusion_odds)
            state["gamma"] = jax.random.uniform(
                keys[1], (k, p)) < jnp.maximum(pi, 2.0 / p)
            state["beta"] = jnp.zeros((k, p))
        state["alpha"] = mv_simulation_smoother(
            keys[2], self.ssm_params(state), self._y_adj(state))
        return state

    def _y_adj(self, state):
        if self.predictors is None:
            return self.y
        return self.y - self.predictors @ state["beta"].T

    def kernel(self):
        has_reg = self.predictors is not None
        t_len, k_dim = self.y.shape
        j_dim = self.num_factors
        mask = self._loading_mask()

        def sweep(key, state):
            keys = jax.random.split(key, 6)
            out = dict(state)
            factor_contrib = state["alpha"] @ state["loadings"].T  # [T, K]

            # 1. per-series spike-slab regression | state
            if has_reg:
                y_reg = (self.y - factor_contrib).T  # [K, T]

                def per_series(kg, kb, y_k, g_k, w_k):
                    suf = WeightedRegSuf.from_data(
                        self.predictors, y_k, jnp.full((t_len,), w_k))
                    g_k = kv_draw_indicators(kg, suf, self.reg_prior, g_k,
                                             self.reg_max_flips)
                    b_k = kv_draw_beta(kb, suf, self.reg_prior, g_k)
                    return g_k, b_k

                gamma, beta = jax.vmap(per_series)(
                    jax.random.split(keys[0], k_dim),
                    jax.random.split(keys[1], k_dim),
                    y_reg, state["gamma"], 1.0 / state["sigsq_obs"])
                out["gamma"], out["beta"] = gamma, beta

            y_adj = self._y_adj(out)

            # 2. loadings rows | alpha (conjugate, masked constraint)
            ata = out["alpha"].T @ out["alpha"]  # [J, J]
            aty = out["alpha"].T @ y_adj  # [J, K]

            def draw_row(kr, aty_k, sigsq_k, m_k):
                prec = (ata / sigsq_k
                        + jnp.eye(j_dim) / self.loading_prior_sd**2)
                # constrain masked-out entries to zero via huge precision
                prec = prec + jnp.diag(jnp.where(m_k > 0, 0.0, 1e12))
                b = (aty_k / sigsq_k) * m_k
                return dists.mvn.sample_suf(kr, b, prec) * m_k

            loadings = jax.vmap(draw_row)(
                jax.random.split(keys[2], k_dim), aty.T,
                state["sigsq_obs"], mask)
            out["loadings"] = loadings

            # 3. factor innovation variances | alpha
            eta = out["alpha"][1:] - out["alpha"][:-1]  # [T-1, J]
            fac_keys = jax.random.split(keys[3], j_dim)
            factor_sigsq = jax.vmap(
                lambda kk, ss: self.factor_sd_prior.draw_variance(
                    kk, t_len - 1, ss))(fac_keys,
                                        jnp.sum(eta * eta, axis=0))
            out["factor_sigsq"] = factor_sigsq

            # 4. per-series observation variances
            resid = y_adj - out["alpha"] @ loadings.T
            obs_keys = jax.random.split(keys[4], k_dim)
            sigsq_obs = jax.vmap(
                lambda kk, ss: self.obs_sd_prior.draw_variance(
                    kk, t_len, ss))(obs_keys, jnp.sum(resid * resid, 0))
            out["sigsq_obs"] = sigsq_obs

            # 5. factor paths | everything
            out["alpha"] = mv_simulation_smoother(
                keys[5], self.ssm_params(out), y_adj)
            return out

        return sweep

    def log_lik(self, state):
        return mv_kalman_filter(self.ssm_params(state),
                                self._y_adj(state)).loglik

    def predict(self, key, state, horizon: int, future_predictors=None):
        """Simulate y_{T+1:T+h} [h, K] given one posterior draw."""
        params = self.ssm_params(state)
        alpha_t = state["alpha"][-1]
        j = self.num_factors

        def step(alpha, k):
            k_eta, k_eps = jax.random.split(k)
            eta = (jnp.sqrt(state["factor_sigsq"])
                   * jax.random.normal(k_eta, (j,)))
            alpha_next = alpha + eta
            y_next = (state["loadings"] @ alpha_next
                      + jnp.sqrt(state["sigsq_obs"])
                      * jax.random.normal(k_eps, (self.num_series,)))
            return alpha_next, y_next

        _, ys = jax.lax.scan(step, alpha_t,
                             jax.random.split(key, horizon))
        if future_predictors is not None:
            ys = ys + future_predictors @ state["beta"].T
        return ys
