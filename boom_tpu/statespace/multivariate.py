"""Multivariate state space (mbsts): shared + per-series state over K series.

Reference: Models/StateSpace/Multivariate/
MultivariateStateSpaceRegressionModel.hpp:137 (the engine of the R
`mbsts` package: K series share low-dimensional state through a loadings
("observation coefficients") matrix, plus per-series spike-slab
regression and per-series observation variances),
StateModels/SharedLocalLevel.hpp (shared random-walk factors with
identification constraints on the loadings),
StateModels/ScalarStateModelAdapter.hpp:49 (scalar state models adapted
into the shared filter: y[t, k] = coef[k] * (Z_t' alpha_t) + ...),
MultivariateStateSpaceRegressionModel.hpp:205-230 (series-specific state
via ProxyScalarStateSpaceModel: each series owns a scalar state-space
model whose state is imputed conditional on the shared state),
StudentMvssRegressionModel.hpp:140 (student observation errors via
latent scale weights), and the multivariate filters in
Models/StateSpace/Filters (ConditionallyIndependentKalmanFilter —
diagonal observation error).

Model:
    y[t]      = Lambda alpha_t + sum_b coef_b (z_b' alpha_{b,t})
                + s[t] + B x_t + eps_t,
    eps[t,k] ~ N(0, sigsq_k / w[t,k]),  w = 1 (gaussian) or
                w[t,k] ~ Gamma(nu/2, nu/2) (student errors)
    alpha_{t+1} = alpha_t + eta_t (shared factors, random walk)
    alpha_{b,t} : shared scalar blocks (seasonal/trend/...) loading on
                  series k with coefficient coef_b[k] (coef_b[0] == 1)
    s[t,k]     : per-series scalar state (proxy models), independent
                 parameters per series, imputed by a vmapped scalar
                 Durbin-Koopman smoother
    Lambda lower-triangular with POSITIVE DIAGONAL (sign-flip
    identification applied each sweep: likelihood and symmetric priors
    are invariant under (Lambda[:, j], alpha[:, j]) -> -(...), so the
    deterministic flip to Lambda[j, j] > 0 preserves the posterior).

Gibbs sweep (the MultivariateStateSpacePosteriorSampler blocking,
impute_state at MultivariateStateSpaceRegressionModel.cpp):
    1. per-series spike-slab regression | all state
    2. loadings rows | shared alpha (conjugate, masked, sign-fixed)
    3. adapter observation coefficients | shared alpha
    4. factor innovation variances + shared block params | shared alpha
    5. per-series state paths + block params (vmapped scalar smoother)
    6. per-series sigsq | residuals (weighted when student)
    7. student weights and optional nu | residuals
    8. shared alpha | everything (vector-observation DK smoother)

TPU notes: the filter is a lax.scan whose per-step work is [K, J] x
[J, J] GEMMs (MXU); the K-dim innovation solve is a Cholesky of the
[K, K] predictive covariance. Per-series state imputation is a vmap of
the scalar Kalman machinery over K (each proxy model is independent
given the shared state — embarrassingly parallel, exactly where the
reference loops over proxy models). Everything vmaps over chains.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from boom_tpu import dists
from boom_tpu.inference.kernels.slice import slice_step
from boom_tpu.models.glm.regression import SpikeSlabPrior
from boom_tpu.models.glm.ssvs import (
    WeightedRegSuf,
    kv_draw_beta,
    kv_draw_indicators,
)
from boom_tpu.statespace.kalman import (
    SsmParams,
    simulation_smoother,
)
from boom_tpu.statespace.bsts import _block_diag
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
    """mbsts: K series sharing J local-level factors, optional shared
    scalar state blocks (the ScalarStateModelAdapter mechanism),
    per-series scalar state blocks (ProxyScalarStateSpaceModel), per-
    series spike-slab regression with shared or series-specific designs,
    and gaussian or student observation errors.

    Reference: MultivariateStateSpaceRegressionModel.hpp:137 (shared +
    series-specific state, usage idiom at :120-133),
    ScalarStateModelAdapter.hpp:49 (shared_blocks + obs_coef),
    StudentMvssRegressionModel.hpp:140 (student_df / sample_nu); R
    mbsts.R.

    State keys: loadings [K, J], factor_sigsq [J], sigsq_obs [K],
    alpha [T, J + shared block dims]; plus (when configured)
    shared_blocks/obs_coef, series_blocks/series_alpha, gamma/beta
    [K, p], weights [T, K], nu.
    """

    y: jax.Array  # [T, K]
    num_factors: int
    # [T, p] (shared design) or [K, T, p] (series-specific designs,
    # reference MultivariateStateSpaceRegressionModel.hpp:137's
    # IndependentRegressionModels with per-series data)
    predictors: jax.Array | None = None
    reg_prior: SpikeSlabPrior | None = None
    # shared scalar state blocks loading on every series through a
    # per-series coefficient (coef[0] fixed at 1 for identification) —
    # reference ScalarStateModelAdapter.hpp:49
    shared_blocks: Sequence = ()
    # per-series scalar state blocks (independent parameters per series)
    # — reference ProxyScalarStateSpaceModel / add_series_specific_state
    series_blocks: Sequence = ()
    # student observation errors with (fixed or sampled) df — reference
    # StudentMvssRegressionModel.hpp:140
    student_df: float | None = None
    sample_nu: bool = False
    nu_prior_rate: float = 0.1
    observed: jax.Array | None = None  # [T, K] bool; None = all observed
    factor_sd_prior: SdPrior | None = None
    obs_sd_prior: SdPrior | None = None
    loading_prior_sd: float = 1.0
    obs_coef_prior_sd: float = 1.0
    reg_max_flips: int | None = None
    # ancillarity-sufficiency interweaving for the FACTOR innovation
    # variances (Yu-Meng 2011 non-centered redraw, the same move that
    # fixes the scalar bsts sigma-state pathology): without it the
    # centered conjugate draw leaves factor_sigsq mixing at O(100)-sweep
    # autocorrelation near small variances (measured R-hat 1.37 / ESS 9
    # of 1600 on a 4-series panel; 1.0x with ASIS on)
    asis: bool = True
    asis_slice_steps: int = 4
    # TIM marginal refreshment of the factor innovation variances (the
    # r04 scalar-bsts innovation transferred to mbsts): a multivariate-T
    # proposal tailored once to p(log factor_sigsq | y, rest-of-state
    # template) scores `marginal_tim_trials` candidates per sweep in one
    # candidate-batched MV-filter pass and exchanges via multiple-try
    # independence MH — the recorded factor variances become near-iid
    # draws from their (conditional-on-the-rest) marginal. Composes
    # AFTER the ASIS pass. None disables.
    marginal_move: str | None = "tim"
    marginal_tim_trials: int = 8
    marginal_tim_df: float = 3.0
    marginal_tim_inflate: float = 1.5
    # Unit-diagonal loading identification (Lambda[j, j] = 1): pins the
    # factor SCALE, which a positive-diagonal-only constraint leaves on
    # a (sigma_factor, loading-column) ridge — measured factor-sd R-hat
    # 1.4-2.0 across chains wandering that ridge. The reference states
    # the same constraint ("unit diagonal", SharedLocalLevel.hpp:43-46)
    # though its impose_identifiability_constraint is disabled. Set
    # False for the r3 positive-diagonal behaviour.
    unit_diagonal_loadings: bool = True

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
        if self.num_factors and self.marginal_move == "tim":
            object.__setattr__(self, "_tim_prop",
                               self._build_factor_tim_proposal())
        for b in self.series_blocks:
            assert not hasattr(b, "z_seq") and not getattr(
                b, "needs_residual", False), (
                "series_blocks must be static-Z scalar blocks")
        for b in self.shared_blocks:
            assert not hasattr(b, "z_seq") and not getattr(
                b, "needs_residual", False), (
                "shared_blocks must be static-Z scalar blocks")
        assert self.num_factors + sum(
            b.dim for b in self.shared_blocks) >= 1, (
            "need at least one shared factor or shared block")

    @property
    def num_series(self):
        return self.y.shape[1]

    @property
    def t_len(self):
        return self.y.shape[0]

    @property
    def student(self):
        return self.student_df is not None

    @property
    def _series_specific_x(self):
        return self.predictors is not None and self.predictors.ndim == 3

    def _x_for_series(self):
        """[K, T, p] view of the design (broadcast when shared)."""
        if self._series_specific_x:
            return self.predictors
        return jnp.broadcast_to(
            self.predictors[None],
            (self.num_series,) + self.predictors.shape)

    def _obs_mask(self):
        if self.observed is None:
            return jnp.ones(self.y.shape, bool)
        return self.observed

    # -- shared-state system -------------------------------------------------
    def _shared_slices(self):
        """(start, dim) of each shared block inside alpha, after the J
        factor dims."""
        out, start = [], self.num_factors
        for b in self.shared_blocks:
            out.append((start, b.dim))
            start += b.dim
        return out

    @property
    def shared_dim(self):
        return self.num_factors + sum(b.dim for b in self.shared_blocks)

    def _loading_mask(self):
        """Lower-triangular identification: Lambda[k, j] = 0 for k < j.
        The diagonal is constrained positive by the deterministic sign
        flip in the sweep (see module docstring)."""
        k, j = self.num_series, self.num_factors
        return jnp.tril(jnp.ones((k, j)))

    def _shared_z(self, state):
        """[K, shared_dim] observation matrix: loadings columns for the
        factors, coef_b (x) z_b for each adapted scalar block."""
        cols = [state["loadings"]] if self.num_factors else []
        for b in self.shared_blocks:
            coef = state["obs_coef"][b.name]  # [K]
            cols.append(coef[:, None] * b.z()[None, :])
        return jnp.concatenate(cols, axis=1)

    def ssm_params(self, state):
        j = self.num_factors
        ts = [jnp.eye(j)]
        rs = [jnp.eye(j)]
        qs = [jnp.diag(state["factor_sigsq"])]
        a0s = [jnp.zeros(j)]
        p0s = [jnp.eye(j) * jnp.var(self.y)]
        for b in self.shared_blocks:
            t_mat, r_mat, q_mat = b.build(state["shared_blocks"][b.name])
            ts.append(t_mat)
            rs.append(r_mat)
            qs.append(q_mat)
            a0, p0 = b.init_dist()
            a0s.append(a0)
            p0s.append(p0)
        h = state["sigsq_obs"]
        if self.student:
            h = h[None, :] / state["weights"]  # [T, K]
        return MvSsmParams(
            z=self._shared_z(state),
            t_mat=_block_diag(ts),
            r_mat=_block_diag(rs),
            q_mat=_block_diag(qs),
            h_diag=h,
            a0=jnp.concatenate(a0s),
            p0=_block_diag(p0s),
        )

    # -- per-series (proxy) system -------------------------------------------
    @property
    def series_dim(self):
        return sum(b.dim for b in self.series_blocks)

    def _series_slices(self):
        out, start = [], 0
        for b in self.series_blocks:
            out.append((start, b.dim))
            start += b.dim
        return out

    def _series_ssm(self, series_params, sigsq_k, w_col):
        """Scalar SSM for ONE series' proxy model. series_params: this
        series' (unstacked) block param dicts; w_col: [T] weights."""
        zs, ts, rs, qs, a0s, p0s = [], [], [], [], [], []
        for b in self.series_blocks:
            t_mat, r_mat, q_mat = b.build(series_params[b.name])
            zs.append(b.z())
            ts.append(t_mat)
            rs.append(r_mat)
            qs.append(q_mat)
            a0, p0 = b.init_dist()
            a0s.append(a0)
            p0s.append(p0)
        h = sigsq_k / w_col if self.student else sigsq_k
        return SsmParams(
            z=jnp.concatenate(zs), t_mat=_block_diag(ts),
            r_mat=_block_diag(rs), q_mat=_block_diag(qs), h=h,
            a0=jnp.concatenate(a0s), p0=_block_diag(p0s))

    def _series_z(self):
        return jnp.concatenate([b.z() for b in self.series_blocks])

    def series_contrib(self, state):
        """[T, K] contribution of the per-series state."""
        if not self.series_blocks:
            return jnp.zeros(self.y.shape)
        return jnp.einsum("ktd,d->tk", state["series_alpha"],
                          self._series_z())

    def shared_contrib(self, state):
        return state["alpha"] @ self._shared_z(state).T

    def _reg_contrib(self, state):
        if self.predictors is None:
            return jnp.zeros(self.y.shape)
        if self._series_specific_x:
            return jnp.einsum("ktp,kp->tk", self.predictors,
                              state["beta"])
        return self.predictors @ state["beta"].T

    def _y_adj(self, state):
        return self.y - self._reg_contrib(state)

    # -- init ------------------------------------------------------------
    def init_state(self, key):
        t_len, k = self.y.shape
        j = self.num_factors
        keys = jax.random.split(key, 8)
        mask = self._loading_mask()
        loadings = mask * (jnp.ones((k, j))
                           + 0.1 * jax.random.normal(keys[0], (k, j)))
        if self.unit_diagonal_loadings:
            idx = jnp.arange(j)
            loadings = loadings.at[idx, idx].set(1.0)
        sd = jnp.std(self.y)
        state = {
            "loadings": loadings,
            "factor_sigsq": jnp.full((j,), (0.1 * sd) ** 2),
            "sigsq_obs": jnp.full((k,), (0.5 * sd) ** 2),
        }
        if self.shared_blocks:
            bkeys = jax.random.split(keys[3], len(self.shared_blocks))
            state["shared_blocks"] = {
                b.name: b.init_params(bk)
                for b, bk in zip(self.shared_blocks, bkeys)}
            state["obs_coef"] = {
                b.name: jnp.ones((k,)) for b in self.shared_blocks}
        if self.series_blocks:
            state["series_blocks"] = {}
            bkeys = jax.random.split(keys[4], len(self.series_blocks))
            for b, bk in zip(self.series_blocks, bkeys):
                state["series_blocks"][b.name] = jax.vmap(b.init_params)(
                    jax.random.split(bk, k))
            state["series_alpha"] = jnp.zeros((k, t_len, self.series_dim))
        if self.student:
            state["weights"] = jnp.ones((t_len, k))
            state["nu"] = jnp.asarray(float(self.student_df))
        if self.predictors is not None:
            p = (self.predictors.shape[-1])
            pi = jax.nn.sigmoid(self.reg_prior.log_inclusion_odds)
            state["gamma"] = jax.random.uniform(
                keys[1], (k, p)) < jnp.maximum(pi, 2.0 / p)
            state["beta"] = jnp.zeros((k, p))
        state["alpha"] = mv_simulation_smoother(
            keys[2], self.ssm_params(state), self._y_adj(state),
            self._obs_mask())
        return state

    # -- Gibbs sweep -----------------------------------------------------
    def kernel(self):
        has_reg = self.predictors is not None
        t_len, k_dim = self.y.shape
        j_dim = self.num_factors
        mask = self._loading_mask()
        obs = self._obs_mask()
        obs_f = obs.astype(self.y.dtype)

        def sweep(key, state):
            keys = jax.random.split(key, 10)
            out = dict(state)
            shared_c = self.shared_contrib(state)  # [T, K]
            series_c = self.series_contrib(state)  # [T, K]
            w = state["weights"] if self.student else jnp.ones(
                self.y.shape)
            w_obs = w * obs_f  # weights with missing rows zeroed

            # 1. per-series spike-slab regression | all state
            if has_reg:
                y_reg = (self.y - shared_c - series_c).T  # [K, T]
                xs = self._x_for_series()

                def per_series(kg, kb, x_k, y_k, g_k, wcol_k):
                    suf = WeightedRegSuf.from_data(x_k, y_k, wcol_k)
                    g_k = kv_draw_indicators(kg, suf, self.reg_prior, g_k,
                                             self.reg_max_flips)
                    b_k = kv_draw_beta(kb, suf, self.reg_prior, g_k)
                    return g_k, b_k

                gamma, beta = jax.vmap(per_series)(
                    jax.random.split(keys[0], k_dim),
                    jax.random.split(keys[1], k_dim),
                    xs, y_reg, state["gamma"],
                    (w_obs / state["sigsq_obs"][None, :]).T)
                out["gamma"], out["beta"] = gamma, beta

            y_adj = self._y_adj(out)  # y - regression
            y_shared = y_adj - series_c  # target of the shared state
            alpha_fac = out["alpha"][:, :j_dim]  # [T, J]

            # 2. loadings rows | factor paths (conjugate, masked,
            #    weighted by w/sigsq when student; then the sign flip)
            if j_dim:
                other_c = shared_c - alpha_fac @ state["loadings"].T
                y_fac = y_shared - other_c  # [T, K]

                if self.unit_diagonal_loadings:
                    # Lambda[j, j] = 1 fixed: its contribution moves
                    # into the row residual and the conjugate draw
                    # covers only the strictly-lower free entries
                    eye_kj = jnp.zeros((k_dim, j_dim)).at[
                        jnp.arange(j_dim), jnp.arange(j_dim)].set(1.0)
                    free_mask = mask * (1.0 - eye_kj)
                    fixed_contrib = alpha_fac @ eye_kj.T  # [T, K]
                    y_free = y_fac - fixed_contrib
                else:
                    free_mask = mask
                    y_free = y_fac

                def draw_row(kr, y_k, w_k, sigsq_k, m_k):
                    prec = (jnp.einsum("td,te,t->de", alpha_fac,
                                       alpha_fac, w_k) / sigsq_k
                            + jnp.eye(j_dim) / self.loading_prior_sd**2)
                    prec = prec + jnp.diag(
                        jnp.where(m_k > 0, 0.0, 1e12))
                    b = jnp.einsum("td,t->d", alpha_fac,
                                   w_k * y_k) / sigsq_k * m_k
                    return dists.mvn.sample_suf(kr, b, prec) * m_k

                loadings = jax.vmap(draw_row)(
                    jax.random.split(keys[2], k_dim), y_free.T,
                    w_obs.T, state["sigsq_obs"], free_mask)
                if self.unit_diagonal_loadings:
                    loadings = loadings + eye_kj
                else:
                    # positive-diagonal identification: flip (column j,
                    # factor j) pairs so Lambda[j, j] > 0
                    sign = jnp.where(
                        jnp.diagonal(loadings[:j_dim, :]) < 0, -1.0,
                        1.0)
                    loadings = loadings * sign[None, :]
                    out["alpha"] = out["alpha"].at[:, :j_dim].set(
                        alpha_fac * sign[None, :])
                out["loadings"] = loadings

            # 3. adapter observation coefficients | shared alpha
            #    (scalar conjugate per (series, block); coef[0] == 1)
            if self.shared_blocks:
                shared_c2 = self.shared_contrib(out)
                for (start, dim), b, ck in zip(
                        self._shared_slices(), self.shared_blocks,
                        jax.random.split(keys[3],
                                         len(self.shared_blocks))):
                    path_b = jax.lax.dynamic_slice_in_dim(
                        out["alpha"], start, dim, axis=1)
                    signal = path_b @ b.z()  # [T]
                    coef = out["obs_coef"][b.name]
                    resid_b = (y_shared - shared_c2
                               + signal[:, None] * coef[None, :])

                    def draw_coef(kc, r_k, w_k, sigsq_k):
                        prec = (jnp.sum(w_k * signal * signal) / sigsq_k
                                + 1.0 / self.obs_coef_prior_sd**2)
                        mean = (jnp.sum(w_k * signal * r_k)
                                / sigsq_k) / prec
                        return mean + jax.random.normal(
                            kc, (), r_k.dtype) / jnp.sqrt(prec)

                    new_coef = jax.vmap(draw_coef)(
                        jax.random.split(ck, k_dim), resid_b.T, w_obs.T,
                        out["sigsq_obs"])
                    # series 0 anchored at 1.0 for identification
                    new_coef = new_coef.at[0].set(1.0)
                    out["obs_coef"] = dict(out["obs_coef"])
                    out["obs_coef"][b.name] = new_coef
                    shared_c2 = self.shared_contrib(out)

            # 4. factor innovation variances + shared block params
            if j_dim:
                eta = (out["alpha"][1:, :j_dim]
                       - out["alpha"][:-1, :j_dim])
                fac_keys = jax.random.split(keys[4], j_dim)
                out["factor_sigsq"] = jax.vmap(
                    lambda kk, ss: self.factor_sd_prior.draw_variance(
                        kk, t_len - 1, ss))(
                    fac_keys, jnp.sum(eta * eta, axis=0))
            if self.shared_blocks:
                new_sb = {}
                for (start, dim), b, bk in zip(
                        self._shared_slices(), self.shared_blocks,
                        jax.random.split(keys[5],
                                         len(self.shared_blocks))):
                    path = jax.lax.dynamic_slice_in_dim(
                        out["alpha"], start, dim, axis=1)
                    new_sb[b.name] = b.draw_params(
                        bk, state["shared_blocks"][b.name], path)
                out["shared_blocks"] = new_sb

            # 5. per-series proxy state + block params (reference
            #    impute_state: "Impute both the shared and series-
            #    specific state, each conditional on the other")
            if self.series_blocks:
                shared_c2 = self.shared_contrib(out)
                y_series = (y_adj - shared_c2).T  # [K, T]

                def impute_one(kk, sp_k, y_k, obs_k, sigsq_k, w_k):
                    params_k = self._series_ssm(sp_k, sigsq_k, w_k)
                    return simulation_smoother(kk, params_k, y_k, obs_k)

                sp = state["series_blocks"]
                # unstack: vmap carries the [K, ...] leaves
                out["series_alpha"] = jax.vmap(impute_one)(
                    jax.random.split(keys[6], k_dim), sp, y_series,
                    obs.T, out["sigsq_obs"], w.T)
                new_blocks = {}
                for (start, dim), b, bk in zip(
                        self._series_slices(), self.series_blocks,
                        jax.random.split(keys[7],
                                         len(self.series_blocks))):
                    paths = jax.lax.dynamic_slice_in_dim(
                        out["series_alpha"], start, dim, axis=2)
                    new_blocks[b.name] = jax.vmap(b.draw_params)(
                        jax.random.split(bk, k_dim), sp[b.name], paths)
                out["series_blocks"] = new_blocks
                series_c = self.series_contrib(out)

            # 6. per-series observation variances (weighted when student)
            shared_c2 = self.shared_contrib(out)
            resid = y_adj - shared_c2 - series_c
            n_k = jnp.sum(obs_f, axis=0)
            obs_keys = jax.random.split(keys[8], k_dim)
            out["sigsq_obs"] = jax.vmap(
                lambda kk, nn, ss: self.obs_sd_prior.draw_variance(
                    kk, nn, ss))(
                obs_keys, n_k, jnp.sum(w_obs * resid * resid, axis=0))

            # 7. student weights + optional nu (scale-mixture
            #    representation of the t: resid | w ~ N(0, sigsq/w),
            #    w ~ Gamma(nu/2, nu/2) — StudentMvssRegressionModel's
            #    latent weights)
            if self.student:
                kw, kn = jax.random.split(keys[9])
                nu = out["nu"]
                r2 = resid * resid / out["sigsq_obs"][None, :]
                w_new = dists.gamma.sample(
                    kw, 0.5 * (nu + 1.0) * jnp.ones_like(r2),
                    0.5 * (nu + jnp.where(obs, r2, 0.0)))
                # unobserved points: prior draw is fine; keep them at 1
                w_new = jnp.where(obs, w_new, 1.0)
                out["weights"] = w_new
                if self.sample_nu:
                    n_obs_total = jnp.sum(obs_f)
                    lw = jnp.where(obs, jnp.log(w_new), 0.0)

                    def nu_logpost(v):
                        half = 0.5 * v
                        return (n_obs_total
                                * (half * jnp.log(half)
                                   - jax.scipy.special.gammaln(half))
                                + (half - 1.0) * jnp.sum(lw)
                                - half * jnp.sum(jnp.where(
                                    obs, w_new, 0.0))
                                - self.nu_prior_rate * v)

                    out["nu"] = slice_step(kn, nu, nu_logpost, width=2.0,
                                           lower=0.5, upper=500.0)

            # 8. shared state | everything
            key_alpha = jax.random.fold_in(key, 101)
            out["alpha"] = mv_simulation_smoother(
                key_alpha, self.ssm_params(out),
                self._y_adj(out) - self.series_contrib(out), obs)

            # 9. ASIS interweaving on the factor innovation variances
            if j_dim and self.asis:
                out = self._asis_factors(
                    jax.random.fold_in(key, 313), out, w_obs)

            # 10. TIM marginal refreshment of the factor variances
            if j_dim and self.marginal_move == "tim":
                out = self._marginal_factor_tim(
                    jax.random.fold_in(key, 757), out)
            return out

        return sweep

    def _factor_marginal_lp(self, state):
        """(lp_one, lp_batch) over u = log factor_sigsq: MV-filter
        marginal loglik (shared state integrated out; everything else
        held at `state`) + SdPrior + log-transform Jacobian."""
        y_eff = self._y_adj(state) - self.series_contrib(state)
        obs = self._obs_mask()
        prior = self.factor_sd_prior
        df = prior.sample_size
        ss = prior.sample_size * prior.sigma_guess**2

        def lp_one(u):
            st = dict(state)
            st["factor_sigsq"] = jnp.exp(u)
            ll = mv_kalman_filter(self.ssm_params(st), y_eff,
                                  obs).loglik
            sigsq = jnp.exp(u)
            lp = jnp.sum(-(0.5 * df + 1.0) * u - 0.5 * ss / sigsq + u)
            if prior.upper_limit < float("inf"):
                lp = jnp.where(
                    jnp.all(sigsq <= prior.upper_limit**2), lp,
                    -jnp.inf)
            return ll + lp

        return lp_one, jax.vmap(lp_one)

    def _build_factor_tim_proposal(self):
        """Eager once per model: Newton/BFGS mode + eigen-clamped
        Laplace covariance of p(log factor_sigsq | y) at an init-like
        template (the scalar Bsts _build_tim_proposal recipe)."""
        from boom_tpu import numopt

        template = self.init_state(jax.random.key(0))
        lp_one, _ = self._factor_marginal_lp(template)

        def neg(u):
            lp = lp_one(u)
            return -jnp.where(jnp.isfinite(lp), lp, -1e30)

        sd = jnp.std(self.y)
        u0 = jnp.full((self.num_factors,),
                      jnp.log((0.1 * sd) ** 2))
        # modest budgets: J is 1-3 dimensional and the t tails +
        # exact acceptance forgive an imperfect mode; the build runs
        # EAGERLY at model construction, so iterations are dispatches
        res = numopt.bfgs(neg, u0, max_iters=40)
        res = numopt.newton_raphson(neg, res.x, max_iters=6)
        mode = res.x
        h = jax.hessian(neg)(mode)
        h = 0.5 * (h + h.T)
        w, v = jnp.linalg.eigh(h)
        w = jnp.maximum(w, 1e-3 * jnp.maximum(jnp.max(w), 1.0))
        cov = ((v / w[None, :]) @ v.T) * self.marginal_tim_inflate ** 2
        chol = jnp.linalg.cholesky(0.5 * (cov + cov.T))
        return (jax.device_get(mode), jax.device_get(chol))

    def _marginal_factor_tim(self, key, state):
        """Multiple-try independence MH on log factor_sigsq from the
        tailored-T proposal — one candidate-batched MV-filter pass per
        sweep (see scalar Bsts._marginal_sigma_tim for the validity
        argument)."""
        mode, chol = self._tim_prop
        mode = jnp.asarray(mode, self.y.dtype)
        chol = jnp.asarray(chol, self.y.dtype)
        df = self.marginal_tim_df
        lp_one, lp_batch = self._factor_marginal_lp(state)
        u_cur = jnp.log(state["factor_sigsq"])
        k1, k2, k3 = jax.random.split(key, 3)
        k_tr = self.marginal_tim_trials
        cands = dists.mvt.sample(k1, mode, None, df, chol=chol,
                                 shape=(k_tr,))
        pts = jnp.concatenate([cands, u_cur[None, :]], axis=0)
        lps = lp_batch(pts)
        lqs = dists.mvt.logpdf(pts, mode, None, df, chol=chol)
        w = lps - lqs
        j = jax.random.categorical(k2, w[:k_tr])
        sum_y = jax.scipy.special.logsumexp(w[:k_tr])
        sum_x = jax.scipy.special.logsumexp(
            w[:k_tr].at[j].set(w[k_tr]))
        accept = jnp.log(jax.random.uniform(
            k3, (), u_cur.dtype,
            minval=jnp.finfo(u_cur.dtype).tiny)) < sum_y - sum_x
        out = dict(state)
        out["factor_sigsq"] = jnp.exp(
            jnp.where(accept, pts[j], u_cur))
        return out

    def _asis_factors(self, key, state, w_obs):
        """Non-centered (ancillary) redraw of the factor innovation
        sds — the scalar bsts asis_redraw generalized to K series
        observing the factors through the loadings.

        Hold the standardized factor innovations fixed: alpha_j(s) =
        base_j + s_j D_j with D_j the path driven by the standardized
        innovations (local-level factors => a plain cumsum). The
        K-series Gaussian likelihood is then quadratic in the s vector
        with Gram matrix G[j,i] = sum_{t,k} (w/sigsq_k) D_tj L_kj
        D_ti L_ki, so `asis_slice_steps` rounds of alternating scalar
        slice-Gibbs cost only scalar work after two einsums. Composes
        with the centered conjugate draw exactly as in the scalar
        model (Yu-Meng interweaving)."""
        from boom_tpu.inference.kernels.slice import slice_step

        j_dim = self.num_factors
        out = dict(state)
        alpha = state["alpha"]
        load = state["loadings"]  # [K, J]
        s_cur = jnp.sqrt(jnp.maximum(state["factor_sigsq"], 1e-30))
        eta = alpha[1:, :j_dim] - alpha[:-1, :j_dim]  # [T-1, J]
        d_path = jnp.concatenate(
            [jnp.zeros((1, j_dim), alpha.dtype),
             jnp.cumsum(eta / s_cur[None, :], axis=0)], axis=0)  # [T,J]
        base_fac = alpha[:, :j_dim] - d_path * s_cur[None, :]

        # residual against everything EXCEPT the s_j D_j terms
        y_eff = self._y_adj(state) - self.series_contrib(state)
        z_all = self._shared_z(state)  # [K, shared_dim]
        c_fix = alpha[:, j_dim:] @ z_all[:, j_dim:].T  # [T, K]
        r0 = y_eff - c_fix - base_fac @ load.T  # [T, K]
        u = w_obs / state["sigsq_obs"][None, :]  # [T, K]

        gram = jnp.einsum("tk,tj,kj,ti,ki->ji", u, d_path, load,
                          d_path, load)
        c_vec = jnp.einsum("tk,tj,kj->j", u * r0, d_path, load)

        prior = self.factor_sd_prior
        df = prior.sample_size
        pss = prior.sample_size * prior.sigma_guess**2
        upper = (prior.upper_limit
                 if prior.upper_limit < float("inf") else 1e6)
        sigs = s_cur
        for it in range(self.asis_slice_steps):
            for gi in range(j_dim):
                gk = jax.random.fold_in(key, it * j_dim + gi)
                a_coef = gram[gi, gi]
                others = c_vec[gi] - (gram[gi] @ sigs
                                      - gram[gi, gi] * sigs[gi])

                def logp(sig):
                    sigsq = sig * sig
                    lp = (-(0.5 * df + 1.0) * jnp.log(sigsq)
                          - 0.5 * pss / sigsq + jnp.log(2.0 * sig))
                    return lp + others * sig - 0.5 * a_coef * sigsq

                width = jnp.maximum(sigs[gi],
                                    0.05 * prior.sigma_guess)
                sigs = sigs.at[gi].set(slice_step(
                    gk, sigs[gi], logp, width, lower=1e-12,
                    upper=upper, expand_iters=5, shrink_iters=10))

        out["alpha"] = alpha.at[:, :j_dim].set(
            base_fac + d_path * sigs[None, :])
        out["factor_sigsq"] = sigs * sigs
        return out

    def log_lik(self, state):
        """Log-likelihood with the SHARED state integrated out
        (conditional on regression, per-series state, and weights)."""
        return mv_kalman_filter(
            self.ssm_params(state),
            self._y_adj(state) - self.series_contrib(state),
            self._obs_mask()).loglik

    def predict(self, key, state, horizon: int, future_predictors=None):
        """Simulate y_{T+1:T+h} [h, K] given one posterior draw.
        future_predictors: [h, p] or [K, h, p] to match `predictors`.
        Reference simulate_forecast
        (MultivariateStateSpaceRegressionModel.hpp:168-190)."""
        k_shared, k_series, k_eps, k_w = jax.random.split(key, 4)
        z_shared = self._shared_z(state)
        params = self.ssm_params(state)
        alpha_t = state["alpha"][-1]
        qc = jnp.linalg.cholesky(
            params.q_mat
            + 1e-12 * jnp.eye(params.q_mat.shape[0]))

        def shared_step(alpha, k):
            eta = qc @ jax.random.normal(k, (params.q_mat.shape[0],))
            alpha_next = params.t_mat @ alpha + params.r_mat @ eta
            return alpha_next, alpha_next

        _, shared_alphas = jax.lax.scan(
            shared_step, alpha_t, jax.random.split(k_shared, horizon))
        ys = shared_alphas @ z_shared.T  # [h, K]

        if self.series_blocks:
            z_ser = self._series_z()

            def one_series(kk, sp_k, alpha_last):
                p_k = self._series_ssm(sp_k, jnp.asarray(1.0),
                                       jnp.asarray(1.0))
                qck = jnp.linalg.cholesky(
                    p_k.q_mat + 1e-12 * jnp.eye(p_k.q_mat.shape[0]))

                def step(a, k2):
                    eta = qck @ jax.random.normal(
                        k2, (p_k.q_mat.shape[0],))
                    a_next = p_k.t_mat @ a + p_k.r_mat @ eta
                    return a_next, a_next

                _, a_path = jax.lax.scan(
                    step, alpha_last, jax.random.split(kk, horizon))
                return a_path @ z_ser  # [h]

            contrib = jax.vmap(one_series)(
                jax.random.split(k_series, self.num_series),
                state["series_blocks"], state["series_alpha"][:, -1])
            ys = ys + contrib.T

        sig = jnp.sqrt(state["sigsq_obs"])
        eps = sig[None, :] * jax.random.normal(
            k_eps, (horizon, self.num_series))
        if self.student:
            w_f = dists.gamma.sample(
                k_w, 0.5 * state["nu"] * jnp.ones((horizon,
                                                   self.num_series)),
                0.5 * state["nu"] * jnp.ones((horizon,
                                              self.num_series)))
            eps = eps / jnp.sqrt(w_f)
        ys = ys + eps
        if future_predictors is not None:
            if self._series_specific_x:
                ys = ys + jnp.einsum("khp,kp->hk", future_predictors,
                                     state["beta"])
            else:
                ys = ys + future_predictors @ state["beta"].T
        return ys
