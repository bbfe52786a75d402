"""Bsts: Bayesian structural time series (the reference's flagship).

Reference: Models/StateSpace/StateSpaceModel.hpp (Gaussian observation),
StateSpaceRegressionModel.hpp (+ spike-slab regression observation model),
StateSpace/PosteriorSamplers/StateSpacePosteriorSampler.cpp:42-64 (draw =
observation model draw, each state model draw, impute_state), and the R
front end bsts/R/bsts.R:28 with add.* state builders (SURVEY.md §3.1).

The Gibbs sweep here follows the same blocking:
  1. impute the state path with the Durbin-Koopman simulation smoother on
     y - X beta (kalman.simulation_smoother);
  2. draw each state block's parameters from its imputed innovations;
  3. draw the observation model: plain conjugate sigma^2 on the state
     residuals, or the full spike-slab (gamma, beta, sigma^2) sweep on
     y - Z alpha when a regression component is present (the reference's
     StateSpaceRegressionModel arrangement, where the regression sigma IS
     the observation sigma).

Everything is one jitted program; chains vmap.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from boom_tpu import dists
from boom_tpu.models.glm.regression import (
    RegSuf,
    SpikeSlabPrior,
    draw_beta,
    draw_sigsq,
)
from boom_tpu.models.glm.regression_sweep import (
    draw_indicators_swept,
    valid_for_prior,
)
from boom_tpu.models.glm.regression import draw_indicators_sweep
from boom_tpu.statespace.kalman import (
    SsmParams,
    kalman_filter,
    kalman_loglik,
    simulation_smoother,
)
from boom_tpu.statespace.pallas_scan import pallas_simulation_smoother
from boom_tpu.statespace.parallel_kalman import parallel_simulation_smoother
from boom_tpu.statespace.state_models import SdPrior


def _block_diag(mats):
    mats = [m for m in mats if m.shape[0] > 0 or m.shape[1] > 0]
    if not mats:
        return jnp.zeros((0, 0))
    return jax.scipy.linalg.block_diag(*mats)


@dataclasses.dataclass(frozen=True)
class Bsts:
    """Structural time series with optional spike-slab regression.

    blocks: sequence of state-model blocks (state_models module).
    predictors: optional [T, p] design matrix => spike-slab regression
    component with `reg_prior` (SpikeSlabPrior).
    """

    y: jax.Array  # [T]
    blocks: Sequence
    obs_prior: SdPrior | None = None
    predictors: jax.Array | None = None
    reg_prior: SpikeSlabPrior | None = None
    reg_max_flips: int | None = None
    # Irregular-timestamp support (reference format.timestamps.R:77-127
    # RegularizeTimestamps + the C++ TimeSeriesDataPolicy multiplexing):
    # y lives on the REGULARIZED grid (utils.timestamps.regularize).
    #   observed: [T] bool, False at grid points with no data (gaps)
    #   obs_weights: [T] float, number of raw observations AVERAGED
    #     into y[t] (duplicate timestamps); the Gaussian model is exact
    #     under this collapse with h_t = sigsq/w_t
    #   extra_obs_ss: the within-timestamp sum of squares lost by
    #     averaging — a data constant that re-enters the sigsq_obs
    #     posterior (sum_t sum_i (y_ti - ybar_t)^2)
    observed: jax.Array | None = None
    obs_weights: jax.Array | None = None
    extra_obs_ss: float = 0.0
    # Temporal-parallel (O(log T) depth) simulation smoother dispatch:
    #   "auto"   — use the in-VMEM Pallas Hillis-Steele scan
    #              (pallas_scan.py) when it wins: static system, small
    #              state dim, long series, few chains (measured 2.7-19x
    #              over the sequential scan at T=512-4096 on TPU v5e for
    #              1-8 chains). Falls back to the sequential scan in the
    #              many-chain regime (e.g. the 4096-chain bench) where
    #              batched VPU work already saturates the chip and any
    #              parallel-scan formulation does >2x the FLOPs.
    #   "pallas" — force the Pallas kernel (static systems only).
    #   True     — force the XLA associative_scan (parallel_kalman.py).
    #   False    — force the sequential scan.
    parallel_smoother: bool | str = "auto"
    # expected number of vmapped chains (run_mcmc num_chains); only used
    # by the "auto" smoother dispatch — vmap batching is invisible at
    # trace time, so the caller states it
    chains_hint: int = 1
    # ancillarity-sufficiency interweaving (ASIS / Yu-Meng 2011,
    # Fruhwirth-Schnatter-Wagner non-centered step) for state variances —
    # breaks the sigma-state mixing pathology the centered sampler (and
    # the reference) suffers at small state variances.
    asis: bool = True
    # number of interweaving passes per sweep: extra passes are nearly
    # free (one short scan each, no new Kalman pass) and sharply cut the
    # autocorrelation of slow variance components (benchmarks: 1 -> 16
    # passes tripled min-ESS/s on the local-linear-trend north star)
    asis_passes: int = 1
    # marginal slice move on the log state-innovation variances (and the
    # observation variance when there is no regression) with the WHOLE
    # state path integrated out by the Kalman filter. Each coordinate
    # costs ~(2 expand + shrink) filter passes, but near-boundary
    # variances decorrelate almost completely: on the LLT bench the
    # slope-variance ESS went 13k -> 169k per 150 draws. The reference
    # has no such move (its samplers are all conditional-on-state);
    # this is a capability addition.
    marginal_sigma_slice: bool = False
    marginal_slice_expand: int = 3
    marginal_slice_shrink: int = 8
    # HOW the marginal move evaluates its Kalman-filter likelihoods:
    #   "slice" — coordinate + random-direction slice moves. Robust, but
    #       each move costs ~15 SEQUENTIAL filter passes (1 height +
    #       2*expand + shrink), and the bsts sweep is time-axis-scan-
    #       latency bound, not FLOP bound.
    #   "mtm"  — multiple-try Metropolis (Liu-Liang-Wong 2000) on the
    #       JOINT log-variance vector: `marginal_mtm_trials` candidates
    #       drawn from a ladder of proposal scales are scored in ONE
    #       candidate-batched filter pass (the candidate axis rides the
    #       chain vmap — nearly free on TPU where the per-step tensors
    #       are far from saturating the VPU), then one more batched pass
    #       scores the reference points. 2 batched scans per move vs 15
    #       sequential ones; exactly invariant (per-slot symmetric
    #       proposals with lambda_i = 1/T_i weights => w_i = pi(y_i)).
    #   "grid" — deterministic symmetric-grid multiple-try: per
    #       coordinate, score the 2*marginal_grid_points offsets
    #       u +/- delta_i (log-spaced deltas, so some rung always sits
    #       at the conditional's local scale) in ONE batched filter
    #       pass, select a point w.p. proportional to pi, and accept
    #       with the exact ratio S_x/S_y (S_y from one more batched
    #       pass at the selected point). pi(x) P(x->y) =
    #       pi(x)pi(y) min(1/S_x, 1/S_y) is symmetric because the
    #       offset set is symmetric — exactly invariant, and the
    #       proposal is a near-exact draw from the 1-d conditional
    #       (the slice sampler's quality at 2 batched scans/coordinate
    #       instead of ~15 sequential ones).
    #   "tim"  — tailored-independence multiple-try (the reference's
    #       TIM sampler, Samplers/TIM.hpp:42, applied to the marginal):
    #       a multivariate-T proposal is fitted ONCE at the mode of the
    #       G-dimensional marginal posterior p(log variances | y)
    #       (Newton + Laplace Hessian, eager at model build), then each
    #       sweep scores `marginal_tim_trials` iid proposal draws plus
    #       the current point in ONE candidate-batched filter pass and
    #       does a multiple-try independence-MH exchange (select j
    #       w.p. proportional to the importance weight pi/q; accept
    #       with sum-weight ratio). Because the proposal does not
    #       depend on the current point, the reference set reuses the
    #       SAME candidate scores — one batched scan per sweep total,
    #       and with a well-fitted proposal the recorded variances are
    #       near-iid marginal-posterior draws (what the slice buys with
    #       ~75 sequential scans).
    marginal_move: str = "tim"
    marginal_mtm_trials: int = 16
    marginal_mtm_moves: int = 2
    marginal_grid_points: int = 10  # per side
    marginal_grid_range: tuple = (0.02, 4.0)  # log-variance offsets
    marginal_grid_dirs: int = 1  # extra random-direction grid moves
    marginal_tim_trials: int = 16
    marginal_tim_df: float = 3.0
    marginal_tim_inflate: float = 1.3
    # geometric ladder of per-slot proposal sds in log-variance space:
    # trials cover [width*ladder_lo, width*ladder_hi] so one move both
    # polishes locally and jumps scales (the slice sampler's adaptivity,
    # bought with batch width instead of sequential evals)
    marginal_mtm_width: float = 1.0
    marginal_mtm_ladder: tuple = (0.05, 2.0)
    # extra slice moves along RANDOM directions in the joint log-
    # variance space: coordinate slices zigzag when two variances are
    # correlated in the marginal (level vs observation noise is the
    # classic pair); a random-direction pass cuts across the ridge
    marginal_slice_random_dirs: int = 1
    # run `period` conditional sub-sweeps per kernel call with the
    # (expensive: ~3x a plain sweep) marginal pass only on the last —
    # a deterministic-scan composition of invariant kernels, so still
    # exactly invariant. period=2 roughly halves marginal-slice cost
    # per recorded draw at a small ESS-per-draw cost; recorded draws
    # are the post-marginal states.
    marginal_slice_period: int = 1

    def __post_init__(self):
        if self.obs_prior is None and self.reg_prior is None:
            sd = float(jnp.std(self.y))
            object.__setattr__(
                self, "obs_prior",
                SdPrior(sigma_guess=0.5 * sd, sample_size=0.01,
                        upper_limit=1.2 * sd))
        if self.marginal_sigma_slice and self.marginal_move == "tim":
            # eager, once per model: Newton mode + Laplace covariance of
            # the marginal log-variance posterior (TIM locate_mode).
            # Built here so no jitted sweep ever traces the mode search.
            object.__setattr__(self, "_tim_prop",
                               self._build_tim_proposal())

    # -- composite system ---------------------------------------------------
    @property
    def state_dim(self):
        return sum(b.dim for b in self.blocks)

    def _slices(self):
        out, start = [], 0
        for b in self.blocks:
            out.append((start, b.dim))
            start += b.dim
        return out

    @property
    def _time_varying_z(self):
        return any(hasattr(b, "z_seq") or hasattr(b, "z_seq_params")
                   for b in self.blocks)

    @property
    def _time_varying_q(self):
        return any(hasattr(b, "q_scale_seq") for b in self.blocks)

    @property
    def _time_varying_t(self):
        return any(hasattr(b, "t_seq") for b in self.blocks)

    @property
    def t_len(self):
        return self.y.shape[0]

    def ssm_params(self, state):
        t_len = self.t_len
        zs, ts, rs, qs = [], [], [], []
        for b in self.blocks:
            t_mat, r_mat, q_mat = b.build(state["blocks"][b.name])
            if self._time_varying_z:
                if hasattr(b, "z_seq_params"):
                    # param-dependent observation rows (the regression
                    # holiday family packs its coefficients into Z_t,
                    # reference RegressionHolidayStateModel.hpp:165)
                    z_b = b.z_seq_params(state["blocks"][b.name], t_len)
                elif hasattr(b, "z_seq"):
                    z_b = b.z_seq(t_len)
                else:
                    z_b = jnp.broadcast_to(b.z(), (t_len, b.dim))
            else:
                z_b = b.z()
            zs.append(z_b)
            ts.append(t_mat)
            rs.append(r_mat)
            qs.append(q_mat)
        a0s, p0s = zip(*(b.init_dist() for b in self.blocks))
        q_scale = None
        if self._time_varying_q:
            scales = []
            for b in self.blocks:
                if hasattr(b, "q_scale_seq"):
                    scales.append(
                        b.q_scale_seq(state["blocks"][b.name], t_len))
                else:
                    scales.append(jnp.ones((t_len, b.err_dim)))
            q_scale = jnp.concatenate(scales, axis=-1)
        t_seq = None
        if self._time_varying_t:
            # assemble [T, d, d] block-diag transitions: t_seq blocks
            # (MonthlyAnnualCycle) supply per-step matrices, static
            # blocks broadcast theirs
            seqs = []
            for b, t_static in zip(self.blocks, ts):
                if hasattr(b, "t_seq"):
                    seqs.append(b.t_seq(t_len))
                else:
                    seqs.append(jnp.broadcast_to(
                        t_static, (t_len,) + t_static.shape))
            t_seq = jax.vmap(lambda *ms: _block_diag(list(ms)))(*seqs)
        return SsmParams(
            z=jnp.concatenate(zs, axis=-1),
            t_mat=_block_diag(ts),
            r_mat=_block_diag(rs),
            q_mat=_block_diag(qs),
            h=(state["sigsq_obs"]
               if self.obs_weights is None
               else state["sigsq_obs"]
               / jnp.maximum(self.obs_weights, 1.0)),
            a0=jnp.concatenate(a0s),
            p0=_block_diag(p0s),
            q_scale=q_scale,
            t_seq=t_seq,
        )

    # -- state --------------------------------------------------------------
    def init_state(self, key):
        keys = jax.random.split(key, len(self.blocks) + 3)
        block_params = {
            b.name: b.init_params(k) for b, k in zip(self.blocks, keys[3:])}
        ksig = jax.random.uniform(keys[1], (), minval=0.1, maxval=0.8)
        state = {
            "blocks": block_params,
            "sigsq_obs": jnp.var(self.y) * ksig,
            "alpha": jnp.zeros((self.y.shape[0], self.state_dim)),
        }
        if self.predictors is not None:
            p = self.predictors.shape[1]
            pi = jax.nn.sigmoid(self.reg_prior.log_inclusion_odds)
            gamma = jax.random.uniform(keys[0], (p,)) < jnp.maximum(
                pi, 2.0 / p)
            state["gamma"] = gamma
            state["beta"] = jnp.zeros((p,), self.y.dtype)
        # impute a real starting state path so the first parameter draws
        # see data-scale innovations (an all-zero path is an absorbing
        # trap: zero innovations collapse the variance draws)
        params0 = self.ssm_params(state)
        state["alpha"] = self._smoother(params0)(keys[2], params0, self.y,
                                                 self.observed)
        return state

    def _smoother(self, params):
        """Simulation-smoother dispatch (see parallel_smoother docs)."""
        mode = self.parallel_smoother
        if self.observed is not None:
            # gap-masked series: only the general DK smoother threads
            # the observed mask
            return simulation_smoother
        if params.time_varying or mode is False:
            return simulation_smoother
        if mode == "pallas":
            return pallas_simulation_smoother
        if mode == "auto":
            if (jax.default_backend() == "tpu" and self.state_dim <= 6
                    and self.y.shape[0] >= 512 and self.chains_hint <= 32):
                return pallas_simulation_smoother
            return simulation_smoother
        return parallel_simulation_smoother

    # -- Gibbs sweep (StateSpacePosteriorSampler::draw analog) --------------
    def kernel(self):
        has_reg = self.predictors is not None
        # observation weights for the regularized-timestamp path: None
        # on the plain dense path (no extra work), else [T] floats with
        # 0 at gaps and n_t at multiplexed timepoints
        w_obs = None
        if self.obs_weights is not None:
            w_obs = jnp.asarray(self.obs_weights, self.y.dtype)
        elif self.observed is not None:
            w_obs = jnp.asarray(self.observed, self.y.dtype)
        n_obs = None if w_obs is None else jnp.sum(w_obs)
        if has_reg:
            if w_obs is None:
                xtx = self.predictors.T @ self.predictors
            else:
                xtx = self.predictors.T @ (w_obs[:, None]
                                           * self.predictors)
            draw_ind = (draw_indicators_swept
                        if valid_for_prior(self.reg_prior)
                        else draw_indicators_sweep)

        def sweep(key, state, do_marginal=True):
            # Order mirrors StateSpacePosteriorSampler::draw
            # (StateSpacePosteriorSampler.cpp:42-64): observation-model
            # draw and state-model draws condition on the CURRENT imputed
            # state; the state is re-imputed LAST. (Imputing first would
            # let the flexible trend absorb the regression signal on the
            # first sweep and trap chains in a no-regression mode.)
            k_state, k_obs, k_blocks = jax.random.split(key, 3)
            out = dict(state)
            params_cur = self.ssm_params(state)
            zs_cur = params_cur.zs(self.y.shape[0])
            state_contrib = jnp.einsum("td,td->t", zs_cur, state["alpha"])

            # 1. observation model draw | current state
            if has_reg:
                k1, k2, k3 = jax.random.split(k_obs, 3)
                y_reg = self.y - state_contrib
                if w_obs is None:
                    suf = RegSuf(xtx=xtx, xty=self.predictors.T @ y_reg,
                                 yty=y_reg @ y_reg,
                                 n=jnp.asarray(y_reg.shape[0],
                                               y_reg.dtype))
                else:
                    # regularized-timestamp path: gaps carry weight 0,
                    # duplicate timepoints weight n_t (weighted
                    # regression under the W inner product; the lost
                    # within-timestamp SS re-enters yty)
                    suf = RegSuf(
                        xtx=xtx,
                        xty=self.predictors.T @ (w_obs * y_reg),
                        yty=jnp.sum(w_obs * y_reg * y_reg)
                        + self.extra_obs_ss,
                        n=jnp.asarray(n_obs, y_reg.dtype))
                gamma = draw_ind(k1, suf, self.reg_prior, state["gamma"],
                                 self.reg_max_flips)
                sigsq = draw_sigsq(k2, suf, self.reg_prior, gamma)
                beta = draw_beta(k3, suf, self.reg_prior, gamma, sigsq)
                out["gamma"] = gamma
                out["beta"] = beta
                out["sigsq_obs"] = sigsq
            else:
                resid = self.y - state_contrib
                if w_obs is None:
                    out["sigsq_obs"] = self.obs_prior.draw_variance(
                        k_obs, resid.shape[0], jnp.sum(resid * resid))
                else:
                    out["sigsq_obs"] = self.obs_prior.draw_variance(
                        k_obs, n_obs,
                        jnp.sum(w_obs * resid * resid)
                        + self.extra_obs_ss)

            # 2. state-model parameter draws | current state path
            y_minus_reg = self.y
            if has_reg:
                y_minus_reg = self.y - self.predictors @ out["beta"]
            new_blocks = {}
            bkeys = jax.random.split(k_blocks, len(self.blocks))
            for (start, dim), b, bk in zip(self._slices(), self.blocks,
                                           bkeys):
                path = jax.lax.dynamic_slice_in_dim(
                    state["alpha"], start, dim, axis=1)
                if getattr(b, "needs_residual", False):
                    # regression-holiday-style blocks condition on the
                    # observation residual with their own contribution
                    # added back (reference
                    # ScalarRegressionHolidayStateModel::observe_state,
                    # RegressionHolidayStateModel.cpp:212-224)
                    z_b = jax.lax.dynamic_slice_in_dim(
                        zs_cur, start, dim, axis=1)
                    contrib_b = jnp.einsum("td,td->t", z_b, path)
                    resid_b = (y_minus_reg - state_contrib + contrib_b)
                    new_blocks[b.name] = b.draw_params(
                        bk, state["blocks"][b.name], path,
                        resid=resid_b, h=out["sigsq_obs"])
                else:
                    new_blocks[b.name] = b.draw_params(
                        bk, state["blocks"][b.name], path)
            out["blocks"] = new_blocks

            # 3. impute the state (Durbin-Koopman simulation smoother)
            y_adj = y_minus_reg
            params = self.ssm_params(out)
            # temporal-parallel smoothers assume a static system
            out["alpha"] = self._smoother(params)(k_state, params, y_adj,
                                                  self.observed)

            # 4. ASIS interweaving: non-centered re-draw of state sigmas
            if self.asis:
                for i in range(self.asis_passes):
                    k_asis = jax.random.fold_in(key, 17 + i)
                    out = self._asis_pass(k_asis, out, y_adj)

            # 5. marginal move on log variances (state integrated out)
            if self.marginal_sigma_slice and do_marginal:
                pass_fn = {"mtm": self._marginal_sigma_mtm,
                           "grid": self._marginal_sigma_grid,
                           "tim": self._marginal_sigma_tim,
                           "slice": self._marginal_sigma_pass}[
                    self.marginal_move]
                out = pass_fn(jax.random.fold_in(key, 977), out, y_adj)
            return out

        period = self.marginal_slice_period
        if not self.marginal_sigma_slice or period <= 1:
            return sweep

        def composite(key, state):
            # period-1 cheap conditional sweeps, then one sweep with
            # the marginal pass; counts as one recorded draw
            for i in range(period - 1):
                state = sweep(jax.random.fold_in(key, 10_000 + i),
                              state, do_marginal=False)
            return sweep(jax.random.fold_in(key, 10_999), state)

        return composite

    # -- marginal variance slice ---------------------------------------------
    def _sigma_groups(self):
        """(path, prior) pairs addressing every sliceable variance:
        path = (block_name, param_name) or ("sigsq_obs",)."""
        groups = []
        for b in self.blocks:
            for pname, prior, _dims in b.asis_groups():
                groups.append(((b.name, pname), prior))
        if self.predictors is None:
            groups.append((("sigsq_obs",), self.obs_prior))
        return groups

    def _marginal_sigma_pass(self, key, state, y_adj):
        """Coordinate slice on each log variance against the MARGINAL
        posterior p(sigma | y) = integral over state paths, evaluated by
        the Kalman filter. Composes with the conditional Gibbs sweep;
        breaks the path-parameter coupling that makes near-boundary
        variances mix at O(100)-sweep autocorrelation."""
        from boom_tpu.inference.kernels.slice import slice_step

        def set_param(st, path, value):
            out = dict(st)
            if path[0] == "sigsq_obs":
                out["sigsq_obs"] = value
                return out
            bname, pname = path
            out["blocks"] = dict(st["blocks"])
            out["blocks"][bname] = dict(st["blocks"][bname])
            out["blocks"][bname][pname] = value
            return out

        def sic_logp(sigsq, prior):
            df = prior.sample_size
            ss = prior.sample_size * prior.sigma_guess**2
            lp = -(0.5 * df + 1.0) * jnp.log(sigsq) - 0.5 * ss / sigsq
            if prior.upper_limit < float("inf"):
                lp = jnp.where(sigsq <= prior.upper_limit**2, lp,
                               -jnp.inf)
            return lp

        out = dict(state)
        groups = self._sigma_groups()
        keys = jax.random.split(key, max(len(groups), 1))
        for gk, (path, prior) in zip(keys, groups):
            cur = (out["sigsq_obs"] if path[0] == "sigsq_obs"
                   else out["blocks"][path[0]][path[1]])

            def logp(u, path=path, prior=prior):
                sigsq = jnp.exp(u)
                st = set_param(out, path, sigsq)
                ll = kalman_loglik(self.ssm_params(st), y_adj,
                                   self.observed)
                # + u: Jacobian of the log transform
                return ll + sic_logp(sigsq, prior) + u

            u_new = slice_step(
                gk, jnp.log(cur), logp, width=1.0,
                expand_iters=self.marginal_slice_expand,
                shrink_iters=self.marginal_slice_shrink)
            out = set_param(out, path, jnp.exp(u_new))

        # random-direction passes over the joint log-variance vector
        for r in range(self.marginal_slice_random_dirs):
            rk = jax.random.fold_in(key, 5000 + r)
            kd, ksl = jax.random.split(rk)
            u_vec = jnp.stack([
                jnp.log(out["sigsq_obs"] if path[0] == "sigsq_obs"
                        else out["blocks"][path[0]][path[1]])
                for path, _ in groups])
            direction = jax.random.normal(kd, (len(groups),))
            direction = direction / jnp.sqrt(jnp.sum(direction**2))

            def set_vec(st, u_vec):
                for (path, _prior), u in zip(groups, u_vec):
                    st = set_param(st, path, jnp.exp(u))
                return st

            def logp_dir(a, u_vec=u_vec, direction=direction):
                u = u_vec + a * direction
                st = set_vec(out, u)
                ll = kalman_loglik(self.ssm_params(st), y_adj,
                                   self.observed)
                lp = ll
                for (path, prior), ui in zip(groups, u):
                    lp = lp + sic_logp(jnp.exp(ui), prior) + ui
                return lp

            a_new = slice_step(
                ksl, jnp.zeros(()), logp_dir, width=1.0,
                expand_iters=self.marginal_slice_expand,
                shrink_iters=self.marginal_slice_shrink)
            out = set_vec(out, u_vec + a_new * direction)
        return out

    def _marginal_helpers(self, state, y_adj, groups):
        """(get, set_param, lp_one, lp_batch) over the variance groups:
        lp evaluates marginal loglik (Kalman, state integrated out)
        + SIC prior + log-transform Jacobian at a [G] log-variance
        vector; lp_batch vmaps it over a candidate axis."""

        def get(st, path):
            return (st["sigsq_obs"] if path[0] == "sigsq_obs"
                    else st["blocks"][path[0]][path[1]])

        def set_param(st, path, value):
            out = dict(st)
            if path[0] == "sigsq_obs":
                out["sigsq_obs"] = value
                return out
            bname, pname = path
            out["blocks"] = dict(st["blocks"])
            out["blocks"][bname] = dict(st["blocks"][bname])
            out["blocks"][bname][pname] = value
            return out

        def sic_logp(sigsq, prior):
            df = prior.sample_size
            ss = prior.sample_size * prior.sigma_guess**2
            lp = -(0.5 * df + 1.0) * jnp.log(sigsq) - 0.5 * ss / sigsq
            if prior.upper_limit < float("inf"):
                lp = jnp.where(sigsq <= prior.upper_limit**2, lp,
                               -jnp.inf)
            return lp

        def lp_one(u_vec):
            st = state
            for (path, _prior), u in zip(groups, u_vec):
                st = set_param(st, path, jnp.exp(u))
            lp = kalman_loglik(self.ssm_params(st), y_adj,
                               self.observed)
            for (path, prior), u in zip(groups, u_vec):
                lp = lp + sic_logp(jnp.exp(u), prior) + u
            return lp

        return get, set_param, lp_one, jax.vmap(lp_one)

    def _build_tim_proposal(self):
        """(mode [G], chol [G, G]) of the multivariate-T tailored to
        p(log variances | y) — reference TIM::locate_mode (TIM.hpp:42)
        applied to the Kalman-marginal posterior. For regression models
        the proposal is tailored at beta = 0; independence-MH acceptance
        corrects exactly, only efficiency varies."""
        from boom_tpu import numopt

        groups = self._sigma_groups()
        if not groups:
            return None
        key0 = jax.random.key(0)
        template = {
            "blocks": {b.name: b.init_params(jax.random.fold_in(key0, i))
                       for i, b in enumerate(self.blocks)},
            "sigsq_obs": jnp.var(self.y) * 0.5,
            "alpha": jnp.zeros((self.t_len, self.state_dim)),
        }
        y_fit = self.y
        if self.predictors is not None:
            # tailor at the OLS fit rather than beta = 0: the proposal
            # only needs to be near the marginal the chain will visit
            # (acceptance is exact either way, efficiency is not)
            x = self.predictors
            beta_ols = jnp.linalg.lstsq(x, self.y)[0]
            y_fit = self.y - x @ beta_ols
        _get, _set, lp_one, _ = self._marginal_helpers(
            template, y_fit, groups)

        def neg(u):
            lp = lp_one(u)
            # smooth the prior's hard upper-limit truncation out of the
            # mode search; candidates beyond the limit are rejected by
            # the exact acceptance anyway
            return -jnp.where(jnp.isfinite(lp), lp, -1e30)

        u0 = jnp.stack([
            jnp.log(jnp.asarray(prior.sigma_guess ** 2,
                                self.y.dtype))
            for _path, prior in groups])
        # BFGS first (robust far from the mode, where the marginal is
        # ridge-shaped and raw Newton stalls at saddles), Newton polish
        res = numopt.bfgs(neg, u0, max_iters=120)
        res = numopt.newton_raphson(neg, res.x, max_iters=10)
        mode = res.x
        h = jax.hessian(neg)(mode)
        h = 0.5 * (h + h.T)
        # eigen-clamp: the exact Hessian can be indefinite along a
        # near-flat boundary direction; clamping keeps the proposal
        # covariance finite and WIDE along flat directions (df-3 tails
        # + exact acceptance absorb any remaining mismatch)
        w, v = jnp.linalg.eigh(h)
        w = jnp.maximum(w, 1e-3 * jnp.maximum(jnp.max(w), 1.0))
        cov = (v / w[None, :]) @ v.T
        cov = (0.5 * (cov + cov.T)) * self.marginal_tim_inflate ** 2
        chol = jnp.linalg.cholesky(cov)
        return (jax.device_get(mode), jax.device_get(chol))

    def _marginal_sigma_tim(self, key, state, y_adj):
        """Multiple-try INDEPENDENCE MH from the tailored-T proposal
        (see marginal_move="tim"): k iid proposal draws + the current
        point scored in one candidate-batched loglik pass; select J
        w.p. proportional to the importance weight w = pi/q; accept
        with min(1, sum_i w(y_i) / [sum_{i != J} w(y_i) + w(x)]) —
        the MTM independence sampler (Liu-Liang-Wong 2000 §3), whose
        reference set reuses the candidate scores because q does not
        depend on the current point."""
        groups = self._sigma_groups()
        if not groups:
            return dict(state)
        mode, chol = self._tim_prop
        mode = jnp.asarray(mode, y_adj.dtype)
        chol = jnp.asarray(chol, y_adj.dtype)
        df = self.marginal_tim_df
        get, set_param, lp_one, lp_batch = self._marginal_helpers(
            state, y_adj, groups)

        u_cur = jnp.stack([jnp.log(get(state, path))
                           for path, _ in groups])
        k1, k2, k3 = jax.random.split(key, 3)
        k_tr = self.marginal_tim_trials
        cands = dists.mvt.sample(k1, mode, None, df, chol=chol,
                                 shape=(k_tr,))
        pts = jnp.concatenate([cands, u_cur[None, :]], axis=0)
        lps = lp_batch(pts)  # ONE batched filter scan
        lqs = dists.mvt.logpdf(pts, mode, None, df, chol=chol)
        w = lps - lqs  # log importance weights [k+1]
        j = jax.random.categorical(k2, w[:k_tr])
        sum_y = jax.scipy.special.logsumexp(w[:k_tr])
        sum_x = jax.scipy.special.logsumexp(w[:k_tr].at[j].set(w[k_tr]))
        accept = jnp.log(jax.random.uniform(
            k3, (), u_cur.dtype,
            minval=jnp.finfo(u_cur.dtype).tiny)) < sum_y - sum_x
        u_new = jnp.where(accept, pts[j], u_cur)

        out = dict(state)
        for gi, (path, _prior) in enumerate(groups):
            out = set_param(out, path, jnp.exp(u_new[gi]))
        return out

    def _marginal_sigma_grid(self, key, state, y_adj):
        """Deterministic symmetric-grid multiple-try move on the log
        variances (see the marginal_move="grid" dataclass comment for
        the invariance argument). Per coordinate (and per extra random
        direction): one batched pass scores the offset grid at the
        current point, a point is selected w.p. proportional to pi, a
        second batched pass scores the grid at the selected point, and
        the move accepts with min(1, S_x/S_y)."""
        groups = self._sigma_groups()
        n_g = len(groups)
        if n_g == 0:
            return dict(state)
        get, set_param, lp_one, lp_batch = self._marginal_helpers(
            state, y_adj, groups)

        lo, hi = self.marginal_grid_range
        half = jnp.exp(jnp.linspace(jnp.log(lo), jnp.log(hi),
                                    self.marginal_grid_points))
        offs = jnp.concatenate([-half[::-1], half])  # symmetric [2k]

        u_cur = jnp.stack([jnp.log(get(state, path))
                           for path, _ in groups])

        # all moves (G coordinates + random directions) as ONE scanned
        # body over a stacked direction array — the move body holds two
        # candidate-batched filter scans, so python-unrolling it per
        # direction multiplies the HLO by the direction count
        eye = jnp.eye(n_g, dtype=u_cur.dtype)
        kd = jax.random.fold_in(key, 555)
        rdirs = jax.random.normal(
            kd, (max(self.marginal_grid_dirs, 1), n_g), u_cur.dtype)
        rdirs = rdirs / jnp.sqrt(
            jnp.sum(rdirs * rdirs, axis=1, keepdims=True))
        dirs = (jnp.concatenate([eye, rdirs], axis=0)
                if self.marginal_grid_dirs > 0 else eye)

        def one_direction(u_cur, inp):
            d_vec, kd_ = inp
            k_sel, k_acc = jax.random.split(kd_)
            ys = u_cur[None, :] + offs[:, None] * d_vec[None, :]
            lp_y = lp_batch(ys)
            j = jax.random.categorical(k_sel, lp_y)
            y_sel = ys[j]
            xs = y_sel[None, :] + offs[:, None] * d_vec[None, :]
            lp_x = lp_batch(xs)
            log_acc = (jax.scipy.special.logsumexp(lp_y)
                       - jax.scipy.special.logsumexp(lp_x))
            accept = jnp.log(jax.random.uniform(
                k_acc, (), u_cur.dtype,
                minval=jnp.finfo(u_cur.dtype).tiny)) < log_acc
            return jnp.where(accept, y_sel, u_cur), None

        u_cur, _ = jax.lax.scan(
            one_direction, u_cur,
            (dirs, jax.random.split(key, dirs.shape[0])))

        out = dict(state)
        for gi, (path, _prior) in enumerate(groups):
            out = set_param(out, path, jnp.exp(u_cur[gi]))
        return out

    def _marginal_sigma_mtm(self, key, state, y_adj):
        """Multiple-try Metropolis on the joint log-variance vector with
        the state path integrated out by the Kalman filter.

        Each move: draw `marginal_mtm_trials` candidates y_i = u + s_i e_i
        (per-slot scales s_i from a geometric ladder), score ALL of them
        with one candidate-batched loglik-only filter pass, pick j w.p.
        proportional to pi(y_j), draw the reference set x*_i = y_j + s_i
        e'_i (x*_j = u) and score it with a second batched pass, accept
        with min(1, sum pi(y)/sum pi(x*)). Per-slot proposals T_i are
        symmetric, so with lambda_i = 1/T_i the MTM weights reduce to
        w_i = pi(y_i) and the move is exactly invariant.

        Why MTM and not slice here: the sweep's unit cost is SEQUENTIAL
        time-axis scans, and a slice move needs ~15 of them; MTM needs 2,
        with the candidate axis batched into the scan step (16 candidates
        of d=2 filter work per chain don't approach VPU saturation).
        After the jump the conditional sweep's smoother re-imputes the
        state, so this composes exactly like the slice variant."""
        groups = self._sigma_groups()
        n_g = len(groups)
        if n_g == 0:
            return dict(state)
        k_trials = self.marginal_mtm_trials
        lo, hi = self.marginal_mtm_ladder
        # Trial slots: one block of ladder-scaled slots PER COORDINATE
        # (one-hot directions — the coordinate-slice move's adaptivity,
        # bought with batch width: some rung of the ladder is always at
        # the coordinate's local scale) plus one block of joint slots.
        # Heterogeneous per-slot proposals are valid MTM: each slot i
        # pairs its candidate with a reference drawn from the SAME
        # symmetric T_i, so w_i = pi(y_i) slot-wise.
        blocks = n_g + 1
        per_block = max(k_trials // blocks, 2)
        k_trials = per_block * blocks
        ladder = self.marginal_mtm_width * jnp.exp(
            jnp.linspace(jnp.log(lo), jnp.log(hi), per_block))
        dirs = jnp.concatenate(
            [jnp.repeat(jnp.eye(n_g), per_block, axis=0),
             jnp.ones((per_block, n_g))], axis=0)  # [k, G]
        scales = jnp.tile(ladder, blocks)[:, None] * dirs  # [k, G]

        get, set_param, lp_one, lp_batch = self._marginal_helpers(
            state, y_adj, groups)

        u_cur = jnp.stack([jnp.log(get(state, path))
                           for path, _ in groups])
        lp_cur = lp_one(u_cur)
        for m in range(self.marginal_mtm_moves):
            km = jax.random.fold_in(key, m)
            k1, k2, k3, k4 = jax.random.split(km, 4)
            eps = jax.random.normal(k1, (k_trials, n_g), u_cur.dtype)
            ys = u_cur[None, :] + scales * eps
            lp_y = lp_batch(ys)
            j = jax.random.categorical(k2, lp_y)
            y_sel = ys[j]
            eps2 = jax.random.normal(k3, (k_trials, n_g), u_cur.dtype)
            xs = y_sel[None, :] + scales * eps2
            xs = xs.at[j].set(u_cur)
            lp_x = lp_batch(xs).at[j].set(lp_cur)
            log_acc = (jax.scipy.special.logsumexp(lp_y)
                       - jax.scipy.special.logsumexp(lp_x))
            accept = jnp.log(jax.random.uniform(
                k4, (), u_cur.dtype,
                minval=jnp.finfo(u_cur.dtype).tiny)) < log_acc
            u_cur = jnp.where(accept, y_sel, u_cur)
            lp_cur = jnp.where(accept, lp_y[j], lp_cur)

        out = dict(state)
        for gi, (path, _prior) in enumerate(groups):
            out = set_param(out, path, jnp.exp(u_cur[gi]))
        return out

    # -- ASIS interweaving ---------------------------------------------------
    def _asis_pass(self, key, state, y_adj):
        return asis_redraw(key, self.blocks, self.ssm_params(state), state,
                           y_adj, state["sigsq_obs"])

    def mle(self, state=None, max_iters: int = 200):
        """Maximum-likelihood variance estimates via BFGS on the exact
        marginal log likelihood (autodiff through the Kalman filter) —
        the reference's secondary inference mode (ModelTypes.hpp:138
        MLE_Model; StateSpaceModelBase.cpp:563 average_over_latent_data
        drives its gradient; here the filter is simply differentiated).
        Optimizes the log of every variance addressed by _sigma_groups;
        regression coefficients (if any) are held at `state`'s values.
        Returns (state_with_mle_variances, loglik)."""
        from boom_tpu import numopt

        if state is None:
            state = self.init_state(jax.random.key(0))
        groups = self._sigma_groups()
        assert groups, "no variance parameters to optimize"

        def set_all(st, us):
            out = dict(st)
            out["blocks"] = {k: dict(v) for k, v in st["blocks"].items()}
            for (path, _prior), u in zip(groups, us):
                if path[0] == "sigsq_obs":
                    out["sigsq_obs"] = jnp.exp(u)
                else:
                    out["blocks"][path[0]][path[1]] = jnp.exp(u)
            return out

        y_adj = self.y
        if self.predictors is not None:
            y_adj = self.y - self.predictors @ state["beta"]

        def neg_loglik(us):
            st = set_all(state, us)
            return -kalman_loglik(self.ssm_params(st), y_adj,
                                  self.observed)

        u0 = jnp.stack([
            jnp.log(state["sigsq_obs"] if path[0] == "sigsq_obs"
                    else state["blocks"][path[0]][path[1]])
            for path, _ in groups])
        res = numopt.bfgs(neg_loglik, u0, max_iters=max_iters)
        st = set_all(state, res.x)
        return st, -res.value

    # -- likelihood / contributions -----------------------------------------
    def log_lik(self, state):
        y_adj = self.y
        if self.predictors is not None:
            y_adj = self.y - self.predictors @ state["beta"]
        return kalman_loglik(self.ssm_params(state), y_adj,
                             self.observed)

    def state_contributions(self, state):
        """Per-block contribution paths {name: [T]} (bsts plot analog)."""
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
        if self.predictors is not None:
            out["regression"] = self.predictors @ state["beta"]
        return out

    # -- forecasting (bsts predict analog, model_manager.h:256) --------------
    def predict(self, key, final_state, horizon: int, future_z=None,
                future_q_scale=None):
        """Simulate y_{T+1:T+h} given one posterior draw's parameters and
        final imputed state (reference ScalarModelManager::Forecast).

        For time-varying blocks supply per-block futures:
          future_z: {block_name: [h, block_dim]} observation rows
            (e.g. future predictors for DynamicRegression, future holiday
            one-hots for RandomWalkHoliday; bsts predict's newdata arg)
          future_q_scale: {block_name: [h, block_err_dim]} sd scales.
        Static blocks need no entries.
        """
        future_z = future_z or {}
        future_q_scale = future_q_scale or {}
        params = self.ssm_params(final_state)
        alpha_t = final_state["alpha"][-1]
        q_dim = params.q_mat.shape[0]
        q_chol = jnp.linalg.cholesky(
            params.q_mat + 1e-12 * jnp.eye(q_dim)) if q_dim else params.q_mat

        # assemble future z rows [h, d]
        z_rows = []
        for b in self.blocks:
            if b.name in future_z:
                z_rows.append(jnp.asarray(future_z[b.name]))
            elif hasattr(b, "z_seq") or hasattr(b, "z_seq_params"):
                hint = (" (holiday blocks: use "
                        "block.future_z_rows(params, which_holiday, "
                        "which_day))"
                        if hasattr(b, "future_z_rows") else "")
                raise ValueError(
                    f"block {b.name!r} has time-varying Z; pass "
                    f"future_z[{b.name!r}] with shape "
                    f"[{horizon}, {b.dim}]{hint}")
            else:
                z_rows.append(jnp.broadcast_to(b.z(), (horizon, b.dim)))
        z_fut = jnp.concatenate(z_rows, axis=-1)

        s_rows = []
        for b in self.blocks:
            if b.name in future_q_scale:
                s_rows.append(jnp.asarray(future_q_scale[b.name]))
            elif hasattr(b, "future_q_scale"):
                # calendar-driven blocks (MonthlyAnnualCycle) continue
                # their own innovation gating into the forecast period
                s_rows.append(b.future_q_scale(self.t_len, horizon))
            else:
                s_rows.append(jnp.ones((horizon, b.err_dim)))
        s_fut = jnp.concatenate(s_rows, axis=-1)

        # forecast-period transitions: static unless a block rotates on
        # the calendar (t_seq blocks expose future_t_rows)
        t_fut = None
        if self._time_varying_t:
            mats = []
            for b in self.blocks:
                if hasattr(b, "future_t_rows"):
                    mats.append(b.future_t_rows(self.t_len, horizon))
                else:
                    t_b, _, _ = b.build(final_state["blocks"][b.name])
                    mats.append(jnp.broadcast_to(
                        t_b, (horizon,) + t_b.shape))
            t_fut = jax.vmap(lambda *ms: _block_diag(list(ms)))(*mats)

        k_scan = jax.random.split(key, horizon)

        from boom_tpu.statespace.kalman import _mv

        def step(alpha, inp):
            k, z_t, s_t, t_t = inp
            k_eta, k_eps = jax.random.split(k)
            eta = (s_t * _mv(q_chol, jax.random.normal(k_eta, (q_dim,)))
                   if q_dim else jnp.zeros((0,)))
            alpha_next = _mv(t_t, alpha) + _mv(params.r_mat, eta)
            y_next = (jnp.sum(z_t * alpha_next, -1)
                      + jnp.sqrt(final_state["sigsq_obs"])
                      * jax.random.normal(k_eps))
            return alpha_next, y_next

        if t_fut is None:
            t_fut = jnp.broadcast_to(params.t_mat,
                                     (horizon,) + params.t_mat.shape)
        _, ys = jax.lax.scan(step, alpha_t, (k_scan, z_fut, s_fut, t_fut))
        return ys


def asis_redraw(key, blocks, params, state, y_adj, h, slice_steps=8):
    """Non-centered (ancillary) re-draw of each state-innovation sigma.

    For each variance group: hold the standardized innovations
    tilde_eta = eta / sigma and the initial state fixed, so the state
    path is affine in sigma: alpha(sigma) = alpha_rest + sigma * D,
    where D is the path driven by tilde_eta alone. The conditional of
    sigma is then 1-d with Gaussian likelihood terms (A, B) and the
    SdPrior density; a bounded slice step redraws it, and the path is
    rescaled. Composing this with the centered draw is the
    ancillarity-sufficiency interweaving of Yu & Meng (2011) /
    Fruhwirth-Schnatter & Wagner (2010) — it removes the slow mixing
    of small state variances that the reference's pure centered
    sampler exhibits.

    `h` is the observation variance: scalar (Gaussian bsts) or [T]
    (latent-Gaussian reductions of logit/Poisson/student families).

    Joint form: with G groups, alpha = alpha_base + sum_g sigma_g D_g
    where each D_g (driven by its group's standardized innovations) is
    INVARIANT under rescaling — so the expensive T-length recurrences run
    once, the G x G Gram matrix of the D contributions is precomputed,
    and `slice_steps` rounds of alternating scalar slice-Gibbs on the
    sigmas cost only scalar work. This matches many interweaving passes
    (which alternate the same conditionals) at a single pass's price —
    on the bsts local-linear-trend benchmark it tripled the ESS of the
    slow slope variance."""
    from boom_tpu.inference.kernels.slice import slice_step

    from boom_tpu.statespace.kalman import _mv

    alpha = state["alpha"]
    t_mat, r_mat = params.t_mat, params.r_mat
    zs = params.zs(alpha.shape[0])
    # innovations [T-1, q]: R is column-orthonormal (selector/identity).
    # Elementwise mul-sum products (see kalman._mm for why not `@`).
    diff = alpha[1:] - _mv(t_mat, alpha[:-1])
    eta = jnp.sum(r_mat * diff[..., :, None], axis=-2)

    new_blocks = {name: dict(v) for name, v in state["blocks"].items()}
    groups = []
    offset = 0
    for b in blocks:
        for pname, prior, dims in b.asis_groups():
            groups.append((b.name, pname, prior,
                           tuple(offset + d for d in dims)))
        offset += b.err_dim
    n_groups = len(groups)
    if n_groups == 0:
        return dict(state)

    # --- D-path recurrences, ALL groups in one stacked scan -------------
    # (the only T-length work of the ASIS pass; groups share t_mat, so
    # stacking them as a leading axis of the scan carry fuses G scans
    # into one — time-axis scan count is the sweep's unit cost)
    sig_curs = [jnp.sqrt(jnp.maximum(new_blocks[b][p], 1e-30))
                for (b, p, _prior, _dims) in groups]
    sigs = jnp.stack(sig_curs)  # [G]
    cols_mat = jnp.zeros((n_groups, eta.shape[1]), alpha.dtype)
    for gi, (_b, _p, _prior, dims) in enumerate(groups):
        for dcol in dims:
            cols_mat = cols_mat.at[gi, dcol].set(1.0)
    # tilde[t, g, :] = group-g masked standardized innovations
    tilde = (eta[:, None, :] * cols_mat[None, :, :]
             / sigs[None, :, None])  # [T-1, G, q]
    w_all = jnp.einsum("dq,tgq->tgd", r_mat, tilde)  # [T-1, G, d]

    def rec(dprev, w_t):  # dprev [G, d]
        dnext = _mv(t_mat, dprev) + w_t
        return dnext, dnext

    d0 = jnp.zeros((n_groups, alpha.shape[1]), alpha.dtype)
    _, dstack = jax.lax.scan(rec, d0, w_all, unroll=8)
    dstack = jnp.concatenate([d0[None], dstack], axis=0)  # [T, G, d]
    dpaths = [dstack[:, gi] for gi in range(n_groups)]
    g_mat = jnp.einsum("td,tgd->gt", zs, dstack)  # [G, T]
    alpha_base = alpha - jnp.einsum("g,tgd->td", sigs, dstack)
    r0 = y_adj - jnp.einsum("td,td->t", zs, alpha_base)  # [T]
    gram = jnp.einsum("gt,et->ge", g_mat / h, g_mat)  # [G, G]
    c_vec = jnp.einsum("gt,t->g", g_mat / h, r0)  # [G]

    # --- alternating scalar slice-Gibbs over the sigmas ------------------
    for it in range(slice_steps):
        for gi, (bname, pname, prior, dims) in enumerate(groups):
            gk = jax.random.fold_in(key, it * n_groups + gi)
            a_coef = gram[gi, gi]
            others = c_vec[gi] - (gram[gi] @ sigs - gram[gi, gi] * sigs[gi])
            df = prior.sample_size
            pss = prior.sample_size * prior.sigma_guess**2
            upper = prior.upper_limit if prior.upper_limit < float(
                "inf") else 1e6

            def logp(sig):
                sigsq = sig * sig
                # SdPrior density on sigma: SIC(sig^2) * 2 sig
                lp = (-(0.5 * df + 1.0) * jnp.log(sigsq)
                      - 0.5 * pss / sigsq + jnp.log(2.0 * sig))
                return lp + others * sig - 0.5 * a_coef * sigsq

            width = jnp.maximum(sigs[gi], 0.05 * prior.sigma_guess)
            # bounded fixed-trip counts: each eval here is scalar-cheap,
            # but the default 16/32 trips are ~1300 sequential tiny ops
            # per sweep — pure dispatch latency on TPU. 1-d log-concave-
            # ish conditionals bracket in far fewer trips; unconverged
            # lanes keep the current point (still exactly invariant).
            sig_new = slice_step(gk, sigs[gi], logp, width,
                                 lower=1e-12, upper=upper,
                                 expand_iters=5, shrink_iters=10)
            sigs = sigs.at[gi].set(sig_new)

    # --- rebuild state -----------------------------------------------------
    alpha = alpha_base + sum(
        sigs[gi] * dpaths[gi] for gi in range(n_groups))
    for gi, (bname, pname, prior, dims) in enumerate(groups):
        new_blocks[bname][pname] = sigs[gi] * sigs[gi]

    out = dict(state)
    out["alpha"] = alpha
    out["blocks"] = new_blocks
    return out


def one_step_prediction_errors(model, states, standardize=True):
    """Standardized one-step-ahead prediction errors v_t / sqrt(F_t) for
    a batch of posterior draws (reference bsts.cc:197
    one-step-prediction-errors path; StateSpaceModel.cpp
    one_step_prediction_errors). The filter assimilates EVERY observation,
    so each error is a genuine one-step error conditioned on y_{1:t-1} and
    the draw's parameters. For out-of-sample holdout errors the parameter
    draws must come from a fit to the training slice only — use
    :func:`holdout_prediction_errors`, which refits and then filters
    through the holdout (the reference's
    simulate_holdout_prediction_errors semantics).

    states: pytree with leading draw axis (e.g. McmcResult.stacked()).
    standardize=False returns the raw errors v_t (the reference's
    bsts.prediction.errors(standardize = FALSE) path, used by
    PlotBstsForecastDistribution: forecast = y - raw errors).
    Returns [draws, T]."""

    def one(state):
        y_adj = model.y
        if model.predictors is not None:
            y_adj = model.y - model.predictors @ state["beta"]
        filt = kalman_filter(model.ssm_params(state), y_adj)
        if standardize:
            return filt.v / jnp.sqrt(filt.f)
        return filt.v

    return jax.jit(jax.vmap(one))(states)


def _training_slice(model, cutpoint: int):
    """The same model restricted to y_{1:cutpoint} (reference
    simulate_holdout_prediction_errors clears data and re-adds the
    training points, StateSpaceModel.cpp:231-249)."""
    repl = {"y": model.y[:cutpoint]}
    if model.predictors is not None:
        repl["predictors"] = model.predictors[:cutpoint]
    return dataclasses.replace(model, **repl)


def holdout_prediction_errors(model, key, cutpoint: int, num_draws: int = 100,
                              *, num_chains: int = 2, burn: int = 100,
                              max_draws: int = 50):
    """True out-of-sample one-step errors past ``cutpoint``.

    Reference semantics (StateSpaceModel.cpp:212
    one_step_holdout_prediction_errors + :231
    simulate_holdout_prediction_errors; driven per-cutpoint by the
    HoldoutErrorSampler thread fan-out, bsts/src/model_manager.h:38 and
    state_space_gaussian_model_manager.cc:202-211): the model is REFIT to
    y_{1:cutpoint} so parameter draws are conditioned on training data
    only, then for each draw one Kalman pass filters through the FULL
    series, assimilating each holdout observation — so every post-cutpoint
    error is a one-step error, not a cumulative forecast error. (The
    reference seeds the holdout filter with the drawn final state; we use
    the filtered distribution at the cutpoint, which additionally
    integrates over state uncertainty.)

    Returns standardized errors [draws, T]: columns < cutpoint are
    in-sample one-step errors, columns >= cutpoint are holdout errors.
    Note: blocks whose time-varying Z/q-scale sequences are tied to the
    full-length series (e.g. DynamicRegression) are evaluated on their
    first `cutpoint` entries for the training fit."""
    from boom_tpu.inference.driver import run_mcmc

    train = _training_slice(model, cutpoint)
    res = run_mcmc(key, train.kernel(), train.init_state,
                   num_draws=max(1, num_draws // num_chains),
                   num_chains=num_chains, burn=burn)
    flat = res.stacked()
    total = jax.tree_util.tree_leaves(flat)[0].shape[0]
    take = min(max_draws, total)
    idx = jnp.linspace(0, total - 1, take).astype(jnp.int32)
    states = jax.tree_util.tree_map(lambda a: a[idx], flat)

    def one(state):
        y_adj = model.y
        if model.predictors is not None:
            y_adj = model.y - model.predictors @ state["beta"]
        filt = kalman_filter(model.ssm_params(state), y_adj)
        return filt.v / jnp.sqrt(filt.f)

    return jax.jit(jax.vmap(one))(states)


def compare_bsts_models(models_and_results, cutpoint=None, max_draws=50,
                        *, key=None, num_draws: int = 100, burn: int = 100):
    """Cumulative absolute one-step prediction errors per model — the
    data behind R's CompareBstsModels plot (bsts/R/compare.bsts.models.R).

    models_and_results: {name: (model, McmcResult)}. With cutpoint=None
    the given results' (full-data) draws yield in-sample one-step errors —
    R's default. With a cutpoint, each model is REFIT to y_{1:cutpoint}
    (pass `key`) and errors past the cutpoint are genuine out-of-sample
    one-step errors, matching the reference's holdout semantics.
    Returns {name: [T] cumulative |standardized error|}."""
    out = {}
    for i, (name, (model, result)) in enumerate(models_and_results.items()):
        if cutpoint is None:
            flat = result.stacked()
            total = jax.tree_util.tree_leaves(flat)[0].shape[0]
            take = min(max_draws, total)
            idx = jnp.linspace(0, total - 1, take).astype(jnp.int32)
            sub = jax.tree_util.tree_map(lambda a: a[idx], flat)
            errs = one_step_prediction_errors(model, sub)
        else:
            assert key is not None, "pass key= to refit at a cutpoint"
            errs = holdout_prediction_errors(
                model, jax.random.fold_in(key, i), cutpoint,
                num_draws=num_draws, burn=burn, max_draws=max_draws)
        out[name] = jnp.cumsum(jnp.mean(jnp.abs(errs), 0))
    return out
