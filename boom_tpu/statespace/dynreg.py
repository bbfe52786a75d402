"""Wide dynamic regression with time-varying spike-and-slab selection.

Reference: Models/StateSpace/DynamicRegression.hpp:32
(DynamicRegressionModel: y_t = X_t beta_t + eps, eps ~ N(0, sigma^2 I),
multiple observations allowed per time point; each coefficient's
inclusion indicator gamma[t, j] follows its own 2-state Markov chain;
included coefficients evolve as a random walk with per-coefficient
innovation variance tau_j^2 * sigma^2, and a coefficient re-entering
after exclusion restarts fresh from N(0, tau_j^2 sigma^2) — the
ProductSelectorMatrix transition at DynamicRegression.cpp:245-260; the
Kalman machinery is the specialized DynamicRegressionKalmanFilter at
:269), Models/StateSpace/PosteriorSamplers/DynamicRegressionDirectGibbs
.cpp (the direct Gibbs blocking: indicators, then FFBS coefficients,
then conjugate variance/transition draws), and the Python front end
Interfaces/python/dynreg/BayesBoom/dynreg/dynreg.py
(SparseDynamicRegressionModel).

Sampler redesign (exact where the reference approximates): the
reference's indicator flip integrates the time-t coefficients under a
ZERO-centered local prior whose variance is a Brownian-bridge factor
(DynamicRegressionDirectGibbs.cpp:114-190). That approximation ignores
the neighboring coefficient VALUES, so for a coefficient that has
drifted far from zero the local prior shrinks its fit to nothing,
inflates the local residual, and biases every OTHER indicator toward
inclusion — measurably so outside the huge-n_t regime. Here both
indicator moves are exact:

  * Single-site pass: draw (gamma[t, j], beta[t, j]) JOINTLY given
    everything else, with beta[t, j] integrated out in closed form
    against its exact conditional prior (random walk from beta[t-1, j]
    or fresh, plus the beta[t+1, j] transition as a pseudo-observation).
    Scalar Gaussian algebra, O(p) per flip — no per-flip Cholesky at
    all. The time axis is RED-BLACK decomposed (all even t in parallel,
    then all odd t; gamma/beta couple across time only through t+-1),
    predictors scanned sequentially within a time point.
  * Collapsed column move: an independence-MH proposal of coefficient
    j's WHOLE inclusion path from its Markov prior, accepted against
    the EXACT marginal likelihood with beta[:, j] fully integrated by a
    scalar Kalman filter over T (the sticky chain makes interior
    single-site flips nearly immovable; whole-column proposals jump
    between sparse and dense patterns in one step). The Markov prior
    cancels in the ratio.
  * Coefficients | inclusion: masked fixed-shape FFBS (the
    DynamicRegressionKalmanFilter analog) — one forward information
    scan + one backward sampling scan over [p, p] systems.
  * sigma^2, tau_j^2, transition probabilities: conjugate draws exactly
    as the reference (DynamicRegressionDirectGibbs.cpp:224-268).

TPU notes: data enter as [T, n, p] with an observation mask (ragged
time points are padding), pre-reduced to per-time sufstats xtx/xty/yty
— the reference's RegressionDataTimePoint stores the same sufstats.
The single-site pass is a vmap over T/2 time points of an O(p^2) scan;
the column move is p scalar scans of length T; FFBS is the only [p, p]
work. Everything is one jitted program; chains vmap.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from boom_tpu import dists
from boom_tpu.linalg import masked
from boom_tpu.statespace.state_models import SdPrior


@dataclasses.dataclass(frozen=True)
class MarkovInclusionPrior:
    """Independent Beta priors on the per-predictor inclusion-chain
    transition probabilities (reference infer_Markov_prior,
    DynamicRegressionDirectGibbs.cpp:270-301: stationary inclusion
    probability + expected run length + prior sample size)."""

    prior_inclusion_prob: float = 0.2
    expected_run_length: float = 20.0
    sample_size: float = 2.0

    def beta_params(self):
        """((a01, b01), (a10, b10)) for q01 = P(0->1), q10 = P(1->0)."""
        q10 = 1.0 / self.expected_run_length
        pi = self.prior_inclusion_prob
        q01 = min(max(q10 * pi / max(1.0 - pi, 1e-6), 1e-4), 0.9999)
        n = self.sample_size
        return ((n * q01, n * (1.0 - q01)), (n * q10, n * (1.0 - q10)))


def _local_evidence(a, s, m0, v0, nxt_on, beta_next, tau_sq):
    """log[evidence(gamma=on)] - log[evidence(gamma=off)] for one
    coefficient at one time, with the coefficient integrated out.

    a = x_j' r (r = residual with j's contribution removed), s = x_j'x_j,
    prior beta ~ N(m0, sigsq*v0); if the coefficient is included at t+1
    its value beta_next enters as a pseudo-observation with variance
    sigsq*tau_sq (random walk) — the fresh-restart density for the off
    case cancels against the same term in the on case. All quantities
    unscaled by sigsq except the output, which the caller divides."""
    q = 1.0 / v0 + s + jnp.where(nxt_on, 1.0 / tau_sq, 0.0)
    b = m0 / v0 + a + jnp.where(nxt_on, beta_next / tau_sq, 0.0)
    # off-case: the future transition is a fresh restart N(0, tau_sq),
    # whose beta_next^2 term cancels with the on-case completed square;
    # what remains is below (derivation in module docstring commit).
    return (-0.5 * jnp.log(v0 * q), -0.5 * (m0 * m0 / v0 - b * b / q),
            b, q)


@dataclasses.dataclass(frozen=True)
class SparseDynamicRegression:
    """Dynamic regression with Markov spike-slab coefficient selection.

    x: [T, p] (one observation per time point) or [T, n, p] (n per
    point, ragged via obs_mask). y matches x's leading shape.
    """

    x: jax.Array
    y: jax.Array
    obs_mask: jax.Array | None = None  # [T, n] bool for ragged points
    residual_prior: SdPrior | None = None
    innovation_prior: SdPrior | None = None  # on tau_j (unscaled)
    inclusion_prior: MarkovInclusionPrior = MarkovInclusionPrior()
    column_moves: bool = True
    # How the collapsed column moves execute:
    #   "sequential" — exact serial scan over columns, 3 T-length scans
    #       per column (the r3 kernel). O(p) sequential scans per sweep:
    #       fine for small p, crawls at p ~ hundreds ("wide" regime).
    #   "parallel"   — ALL p proposals drawn and scored against the
    #       pass-start state in 2 batched T-scans, then accepted in a
    #       random order with the staleness-exact rule: a column's
    #       precomputed acceptance is valid until some EARLIER accepted
    #       column changed the shared residual, and a column acceptance
    #       only changes the residual when it zeroes a previously
    #       NONZERO coefficient (pure turn-on flips leave beta at 0
    #       until the FFBS refresh). So every acceptance up to and
    #       including the first residual-changing one is the exact
    #       sequential kernel; later columns keep their current path
    #       (an identity move — lazy but invariant). `column_pass
    #       _repeats` fresh passes recover the multiple-shrink-moves-
    #       per-sweep behaviour at 2 batched scans each.
    #   "auto"       — parallel when p > 16.
    column_move_style: str = "auto"
    column_pass_repeats: int = 2

    def __post_init__(self):
        x, y = self.x, self.y
        if x.ndim == 2:
            x = x[:, None, :]
            y = y[:, None]
            object.__setattr__(self, "x", x)
            object.__setattr__(self, "y", y)
        if self.obs_mask is None:
            object.__setattr__(
                self, "obs_mask", jnp.ones(self.y.shape, bool))
        sd = float(jnp.std(self.y))
        if self.residual_prior is None:
            object.__setattr__(
                self, "residual_prior",
                SdPrior(sigma_guess=0.5 * sd, sample_size=1.0))
        if self.innovation_prior is None:
            # tau is measured in residual-sd units (innovation variance
            # = tau^2 sigma^2), so the default guess is dimensionless
            object.__setattr__(
                self, "innovation_prior",
                SdPrior(sigma_guess=0.1, sample_size=1.0,
                        upper_limit=10.0))

    @property
    def t_len(self):
        return self.x.shape[0]

    @property
    def xdim(self):
        return self.x.shape[-1]

    # -- per-time sufficient statistics (RegressionDataTimePoint) --------
    def sufstats(self):
        m = self.obs_mask.astype(self.x.dtype)  # [T, n]
        xm = self.x * m[..., None]
        xtx = jnp.einsum("tnp,tnq->tpq", xm, self.x)
        xty = jnp.einsum("tnp,tn->tp", xm, self.y)
        yty = jnp.sum(m * self.y * self.y, axis=1)
        n_t = jnp.sum(m, axis=1)
        return xtx, xty, yty, n_t

    # -- state ------------------------------------------------------------
    def init_state(self, key):
        t_len, p = self.t_len, self.xdim
        k1, k2 = jax.random.split(key)
        pi = self.inclusion_prior.prior_inclusion_prob
        # start sparse with WHOLE columns on at the stationary prob
        # (per-time random inclusion seeds short spurious runs that the
        # sticky Markov chain must erode one end at a time)
        gamma = jnp.broadcast_to(
            jax.random.uniform(k1, (1, p)) < pi, (t_len, p))
        (a01, b01), (a10, b10) = self.inclusion_prior.beta_params()
        return {
            "gamma": gamma,
            "beta": jnp.zeros((t_len, p), self.y.dtype),
            "sigsq": jnp.var(self.y) * jax.random.uniform(
                k2, (), minval=0.3, maxval=0.9),
            "tau_sq": jnp.full((p,), 0.01),
            "q01": jnp.full((p,), a01 / (a01 + b01)),
            "q10": jnp.full((p,), a10 / (a10 + b10)),
        }

    # -- Gibbs sweep --------------------------------------------------------
    def kernel(self):
        xtx, xty, yty, n_t = self.sufstats()
        t_len, p = self.t_len, self.xdim
        (a01, b01), (a10, b10) = self.inclusion_prior.beta_params()

        def log_incl_prior(g_prev, g_now, g_next, q01_j, q10_j, t_idx):
            """Markov neighbor terms (log_inclusion_prior,
            DynamicRegressionDirectGibbs.cpp:193-210)."""
            def lp(frm, to):
                p_on = jnp.where(frm, 1.0 - q10_j, q01_j)
                return jnp.log(jnp.where(to, p_on, 1.0 - p_on))

            prev_term = jnp.where(t_idx > 0, lp(g_prev, g_now), 0.0)
            next_term = jnp.where(t_idx < t_len - 1, lp(g_now, g_next),
                                  0.0)
            return prev_term + next_term

        def flip_time_point(key, g_t, beta_t, g_prev, beta_prev, g_next,
                            beta_next, xtx_t, xty_t, sigsq, tau_sq,
                            q01, q10, t_idx):
            """Joint (gamma[t, j], beta[t, j]) Gibbs draws scanned over
            predictors at one time point. Maintains xr = X_t'(y_t - X_t
            beta_t) under rank-one beta updates (O(p) per flip)."""
            xr = xty_t - xtx_t @ beta_t

            def body(carry, inp):
                g_t, beta_t, xr = carry
                j, kj = inp
                kg, kb = jax.random.split(kj)
                # sufstats for coordinate j with its contribution removed
                a = xr[j] + xtx_t[j, j] * beta_t[j]
                s = xtx_t[j, j]
                prev_on = jnp.where(t_idx > 0, g_prev[j], False)
                m0 = jnp.where(prev_on, beta_prev[j], 0.0)
                nxt_on = jnp.where(t_idx < t_len - 1, g_next[j], False)
                log_det, quad, b, q = _local_evidence(
                    a, s, m0, tau_sq[j], nxt_on, beta_next[j],
                    tau_sq[j])
                lp_on = (log_det + quad / sigsq
                         + log_incl_prior(g_prev[j], True, g_next[j],
                                          q01[j], q10[j], t_idx))
                lp_off = log_incl_prior(g_prev[j], False, g_next[j],
                                        q01[j], q10[j], t_idx)
                new_g = jax.random.uniform(kg, ()) < jax.nn.sigmoid(
                    lp_on - lp_off)
                new_beta = jnp.where(
                    new_g,
                    b / q + jax.random.normal(kb, (), beta_t.dtype)
                    * jnp.sqrt(sigsq / q),
                    0.0)
                xr = xr - xtx_t[:, j] * (new_beta - beta_t[j])
                return (g_t.at[j].set(new_g),
                        beta_t.at[j].set(new_beta), xr), None

            keys = jax.random.split(key, p)
            (g_t, beta_t, _), _ = jax.lax.scan(
                body, (g_t, beta_t, xr), (jnp.arange(p), keys))
            return g_t, beta_t

        def single_site_pass(key, gamma, beta, tau_sq, sigsq, q01, q10):
            """Red-black over t: even time points update given odd
            neighbors, then odd given even."""
            pad_g = jnp.zeros((1, p), bool)
            pad_b = jnp.zeros((1, p), beta.dtype)
            for parity, kp in zip((0, 1), jax.random.split(key)):
                g_prev = jnp.concatenate([pad_g, gamma[:-1]], axis=0)
                g_next = jnp.concatenate([gamma[1:], pad_g], axis=0)
                b_prev = jnp.concatenate([pad_b, beta[:-1]], axis=0)
                b_next = jnp.concatenate([beta[1:], pad_b], axis=0)
                idx = jnp.arange(parity, t_len, 2)
                keys = jax.random.split(kp, idx.shape[0])
                new_g, new_b = jax.vmap(
                    flip_time_point,
                    in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, None, None,
                             None, None, 0))(
                    keys, gamma[idx], beta[idx], g_prev[idx],
                    b_prev[idx], g_next[idx], b_next[idx], xtx[idx],
                    xty[idx], sigsq, tau_sq, q01, q10, idx)
                gamma = gamma.at[idx].set(new_g)
                beta = beta.at[idx].set(new_b)
            return gamma, beta

        def column_loglik(path, a_col, s_col, tau_sq_j, sigsq):
            """Exact relative log marginal likelihood of one
            coefficient's inclusion path with its beta integrated out by
            a scalar Kalman filter (relative to the all-off path; the
            residual-only terms cancel)."""

            def step(carry, inp):
                m, pvar = carry
                g_t, a_t, s_t = inp
                # predict: continue the walk or restart fresh
                m_pred = jnp.where(g_t, m, 0.0)
                p_pred = jnp.where(g_t, pvar, 0.0) + tau_sq_j
                q = 1.0 / p_pred + s_t
                b = m_pred / p_pred + a_t
                ll = jnp.where(
                    g_t,
                    -0.5 * jnp.log(p_pred * q)
                    - 0.5 * (m_pred * m_pred / p_pred - b * b / q)
                    / sigsq,
                    0.0)
                # posterior when included; dormant (0, 0) when excluded
                m_new = jnp.where(g_t, b / q, 0.0)
                p_new = jnp.where(g_t, 1.0 / q, 0.0)
                return (m_new, p_new), ll

            (_, _), lls = jax.lax.scan(
                step, (jnp.zeros((), a_col.dtype),
                       jnp.zeros((), a_col.dtype)),
                (path, a_col, s_col))
            return jnp.sum(lls)

        def propose_column(kk, q01_j, q10_j):
            """One whole inclusion path from its Markov-chain prior."""
            k0, kr = jax.random.split(kk)
            pi = q01_j / (q01_j + q10_j)
            g0 = jax.random.uniform(k0, ()) < pi

            def step(g, k2):
                p_on = jnp.where(g, 1.0 - q10_j, q01_j)
                g_new = jax.random.uniform(k2, ()) < p_on
                return g_new, g_new

            _, rest = jax.lax.scan(step, g0,
                                   jax.random.split(kr, t_len - 1))
            return jnp.concatenate([g0[None], rest])

        def column_mh(key, gamma, beta, tau_sq, sigsq, q01, q10):
            """Independence-MH on each coefficient's whole inclusion
            path, proposing from its Markov-chain prior and accepting
            against the EXACT collapsed marginal (beta_j integrated over
            the full series). The prior cancels in the ratio. After an
            accepted flip the coefficient path is stale; FFBS redraws
            all coefficients immediately after."""

            def body(carry, inp):
                gamma, beta = carry
                j, kj = inp
                kp, ka, kb = jax.random.split(kj, 3)
                # residual sufstats with coordinate j removed entirely
                beta_no_j = beta.at[:, j].set(0.0)
                a_col = (xty[:, j]
                         - jnp.einsum("tq,tq->t", xtx[:, j, :],
                                      beta_no_j))
                s_col = xtx[:, j, j]
                col_prop = propose_column(kp, q01[j], q10[j])
                ll_prop = column_loglik(col_prop, a_col, s_col,
                                        tau_sq[j], sigsq)
                ll_cur = column_loglik(gamma[:, j], a_col, s_col,
                                       tau_sq[j], sigsq)
                accept = (jnp.log(jax.random.uniform(ka, ()))
                          < ll_prop - ll_cur)
                new_col = jnp.where(accept, col_prop, gamma[:, j])
                gamma = gamma.at[:, j].set(new_col)
                # keep beta consistent with the (possibly) new path:
                # zero where excluded; FFBS refreshes values right after
                beta = beta.at[:, j].set(
                    jnp.where(new_col, beta[:, j], 0.0))
                return (gamma, beta), accept

            keys = jax.random.split(key, p)
            (gamma, beta), _ = jax.lax.scan(
                body, (gamma, beta), (jnp.arange(p), keys))
            return gamma, beta

        def column_mh_parallel(key, gamma, beta, tau_sq, sigsq, q01,
                               q10):
            """Batched column moves for the wide-p regime (see
            column_move_style): 2 batched T-scans score all p proposals
            at once; acceptance in random order with the staleness-exact
            rule (only the first residual-CHANGING acceptance per pass
            lands; pure turn-on acceptances never invalidate anyone)."""
            s_all = jnp.diagonal(xtx, axis1=-2, axis2=-1)  # [T, p]

            def one_pass(carry, kk):
                gamma, beta = carry
                kp_, ka_, kperm = jax.random.split(kk, 3)
                props = jax.vmap(propose_column)(
                    jax.random.split(kp_, p), q01, q10)  # [p, T]
                # residual sufstats vs the PASS-START beta, all columns
                a_all = (xty - jnp.einsum("tjq,tq->tj", xtx, beta)
                         + s_all * beta)  # [T, p]
                paths = jnp.concatenate(
                    [props, gamma.T], axis=0)  # [2p, T]
                lls = jax.vmap(
                    lambda path, a, s, tq: column_loglik(
                        path, a, s, tq, sigsq),
                    in_axes=(0, 1, 1, 0))(
                    paths, jnp.tile(a_all, (1, 2)),
                    jnp.tile(s_all, (1, 2)), jnp.tile(tau_sq, 2))
                ll_prop, ll_cur = lls[:p], lls[p:]
                logu = jnp.log(jax.random.uniform(
                    ka_, (p,), beta.dtype,
                    minval=jnp.finfo(beta.dtype).tiny))
                accept = logu < ll_prop - ll_cur
                # shrink flag: acceptance would zero a nonzero beta
                shrinks = accept & jnp.any(
                    (~props.T) & (beta != 0.0), axis=0)
                order = jax.random.permutation(kperm, p)
                rank = jnp.argsort(order)  # rank[j] = position of j
                shrink_rank = jnp.where(shrinks, rank, p)
                first_shrink = jnp.min(shrink_rank)
                final = accept & (rank <= first_shrink)
                new_gamma = jnp.where(final[None, :], props.T, gamma)
                new_beta = jnp.where(new_gamma, beta, 0.0)
                return (new_gamma, new_beta), None

            (gamma, beta), _ = jax.lax.scan(
                one_pass, (gamma, beta),
                jax.random.split(key, self.column_pass_repeats))
            return gamma, beta

        def ffbs(key, gamma, tau_sq, sigsq):
            """Coefficients | inclusion: masked forward filter +
            backward sampler (DynamicRegressionKalmanFilter
            impute_state, DynamicRegression.hpp:269)."""
            gf = gamma.astype(xty.dtype)  # [T, p]
            eye = jnp.eye(p, dtype=xty.dtype)
            q_diag = gf * tau_sq[None, :]  # unscaled innovation var

            def fstep(carry, inp):
                a, pmat = carry
                g_t, gprev_t, xtx_t, xty_t, q_t = inp
                d = g_t * gprev_t  # continuing coords
                a_pred = d * a
                p_pred = (d[:, None] * pmat * d[None, :]
                          + jnp.diag(q_t))
                # posterior precision = P_pred^-1 + XtX (all UNSCALED:
                # prior and noise share the common sigsq factor, which
                # re-enters only in the sampling covariance)
                p_pred_m = masked.masked_spd(p_pred, g_t)
                prec = jnp.linalg.inv(p_pred_m)
                post_prec = (prec * masked.mask_outer(g_t)
                             + xtx_t * masked.mask_outer(g_t)
                             + eye * (1.0 - g_t[:, None]))
                chol = jnp.linalg.cholesky(post_prec)
                rhs = (xty_t * g_t
                       + (prec * masked.mask_outer(g_t)) @ (a_pred * g_t))
                mean = jax.scipy.linalg.cho_solve((chol, True), rhs)
                mean = mean * g_t
                cov = jax.scipy.linalg.cho_solve((chol, True), eye)
                cov = cov * masked.mask_outer(g_t)
                return (mean, cov), (mean, cov)

            gprev = jnp.concatenate(
                [jnp.zeros((1, p), gf.dtype), gf[:-1]], axis=0)
            init_a = jnp.zeros((p,), xty.dtype)
            init_p = jnp.zeros((p, p), xty.dtype)
            (_, _), (means, covs) = jax.lax.scan(
                fstep, (init_a, init_p), (gf, gprev, xtx, xty, q_diag))

            k_last, k_rest = jax.random.split(key)

            def draw_masked(kk, mean, cov, g_t):
                covm = masked.masked_spd(cov, g_t) * sigsq + 1e-12 * eye
                chol = jnp.linalg.cholesky(covm)
                z = jax.random.normal(kk, (p,), mean.dtype)
                return (mean + chol @ z) * g_t

            beta_last = draw_masked(k_last, means[-1], covs[-1], gf[-1])

            def bstep(beta_next, inp):
                kk, mean, cov, g_t, g_next, q_next = inp
                d = g_next * g_t
                c = d[:, None] * cov * d[None, :] + jnp.diag(q_next)
                c_m = masked.masked_spd(c, g_next)
                chol_c = jnp.linalg.cholesky(c_m)
                pd = cov * d[None, :]
                a_gain = jax.scipy.linalg.cho_solve(
                    (chol_c, True), pd.T).T * g_next[None, :]
                resid = (beta_next - d * mean) * g_next
                cond_mean = mean + a_gain @ resid
                cond_cov = cov - a_gain @ c_m @ a_gain.T
                cond_cov = 0.5 * (cond_cov + cond_cov.T)
                beta_t = draw_masked(kk, cond_mean * g_t, cond_cov, g_t)
                return beta_t, beta_t

            keys = jax.random.split(k_rest, t_len - 1)
            _, betas_rev = jax.lax.scan(
                bstep, beta_last,
                (keys, means[:-1], covs[:-1], gf[:-1], gf[1:],
                 q_diag[1:]),
                reverse=True)
            return jnp.concatenate([betas_rev, beta_last[None]], axis=0)

        def sweep(key, state):
            k_g, k_c, k_b, k_s, k_tau, k_q = jax.random.split(key, 6)
            out = dict(state)

            # 1. inclusion indicators: joint (gamma, beta) single-site
            #    red-black pass + exact collapsed column moves
            gamma, beta = single_site_pass(
                k_g, state["gamma"], state["beta"], state["tau_sq"],
                state["sigsq"], state["q01"], state["q10"])
            if self.column_moves:
                style = self.column_move_style
                if style == "auto":
                    style = "parallel" if p > 16 else "sequential"
                col_fn = (column_mh_parallel if style == "parallel"
                          else column_mh)
                gamma, beta = col_fn(
                    k_c, gamma, beta, state["tau_sq"], state["sigsq"],
                    state["q01"], state["q10"])
            out["gamma"] = gamma

            # 2. coefficients | inclusion (FFBS)
            out["beta"] = ffbs(k_b, gamma, out["tau_sq"], out["sigsq"])

            # 3. residual variance (draw_residual_variance,
            #    DynamicRegressionDirectGibbs.cpp:224-233)
            fitted = jnp.einsum("tnp,tp->tn", self.x, out["beta"])
            resid = jnp.where(self.obs_mask, self.y - fitted, 0.0)
            sse = jnp.sum(resid * resid)
            out["sigsq"] = self.residual_prior.draw_variance(
                k_s, jnp.sum(n_t), sse)

            # 4. innovation variances from included dbeta / sigma
            #    (draw_unscaled_state_innovation_variance, :235-254;
            #    includes fresh restarts, whose prior is also tau^2)
            sigma = jnp.sqrt(out["sigsq"])
            dbeta = (out["beta"][1:] - out["beta"][:-1]) / sigma
            inc = out["gamma"][1:].astype(dbeta.dtype)
            ssq = jnp.sum(inc * dbeta * dbeta, axis=0)
            cnt = jnp.sum(inc, axis=0)
            out["tau_sq"] = jax.vmap(
                lambda kk, nn, ss: self.innovation_prior.draw_variance(
                    kk, nn, ss))(jax.random.split(k_tau, p), cnt, ssq)

            # 5. transition probabilities (conjugate beta counts,
            #    clipped away from absorbing 0/1 exactly as the
            #    reference clips its prior construction, :290-291)
            g = out["gamma"].astype(jnp.float32)
            on_prev, on_now = g[:-1], g[1:]
            n01 = jnp.sum((1 - on_prev) * on_now, axis=0)
            n00 = jnp.sum((1 - on_prev) * (1 - on_now), axis=0)
            n10 = jnp.sum(on_prev * (1 - on_now), axis=0)
            n11 = jnp.sum(on_prev * on_now, axis=0)
            kq1, kq2 = jax.random.split(k_q)
            out["q01"] = jnp.clip(
                dists.beta.sample(kq1, a01 + n01, b01 + n00),
                1e-4, 0.9999)
            out["q10"] = jnp.clip(
                dists.beta.sample(kq2, a10 + n10, b10 + n11),
                1e-4, 0.9999)
            return out

        return sweep

    def predict(self, key, state, x_future):
        """Simulate y over a forecast horizon given one posterior draw.
        x_future: [h, p]. Coefficients continue their inclusion chains
        and random walks."""
        h = x_future.shape[0]
        p = self.xdim
        k_g, k_b, k_e = jax.random.split(key, 3)
        sigma = jnp.sqrt(state["sigsq"])
        tau = jnp.sqrt(state["tau_sq"]) * sigma

        def step(carry, inp):
            g, beta = carry
            kg, kb = inp
            p_on = jnp.where(g, 1.0 - state["q10"], state["q01"])
            g_new = jax.random.uniform(kg, (p,)) < p_on
            fresh = g_new & ~g
            noise = tau * jax.random.normal(kb, (p,))
            beta_new = jnp.where(
                g_new, jnp.where(fresh, noise, beta + noise), 0.0)
            return (g_new, beta_new), beta_new

        keys = (jax.random.split(k_g, h), jax.random.split(k_b, h))
        (_, _), betas = jax.lax.scan(
            step, (state["gamma"][-1], state["beta"][-1]), keys)
        eps = sigma * jax.random.normal(k_e, (h,))
        return jnp.einsum("hp,hp->h", x_future, betas) + eps
