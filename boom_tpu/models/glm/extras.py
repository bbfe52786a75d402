"""GLM stragglers: multivariate-t regression, independent GLM stacks,
grouped-shrinkage regression, and aggregated (group-total) regression.

Reference correspondences:
  * MvtRegression    — Models/Glm/MvtRegModel.hpp:29 +
    PosteriorSamplers/MvtRegSampler.hpp:34 (latent-weight data
    augmentation: w_i ~ Gamma(nu/2, nu/2) turns the t likelihood into a
    weighted Gaussian MNIW update; nu drawn by slice sampling).
  * IndependentRegressions — Models/Glm/IndependentRegressionModels.hpp:33
    (a "multivariate GLM" of ydim unconstrained regressions sharing one
    predictor matrix).
  * RegressionShrinkage — Models/Glm/PosteriorSamplers/
    RegressionShrinkageSampler.hpp:44 (coefficients partitioned into
    exchangeable groups, each IID N(b_k, v_k) with conjugate hyperdraws).
  * AggregatedRegression — Models/Glm/AggregatedRegressionModel.hpp:162
    (unit-level transformed-Gaussian regression observed only through
    group totals; Gibbs redistributes each group's total across its
    units, Agreg::Group::distribute_total at AggregatedRegressionModel.hpp:119).

TPU form: every per-datum / per-group / per-outcome loop in the
reference becomes one batched draw — the latent t-weights are a single
vectorized gamma draw, the independent regressions one vmapped
conjugate draw, the shrinkage hyperdraws segment-sum reductions, and
the total-redistribution step pairs ALL units across ALL groups at once
(disjoint random pairs, batched bounded slice sampling) instead of the
reference's per-group sequential sweep.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from boom_tpu import dists
from boom_tpu.inference.kernels.slice import slice_step
from boom_tpu.models.glm.mvreg import MvRegSuf


# =========================================================================
# Multivariate-t regression
# =========================================================================

@dataclasses.dataclass(frozen=True)
class MvtRegression:
    """Y rows ~ mvt(B'x, Sigma, nu). State: B [p,m], siginv [m,m], nu, w [n].

    Gibbs per MvtRegSampler.cpp: impute w -> weighted MNIW draw of
    (Sigma, B) -> slice draw of nu (on log nu, matching the reference's
    SliceSampler over a positive scalar)."""

    x: jax.Array  # [n, p]
    y: jax.Array  # [n, m]
    prior_mean: jax.Array  # [p, m]
    prior_precision: jax.Array  # [p, p]
    prior_df: float
    prior_ss: jax.Array  # [m, m]
    nu_prior_a: float = 2.0  # lognormal-ish gamma prior on nu
    nu_prior_b: float = 0.1

    @staticmethod
    def from_data(x, y, prior_nobs=1.0, prior_df=None, **kw):
        n, p = x.shape
        m = y.shape[1]
        df = prior_df or (m + 2.0)
        return MvtRegression(
            x=x, y=y,
            prior_mean=jnp.zeros((p, m), x.dtype),
            prior_precision=prior_nobs * (x.T @ x) / n,
            prior_df=df, prior_ss=jnp.eye(m, dtype=x.dtype) * df, **kw)

    def init_state(self, key):
        p, m = self.prior_mean.shape
        return {"B": jnp.zeros((p, m), self.x.dtype),
                "siginv": jnp.eye(m, dtype=self.x.dtype),
                "nu": jnp.asarray(10.0, self.x.dtype),
                "w": jnp.ones((self.x.shape[0],), self.x.dtype)}

    def kernel(self):
        n, m = self.y.shape

        def sweep(key, state):
            kw_, ks, kb, kn = jax.random.split(key, 4)
            nu = state["nu"]
            # 1. latent weights (MvtRegSampler::impute_w)
            resid = self.y - self.x @ state["B"]
            d = jnp.einsum("ni,ij,nj->n", resid, state["siginv"], resid)
            w = dists.gamma.sample(kw_, 0.5 * (nu + m), 0.5 * (nu + d))
            # 2. weighted MNIW conditional (draw_Sigma / draw_Beta)
            xw = self.x * w[:, None]
            suf = MvRegSuf(xtx=self.x.T @ xw, xty=xw.T @ self.y,
                           yty=(self.y * w[:, None]).T @ self.y,
                           n=jnp.asarray(float(n), self.x.dtype))
            prec = self.prior_precision + suf.xtx
            rhs = self.prior_precision @ self.prior_mean + suf.xty
            b_tilde = jnp.linalg.solve(prec, rhs)
            ss = (self.prior_ss + suf.yty
                  + self.prior_mean.T @ self.prior_precision
                  @ self.prior_mean - b_tilde.T @ prec @ b_tilde)
            ss = 0.5 * (ss + ss.T)
            siginv = dists.wishart.sample(
                ks, self.prior_df + suf.n, jnp.linalg.inv(ss))
            sigma = jnp.linalg.inv(siginv)
            sigma = 0.5 * (sigma + sigma.T)
            row_cov = jnp.linalg.inv(prec)
            b = dists.matrix_normal.sample(
                kb, b_tilde, 0.5 * (row_cov + row_cov.T), sigma)
            # 3. nu | w by slice on log nu (draw_nu)
            sum_log_w = jnp.sum(jnp.log(w))
            sum_w = jnp.sum(w)

            def log_post(log_nu):
                v = jnp.exp(log_nu)
                h = 0.5 * v
                ll = (n * (h * jnp.log(h) - jax.scipy.special.gammaln(h))
                      + (h - 1.0) * sum_log_w - h * sum_w)
                lp = dists.gamma.logpdf(v, self.nu_prior_a,
                                        self.nu_prior_b)
                return ll + lp + log_nu  # + jacobian of exp

            log_nu = slice_step(kn, jnp.log(nu), log_post, width=0.5)
            return {"B": b, "siginv": siginv, "nu": jnp.exp(log_nu),
                    "w": w}

        return sweep

    @staticmethod
    def simulate(key, n, p, m, nu=5.0, noise_scale=0.5):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        x = jax.random.normal(k1, (n, p))
        b = jax.random.normal(k2, (p, m))
        w = dists.gamma.sample(k3, nu / 2.0, nu / 2.0, shape=(n,))
        e = noise_scale * jax.random.normal(k4, (n, m)) / jnp.sqrt(
            w)[:, None]
        return x, x @ b + e, b


# =========================================================================
# Independent GLM stack
# =========================================================================

@dataclasses.dataclass(frozen=True)
class IndependentRegressions:
    """ydim independent Gaussian regressions on a shared design
    (IndependentRegressionModels.hpp:33). Exact conjugate posterior —
    each kernel call is an IID draw from NIG(beta_j, sigsq_j | data),
    vmapped over the outcome axis. State: beta [m, p], sigsq [m]."""

    x: jax.Array  # [n, p]
    y: jax.Array  # [n, m]
    prior_nobs: float = 1.0
    sigma_df: float = 1.0
    sigma_guess: float = 1.0

    def init_state(self, key):
        n, p = self.x.shape
        m = self.y.shape[1]
        return {"beta": jnp.zeros((m, p), self.x.dtype),
                "sigsq": jnp.var(self.y, axis=0)}

    def kernel(self):
        n, p = self.x.shape
        xtx = self.x.T @ self.x
        prior_prec = self.prior_nobs * xtx / n

        def one_outcome(key, y_j):
            ks, kb = jax.random.split(key)
            xty = self.x.T @ y_j
            prec = prior_prec + xtx
            b_tilde = jnp.linalg.solve(prec, xty)
            ss = (self.sigma_df * self.sigma_guess**2
                  + y_j @ y_j - b_tilde @ prec @ b_tilde)
            df = self.sigma_df + n
            sigsq = dists.inverse_gamma.sample(
                ks, 0.5 * df, 0.5 * jnp.maximum(ss, 1e-12))
            beta = dists.mvn.sample_prec(kb, b_tilde, prec / sigsq)
            return beta, sigsq

        def sweep(key, state):
            m = self.y.shape[1]
            keys = jax.random.split(key, m)
            beta, sigsq = jax.vmap(one_outcome)(keys, self.y.T)
            return {"beta": beta, "sigsq": sigsq}

        return sweep


# =========================================================================
# Grouped-shrinkage regression
# =========================================================================

@dataclasses.dataclass(frozen=True)
class RegressionShrinkage:
    """y ~ N(X beta, sigsq); beta_j (j in group k) IID ~ N(b_k, v_k)
    with conjugate hyperdraws per group (RegressionShrinkageSampler.hpp:44).
    State: beta [p], b [K], v [K], sigsq."""

    x: jax.Array  # [n, p]
    y: jax.Array  # [n]
    coef_groups: jax.Array  # [p] ints in [0, K)
    num_groups: int
    sigma_df: float = 1.0
    sigma_guess: float = 1.0
    # hyperpriors: b_k ~ N(b0, v_k / mean_nobs); v_k ~ IG(v_df/2, v_df*v_guess^2/2)
    mean_guess: float = 0.0
    mean_nobs: float = 0.01
    v_df: float = 1.0
    v_guess: float = 1.0

    def init_state(self, key):
        p = self.x.shape[1]
        k = self.num_groups
        return {"beta": jnp.zeros((p,), self.x.dtype),
                "b": jnp.zeros((k,), self.x.dtype),
                "v": jnp.ones((k,), self.x.dtype),
                "sigsq": jnp.var(self.y)}

    def kernel(self):
        n, p = self.x.shape
        k = self.num_groups
        xtx = self.x.T @ self.x
        xty = self.x.T @ self.y
        yty = self.y @ self.y
        gidx = self.coef_groups
        group_sizes = jax.ops.segment_sum(jnp.ones((p,), self.x.dtype),
                                          gidx, k)

        def sweep(key, state):
            kb, kh, kv, ks = jax.random.split(key, 4)
            # 1. beta | b, v, sigsq (draw_coefficients)
            prior_prec_diag = 1.0 / state["v"][gidx]
            prec = xtx / state["sigsq"] + jnp.diag(prior_prec_diag)
            rhs = xty / state["sigsq"] + state["b"][gidx] * prior_prec_diag
            chol = jnp.linalg.cholesky(prec)
            mean = jax.scipy.linalg.cho_solve((chol, True), rhs)
            beta = dists.mvn.sample_prec(kb, mean, prec_chol=chol)
            # 2. per-group conjugate (b_k, v_k) | beta (draw_hyperparameters)
            s = jax.ops.segment_sum(beta, gidx, k)
            ssq = jax.ops.segment_sum(beta * beta, gidx, k)
            post_nobs = self.mean_nobs + group_sizes
            b_mean = (self.mean_nobs * self.mean_guess + s) / post_nobs
            # v_k | beta, b integrated? conjugate NIG: draw v then b
            sse = (ssq - s * s / jnp.maximum(group_sizes, 1e-12)
                   + self.mean_nobs * group_sizes / post_nobs
                   * (s / jnp.maximum(group_sizes, 1e-12)
                      - self.mean_guess) ** 2)
            sse = jnp.where(group_sizes > 0, sse, 0.0)
            df_v = self.v_df + group_sizes
            ss_v = self.v_df * self.v_guess**2 + sse
            v = dists.inverse_gamma.sample(kv, 0.5 * df_v, 0.5 * ss_v)
            b = b_mean + jnp.sqrt(v / post_nobs) * jax.random.normal(
                kh, (k,), beta.dtype)
            # 3. sigsq | beta (draw_residual_variance)
            resid_ss = yty - 2.0 * beta @ xty + beta @ xtx @ beta
            sigsq = dists.inverse_gamma.sample(
                ks, 0.5 * (self.sigma_df + n),
                0.5 * (self.sigma_df * self.sigma_guess**2
                       + jnp.maximum(resid_ss, 1e-12)))
            return {"beta": beta, "b": b, "v": v, "sigsq": sigsq}

        return sweep


# =========================================================================
# Aggregated regression (group totals only)
# =========================================================================

_TRANSFORMS = {
    # f(y), f^-1(z), log|dz/dy|(y), lower bound on y
    "log": (jnp.log, jnp.exp, lambda y: -jnp.log(y), 0.0),
    "sqrt": (jnp.sqrt, lambda z: z * z,
             lambda y: -jnp.log(2.0) - 0.5 * jnp.log(y), 0.0),
    "identity": (lambda y: y, lambda z: z, lambda y: 0.0 * y, -jnp.inf),
}


@dataclasses.dataclass(frozen=True)
class AggregatedRegression:
    """f(y_unit) ~ N(x_unit' beta, sigsq) with only the group totals
    sum_u y_u observed (AggregatedRegressionModel.hpp:162).

    Gibbs alternates (a) redistributing each group's total among its
    units and (b) a conjugate regression draw on the transformed unit
    values. The redistribution pairs units at random within each group
    and slice-samples the split of each pair's combined value — the
    reference's Group::distribute_total strategy
    (AggregatedRegressionModel.hpp:119) — but all pairs across all
    groups update in ONE batched bounded slice step (disjoint pairs
    commute), instead of a per-group serial sweep.

    Layout: units padded to [G, U] with a validity mask. State:
    y [G, U] unit values, beta [p], sigsq."""

    x: jax.Array  # [G, U, p] padded unit predictors
    unit_mask: jax.Array  # [G, U] bool
    totals: jax.Array  # [G]
    transformation: str = "log"
    prior_nobs: float = 1.0
    sigma_df: float = 1.0
    sigma_guess: float = 1.0
    pair_rounds: int = 4

    @staticmethod
    def from_units(x_units, group, totals, transformation="log", **kw):
        """x_units: [n_units, p]; group: [n_units] int; totals: [G]."""
        import numpy as np

        x_units = np.asarray(x_units)
        group = np.asarray(group)
        totals = np.asarray(totals, float)
        g = len(totals)
        counts = np.bincount(group, minlength=g)
        u = int(counts.max())
        p = x_units.shape[1]
        xp = np.zeros((g, u, p))
        mask = np.zeros((g, u), bool)
        slot = np.zeros(g, int)
        for i, gi in enumerate(group):
            xp[gi, slot[gi]] = x_units[i]
            mask[gi, slot[gi]] = True
            slot[gi] += 1
        return AggregatedRegression(
            x=jnp.asarray(xp), unit_mask=jnp.asarray(mask),
            totals=jnp.asarray(totals), transformation=transformation,
            **kw)

    def init_state(self, key):
        counts = jnp.sum(self.unit_mask, axis=1)
        y = jnp.where(self.unit_mask,
                      (self.totals / jnp.maximum(counts, 1.0))[:, None],
                      0.0)
        return {"y": y, "beta": jnp.zeros((self.x.shape[-1],),
                                          self.totals.dtype),
                "sigsq": jnp.ones((), self.totals.dtype)}

    def kernel(self):
        f, finv, log_jac, lo = _TRANSFORMS[self.transformation]
        g, u, p = self.x.shape
        n_units = jnp.sum(self.unit_mask)
        half = u // 2

        def redistribute(key, y, beta, sigsq):
            """One round: random within-group disjoint pairs, batched
            bounded slice draw of each pair's split."""
            kp, ks = jax.random.split(key)
            sd = jnp.sqrt(sigsq)
            mu = self.x @ beta  # [G, U]
            # valid units first in random order
            noise = jax.random.uniform(kp, (g, u))
            order = jnp.argsort(
                jnp.where(self.unit_mask, noise, 2.0), axis=1)
            take = lambda a: jnp.take_along_axis(a, order, axis=1)  # noqa: E731
            y_s, mu_s, m_s = take(y), take(mu), take(self.unit_mask)
            i1 = jnp.arange(half) * 2
            i2 = i1 + 1
            ok = m_s[:, i1] & m_s[:, i2]  # both members valid
            s_pair = y_s[:, i1] + y_s[:, i2]
            mu1, mu2 = mu_s[:, i1], mu_s[:, i2]

            def pair_logpost(y1):
                y2 = s_pair - y1
                inside = (y1 > lo) & (y2 > lo)
                y1c = jnp.where(inside, y1, jnp.maximum(s_pair * 0.5,
                                                        lo + 1e-12))
                y2c = s_pair - y1c
                lp = (dists.normal.logpdf(f(y1c), mu1, sd)
                      + log_jac(y1c)
                      + dists.normal.logpdf(f(y2c), mu2, sd)
                      + log_jac(y2c))
                return jnp.where(inside, lp, -jnp.inf)

            lower = jnp.where(jnp.isfinite(jnp.asarray(lo)),
                              jnp.full_like(s_pair, lo),
                              s_pair - 1e30)
            upper = jnp.where(jnp.isfinite(jnp.asarray(lo)),
                              s_pair, s_pair + 1e30)
            # width ~ the conditional's scale: |s|/4 or a few residual
            # sds (the latter matters for identity, where s can be ~0)
            y1_new = slice_step(
                ks, y_s[:, i1], pair_logpost,
                width=jnp.maximum(jnp.abs(s_pair) * 0.25, 2.0 * sd),
                lower=lower, upper=upper)
            y1_new = jnp.where(ok, y1_new, y_s[:, i1])
            y2_new = jnp.where(ok, s_pair - y1_new, y_s[:, i2])
            y_s = y_s.at[:, i1].set(y1_new).at[:, i2].set(y2_new)
            # undo the permutation
            inv = jnp.argsort(order, axis=1)
            return jnp.take_along_axis(y_s, inv, axis=1)

        def sweep(key, state):
            kr, kb, ksig = jax.random.split(key, 3)
            y, beta, sigsq = state["y"], state["beta"], state["sigsq"]
            for r in range(self.pair_rounds):
                y = redistribute(jax.random.fold_in(kr, r), y, beta,
                                 sigsq)
            # conjugate regression on z = f(y) over valid units
            z = jnp.where(self.unit_mask, f(jnp.where(
                self.unit_mask, y, 1.0)), 0.0)
            xm = self.x * self.unit_mask[..., None]
            xtx = jnp.einsum("gui,guj->ij", xm, xm)
            xty = jnp.einsum("gui,gu->i", xm, z)
            prior_prec = self.prior_nobs * xtx / jnp.maximum(n_units,
                                                             1.0)
            prec = prior_prec + xtx
            b_tilde = jnp.linalg.solve(prec, xty)
            zz = jnp.sum(z * z)
            ss = (self.sigma_df * self.sigma_guess**2
                  + zz - b_tilde @ prec @ b_tilde)
            sigsq = dists.inverse_gamma.sample(
                ksig, 0.5 * (self.sigma_df + n_units),
                0.5 * jnp.maximum(ss, 1e-12))
            beta = dists.mvn.sample_prec(kb, b_tilde, prec / sigsq)
            return {"y": y, "beta": beta, "sigsq": sigsq}

        return sweep
