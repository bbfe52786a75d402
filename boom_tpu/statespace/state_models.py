"""State-model blocks: the bsts component library.

Reference: Models/StateSpace/StateModels/StateModel.hpp:125-191 — each
state model supplies Z_t, T_t, R_t, Q_t blocks and observes its imputed
state to update its own parameters — plus the concrete models
(LocalLevelStateModel, LocalLinearTrend, SeasonalStateModel,
TrigStateModel, ArStateModel, StaticInterceptStateModel and their
PosteriorSamplers). The R/python builders are bsts' add.local.level /
add.local.linear.trend / add.seasonal / add.trig / add.ar /
add.static.intercept (Interfaces/R/bsts/R/*.R, python bsts state model
classes).

TPU-native form: a block is a frozen dataclass exposing
    z()                  -> [dim] observation weights
    build(params)        -> (T [dim,dim], R [dim,err], Q [err,err])
    init_dist()          -> (a0 [dim], P0 [dim,dim])
    init_params(key)     -> dict of this block's parameters
    draw_params(key, params, path) -> dict (conjugate draws given the
                          imputed state path [T, dim] for this block)
Blocks compose block-diagonally (see bsts.py); everything is
shape-static so the whole Gibbs program jits.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from boom_tpu import dists


@dataclasses.dataclass(frozen=True)
class SdPrior:
    """Prior on a standard deviation: sigma^2 ~ ScaledInvChisq(sample_size,
    sigma_guess^2) truncated to sigma <= upper_limit (reference
    prior_specification SdPrior; R's SdPrior)."""

    sigma_guess: float
    sample_size: float = 0.01
    upper_limit: float = float("inf")

    def draw_variance(self, key, n, sum_sq):
        """Conjugate draw of sigma^2 given n innovations with sum of
        squares sum_sq (truncated upper limit via precision lower bound)."""
        from boom_tpu.dists.truncated import trun_gamma_lower_fast

        df = self.sample_size + n
        ss = self.sample_size * self.sigma_guess**2 + sum_sq
        if math.isinf(self.upper_limit):
            return dists.scaled_inv_chisq.sample(key, df, ss / df)
        # fast Wilson-Hilferty + Newton inverse-CDF (the generic
        # trun_gamma's bisection quantile dominated the bsts sweep)
        prec = trun_gamma_lower_fast(
            key, 0.5 * df, 0.5 * ss, lo=1.0 / self.upper_limit**2,
            newton_iters=8)
        return 1.0 / prec


def _innovations(path, t_mat):
    """eta rows: path[t+1] - T path[t], [T-1, dim]. Elementwise mul-sum
    instead of `@`: the [T, d] x [d, d] product under a chain vmap
    otherwise lowers to an MXU-padded dot_general (see kalman._mm)."""
    t_mat = jnp.asarray(t_mat)
    return path[1:] - jnp.sum(t_mat * path[:-1][..., None, :], axis=-1)


# ---------------------------------------------------------------------------
# Local level — reference LocalLevelStateModel.hpp; bsts add.local.level
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class LocalLevel:
    sigma_prior: SdPrior
    initial_mean: float = 0.0
    initial_sd: float = 1.0
    name: str = "local_level"
    dim: int = 1
    err_dim: int = 1

    @staticmethod
    def default(y, name="local_level"):
        sd = float(jnp.std(y))
        return LocalLevel(
            sigma_prior=SdPrior(sigma_guess=0.01 * sd, upper_limit=sd),
            initial_mean=float(y[0]), initial_sd=sd, name=name)

    def z(self):
        return jnp.ones((1,))

    def build(self, params):
        t_mat = jnp.ones((1, 1))
        r_mat = jnp.ones((1, 1))
        q_mat = params["sigma_level_sq"][None, None] * jnp.ones((1, 1))
        return t_mat, r_mat, q_mat

    def init_dist(self):
        return (jnp.asarray([self.initial_mean]),
                jnp.asarray([[self.initial_sd**2]]))

    def init_params(self, key):
        # overdispersed data-scaled start (a collapsed start with a long
        # zero state path is an absorbing trap for variance draws)
        u = jax.random.uniform(key, (), minval=0.05, maxval=0.5)
        return {"sigma_level_sq": (self.initial_sd * u) ** 2}

    def draw_params(self, key, params, path):
        eta = _innovations(path, jnp.ones((1, 1)))[:, 0]
        sigsq = self.sigma_prior.draw_variance(
            key, eta.shape[0], jnp.sum(eta * eta))
        return {"sigma_level_sq": sigsq}

    def asis_groups(self):
        return [("sigma_level_sq", self.sigma_prior, (0,))]


# ---------------------------------------------------------------------------
# Local linear trend — reference LocalLinearTrend.hpp;
# bsts add.local.linear.trend
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class LocalLinearTrend:
    level_prior: SdPrior
    slope_prior: SdPrior
    initial_level_mean: float = 0.0
    initial_level_sd: float = 1.0
    initial_slope_mean: float = 0.0
    initial_slope_sd: float = 1.0
    name: str = "trend"
    dim: int = 2
    err_dim: int = 2

    @staticmethod
    def default(y, name="trend"):
        sd = float(jnp.std(y))
        return LocalLinearTrend(
            level_prior=SdPrior(sigma_guess=0.01 * sd, upper_limit=sd),
            slope_prior=SdPrior(sigma_guess=0.01 * sd, upper_limit=sd),
            initial_level_mean=float(y[0]), initial_level_sd=sd,
            initial_slope_mean=0.0, initial_slope_sd=sd, name=name)

    def z(self):
        return jnp.asarray([1.0, 0.0])

    def _t(self):
        return jnp.asarray([[1.0, 1.0], [0.0, 1.0]])

    def build(self, params):
        q_mat = jnp.diag(jnp.stack([params["sigma_level_sq"],
                                    params["sigma_slope_sq"]]))
        return self._t(), jnp.eye(2), q_mat

    def init_dist(self):
        return (jnp.asarray([self.initial_level_mean,
                             self.initial_slope_mean]),
                jnp.diag(jnp.asarray([self.initial_level_sd**2,
                                      self.initial_slope_sd**2])))

    def init_params(self, key):
        k1, k2 = jax.random.split(key)
        u1 = jax.random.uniform(k1, (), minval=0.05, maxval=0.5)
        u2 = jax.random.uniform(k2, (), minval=0.01, maxval=0.2)
        return {"sigma_level_sq": (self.initial_level_sd * u1) ** 2,
                "sigma_slope_sq": (self.initial_slope_sd * u2) ** 2}

    def draw_params(self, key, params, path):
        k1, k2 = jax.random.split(key)
        eta = _innovations(path, self._t())
        lvl = self.level_prior.draw_variance(
            k1, eta.shape[0], jnp.sum(eta[:, 0] ** 2))
        slope = self.slope_prior.draw_variance(
            k2, eta.shape[0], jnp.sum(eta[:, 1] ** 2))
        return {"sigma_level_sq": lvl, "sigma_slope_sq": slope}

    def asis_groups(self):
        return [("sigma_level_sq", self.level_prior, (0,)),
                ("sigma_slope_sq", self.slope_prior, (1,))]


# ---------------------------------------------------------------------------
# Seasonal (dummy-variable) — reference SeasonalStateModel.hpp;
# bsts add.seasonal
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class Seasonal:
    nseasons: int
    sigma_prior: SdPrior
    initial_sd: float = 1.0
    name: str = "seasonal"

    @property
    def dim(self):
        return self.nseasons - 1

    err_dim: int = 1

    @staticmethod
    def default(y, nseasons, name=None):
        sd = float(jnp.std(y))
        return Seasonal(
            nseasons=nseasons,
            sigma_prior=SdPrior(sigma_guess=0.01 * sd, upper_limit=sd),
            initial_sd=sd,
            name=name or f"seasonal_{nseasons}")

    def z(self):
        return jnp.zeros((self.dim,)).at[0].set(1.0)

    def _t(self):
        d = self.dim
        top = -jnp.ones((1, d))
        shift = jnp.eye(d - 1, d)
        return jnp.concatenate([top, shift], axis=0)

    def build(self, params):
        r_mat = jnp.zeros((self.dim, 1)).at[0, 0].set(1.0)
        q_mat = params["sigma_seasonal_sq"][None, None] * jnp.ones((1, 1))
        return self._t(), r_mat, q_mat

    def init_dist(self):
        d = self.dim
        return jnp.zeros((d,)), self.initial_sd**2 * jnp.eye(d)

    def init_params(self, key):
        u = jax.random.uniform(key, (), minval=0.02, maxval=0.3)
        return {"sigma_seasonal_sq": (self.initial_sd * u) ** 2}

    def draw_params(self, key, params, path):
        eta = _innovations(path, self._t())[:, 0]
        sigsq = self.sigma_prior.draw_variance(
            key, eta.shape[0], jnp.sum(eta * eta))
        return {"sigma_seasonal_sq": sigsq}

    def asis_groups(self):
        return [("sigma_seasonal_sq", self.sigma_prior, (0,))]


# ---------------------------------------------------------------------------
# Monthly annual cycle — reference SeasonalStateModel.hpp:134
# (MonthlyAnnualCycle: new_season(t) iff the date at t has day() == 1),
# bsts add.monthly.annual.cycle.R. A 12-season cycle for DAILY data that
# rotates only on the first day of each month; month lengths differ, so
# the transition is genuinely time-varying — here a trace-time-static
# [T, d, d] sequence (kalman.SsmParams.t_seq) computed from the calendar,
# so XLA still compiles one fixed-shape program.
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class MonthlyAnnualCycle:
    first_date: object  # datetime.date of y[0]
    sigma_prior: SdPrior
    initial_sd: float = 1.0
    name: str = "monthly"

    nseasons = 12
    err_dim: int = 1

    @property
    def dim(self):
        return self.nseasons - 1

    @staticmethod
    def default(y, first_date, name="monthly"):
        """Reference defaults (add.monthly.annual.cycle.R): sigma prior
        SdPrior(.01 sdy, upper=sdy), initial state N(0, sdy^2)."""
        sd = float(jnp.std(y))
        return MonthlyAnnualCycle(
            first_date=first_date,
            sigma_prior=SdPrior(sigma_guess=0.01 * sd, upper_limit=sd),
            initial_sd=sd, name=name)

    def _boundary_np(self, start, length):
        """Host-side float [length] array: entry k is 1.0 iff the
        transition t=start+k -> t+1 crosses into a new month, i.e. the
        date at start+k+1 is the 1st (new_season(t+1),
        SeasonalStateModel.hpp:144). Pure numpy so callers can take
        static counts; static under jit."""
        import datetime

        import numpy as np

        out = np.zeros((length,), np.float64)
        for k in range(length):
            d = self.first_date + datetime.timedelta(days=start + k + 1)
            out[k] = 1.0 if d.day == 1 else 0.0
        return out

    def _boundary(self, start, length):
        return jnp.asarray(self._boundary_np(start, length),
                           jnp.result_type(float))

    def _rotation(self):
        d = self.dim
        top = -jnp.ones((1, d))
        shift = jnp.eye(d - 1, d)
        return jnp.concatenate([top, shift], axis=0)

    def z(self):
        return jnp.zeros((self.dim,)).at[0].set(1.0)

    def t_seq(self, t_len):
        """[T, d, d]: rotation at month boundaries, identity elsewhere."""
        bnd = self._boundary(0, t_len)
        rot = self._rotation()
        eye = jnp.eye(self.dim)
        return jnp.where(bnd[:, None, None] > 0, rot, eye)

    def q_scale_seq(self, params, t_len):
        """[T, 1] innovation sd gate: the seasonal increment only fires
        on transitions into a new month."""
        return self._boundary(0, t_len)[:, None]

    def future_t_rows(self, t_len, horizon):
        """[h, d, d] forecast-period transitions (predict continues the
        calendar from the end of the training series)."""
        bnd = self._boundary(t_len - 1, horizon)
        rot = self._rotation()
        eye = jnp.eye(self.dim)
        return jnp.where(bnd[:, None, None] > 0, rot, eye)

    def future_q_scale(self, t_len, horizon):
        return self._boundary(t_len - 1, horizon)[:, None]

    def build(self, params):
        # static fallback T (the rotation); when this block is present
        # the model assembles t_seq and this matrix is unused in the
        # filter, but it keeps the block-diag shapes consistent
        r_mat = jnp.zeros((self.dim, 1)).at[0, 0].set(1.0)
        q_mat = params["sigma_monthly_sq"][None, None] * jnp.ones((1, 1))
        return self._rotation(), r_mat, q_mat

    def init_dist(self):
        d = self.dim
        return jnp.zeros((d,)), self.initial_sd**2 * jnp.eye(d)

    def init_params(self, key):
        u = jax.random.uniform(key, (), minval=0.02, maxval=0.3)
        return {"sigma_monthly_sq": (self.initial_sd * u) ** 2}

    def draw_params(self, key, params, path):
        t_len = path.shape[0]
        bnd_np = self._boundary_np(0, t_len - 1)
        bnd = jnp.asarray(bnd_np, path.dtype)
        # innovation at a boundary step: alpha_{t+1,0} = -sum(alpha_t) + eta
        eta = path[1:, 0] + jnp.sum(path[:-1], axis=-1)
        ss = jnp.sum(bnd * eta * eta)
        n = float(bnd_np.sum())  # static month-boundary count
        sigsq = self.sigma_prior.draw_variance(key, n, ss)
        return {"sigma_monthly_sq": sigsq}

    def asis_groups(self):
        # the ASIS/marginal machinery assumes a static transition; this
        # block's variance mixes through the centered draw (the
        # reference has only the centered draw for it as well)
        return []


# ---------------------------------------------------------------------------
# Trigonometric seasonality — reference TrigStateModel.hpp; bsts add.trig
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class Trig:
    period: float
    frequencies: tuple
    sigma_prior: SdPrior
    initial_sd: float = 1.0
    name: str = "trig"

    @property
    def dim(self):
        return 2 * len(self.frequencies)

    @property
    def err_dim(self):
        return 2 * len(self.frequencies)

    @staticmethod
    def default(y, period, nfreq, name="trig"):
        sd = float(jnp.std(y))
        return Trig(period=float(period),
                    frequencies=tuple(range(1, nfreq + 1)),
                    sigma_prior=SdPrior(sigma_guess=0.01 * sd,
                                        upper_limit=sd),
                    initial_sd=sd, name=name)

    def z(self):
        z = jnp.zeros((self.dim,))
        for i in range(len(self.frequencies)):
            z = z.at[2 * i].set(1.0)
        return z

    def _t(self):
        blocks = []
        for f in self.frequencies:
            lam = 2.0 * math.pi * f / self.period
            c, s = math.cos(lam), math.sin(lam)
            blocks.append(jnp.asarray([[c, s], [-s, c]]))
        return jax.scipy.linalg.block_diag(*blocks)

    def build(self, params):
        q_mat = params["sigma_trig_sq"] * jnp.eye(self.err_dim)
        return self._t(), jnp.eye(self.dim), q_mat

    def init_dist(self):
        return (jnp.zeros((self.dim,)),
                self.initial_sd**2 * jnp.eye(self.dim))

    def init_params(self, key):
        u = jax.random.uniform(key, (), minval=0.02, maxval=0.3)
        return {"sigma_trig_sq": (self.initial_sd * u) ** 2}

    def draw_params(self, key, params, path):
        eta = _innovations(path, self._t())
        sigsq = self.sigma_prior.draw_variance(
            key, eta.size, jnp.sum(eta * eta))
        return {"sigma_trig_sq": sigsq}

    def asis_groups(self):
        return [("sigma_trig_sq", self.sigma_prior,
                 tuple(range(self.err_dim)))]


# ---------------------------------------------------------------------------
# AR(p) state — reference ArStateModel.hpp + ArPosteriorSampler;
# bsts add.ar
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class ArState:
    lags: int
    sigma_prior: SdPrior
    initial_sd: float = 1.0
    # N(0, phi_prior_sd^2 I) prior on AR coefficients, truncated to the
    # stationary region
    phi_prior_sd: float = 1.0
    name: str = "ar"

    @property
    def dim(self):
        return self.lags

    err_dim: int = 1

    @staticmethod
    def default(y, lags, name=None):
        sd = float(jnp.std(y))
        return ArState(lags=lags,
                       sigma_prior=SdPrior(sigma_guess=0.01 * sd,
                                           upper_limit=sd),
                       initial_sd=sd, name=name or f"ar{lags}")

    def z(self):
        return jnp.zeros((self.dim,)).at[0].set(1.0)

    def _t(self, phi):
        d = self.dim
        top = phi[None, :]
        shift = jnp.eye(d - 1, d) if d > 1 else jnp.zeros((0, d))
        return jnp.concatenate([top, shift], axis=0)

    def build(self, params):
        r_mat = jnp.zeros((self.dim, 1)).at[0, 0].set(1.0)
        q_mat = params["sigma_ar_sq"][None, None] * jnp.ones((1, 1))
        return self._t(params["phi"]), r_mat, q_mat

    def init_dist(self):
        return (jnp.zeros((self.dim,)),
                self.initial_sd**2 * jnp.eye(self.dim))

    def init_params(self, key):
        k1, k2 = jax.random.split(key)
        phi0 = jax.random.uniform(k1, (), minval=0.0, maxval=0.8)
        u = jax.random.uniform(k2, (), minval=0.1, maxval=0.7)
        return {"phi": jnp.zeros((self.lags,)).at[0].set(phi0),
                "sigma_ar_sq": (self.initial_sd * u) ** 2}

    def draw_params(self, key, params, path):
        """Conjugate coefficient draw with fixed-trip stationarity
        rejection (reference ArPosteriorSampler::draw, which retries the
        MVN draw until the AR polynomial is stationary)."""
        k_phi, k_sig = jax.random.split(key)
        # regression of path[t+1, 0] on path[t, :] (the lag vector)
        resp = path[1:, 0]
        preds = path[:-1, :]
        sigsq = params["sigma_ar_sq"]
        prec = (preds.T @ preds) / sigsq + jnp.eye(
            self.lags) / self.phi_prior_sd**2
        b = (preds.T @ resp) / sigsq

        def draw_one(k):
            return dists.mvn.sample_suf(k, b, prec)

        def stationary(phi):
            return _jury_stationary(phi)

        keys = jax.random.split(k_phi, 16)
        cands = jax.vmap(draw_one)(keys)
        ok = jax.vmap(stationary)(cands)
        # first stationary candidate; fall back to shrinking current phi
        idx = jnp.argmax(ok)
        any_ok = jnp.any(ok)
        phi = jnp.where(any_ok, cands[idx], params["phi"] * 0.5)
        eps = resp - preds @ phi
        sigsq_new = self.sigma_prior.draw_variance(
            k_sig, eps.shape[0], jnp.sum(eps * eps))
        return {"phi": phi, "sigma_ar_sq": sigsq_new}

    def asis_groups(self):
        return [("sigma_ar_sq", self.sigma_prior, (0,))]


def _jury_stationary(phi):
    """Schur-Cohn/Jury test via the Levinson-Durbin step-down: the AR(p)
    polynomial is stationary iff every reflection coefficient has
    |k_j| < 1. Fixed-trip scan, no eigendecompositions (TPU-safe)."""
    p = phi.shape[0]

    def body(carry, _):
        a, m, ok = carry
        # current order-m reflection coefficient is a[m-1]
        k = a[m - 1]
        ok = ok & (jnp.abs(k) < 1.0)
        denom = jnp.maximum(1.0 - k * k, 1e-12)
        idx = jnp.arange(p)
        rev = a[jnp.clip(m - 2 - idx, 0, p - 1)]
        # step-down for x_t = sum a_j x_{t-j}: a'_j = (a_j + k a_{m-j})/(1-k^2)
        a_new = (a + k * rev) / denom
        a_new = jnp.where(idx < m - 1, a_new, 0.0)
        return (a_new, m - 1, ok), None

    (_, _, ok), _ = jax.lax.scan(
        body, (phi, jnp.asarray(p), jnp.asarray(True)), None, length=p)
    return ok


# ---------------------------------------------------------------------------
# Static intercept — reference StaticInterceptStateModel.hpp
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class StaticIntercept:
    initial_mean: float = 0.0
    initial_sd: float = 1.0
    name: str = "static_intercept"
    dim: int = 1
    err_dim: int = 0

    @staticmethod
    def default(y, name="static_intercept"):
        return StaticIntercept(initial_mean=float(jnp.mean(y)),
                               initial_sd=float(jnp.std(y)), name=name)

    def z(self):
        return jnp.ones((1,))

    def build(self, params):
        return jnp.ones((1, 1)), jnp.zeros((1, 0)), jnp.zeros((0, 0))

    def init_dist(self):
        return (jnp.asarray([self.initial_mean]),
                jnp.asarray([[self.initial_sd**2]]))

    def init_params(self, key):
        return {}

    def draw_params(self, key, params, path):
        return {}

    def asis_groups(self):
        return []


# ---------------------------------------------------------------------------
# Semilocal linear trend — reference SemilocalLinearTrend.hpp;
# bsts add.semilocal.linear.trend
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class SemilocalLinearTrend:
    """Level + AR(1)-mean-reverting slope with long-run slope mean D:

        mu_{t+1}    = mu_t + delta_t + eta_0
        delta_{t+1} = D + phi (delta_t - D) + eta_1

    D is carried as a third (static) state component with a Gaussian
    initial prior, so the simulation smoother imputes it jointly with the
    path — no separate conjugate draw needed. phi is drawn from its
    truncated-normal full conditional given the slope path."""

    level_prior: SdPrior
    slope_prior: SdPrior
    initial_level_mean: float = 0.0
    initial_level_sd: float = 1.0
    initial_slope_mean: float = 0.0
    initial_slope_sd: float = 1.0
    slope_mean_mean: float = 0.0
    slope_mean_sd: float = 1.0
    phi_prior_mean: float = 0.0
    phi_prior_sd: float = 0.5
    name: str = "semilocal_trend"
    dim: int = 3
    err_dim: int = 2

    @staticmethod
    def default(y, name="semilocal_trend"):
        sd = float(jnp.std(y))
        return SemilocalLinearTrend(
            level_prior=SdPrior(sigma_guess=0.01 * sd, upper_limit=sd),
            slope_prior=SdPrior(sigma_guess=0.01 * sd, upper_limit=sd),
            initial_level_mean=float(y[0]), initial_level_sd=sd,
            initial_slope_sd=sd, slope_mean_sd=sd, name=name)

    def z(self):
        return jnp.asarray([1.0, 0.0, 0.0])

    def _t(self, phi):
        return jnp.asarray([[1.0, 1.0, 0.0],
                            [0.0, 0.0, 0.0],
                            [0.0, 0.0, 1.0]]).at[1, 1].set(
            phi).at[1, 2].set(1.0 - phi)

    def build(self, params):
        r_mat = jnp.zeros((3, 2)).at[0, 0].set(1.0).at[1, 1].set(1.0)
        q_mat = jnp.diag(jnp.stack([params["sigma_level_sq"],
                                    params["sigma_slope_sq"]]))
        return self._t(params["phi"]), r_mat, q_mat

    def init_dist(self):
        return (jnp.asarray([self.initial_level_mean,
                             self.initial_slope_mean,
                             self.slope_mean_mean]),
                jnp.diag(jnp.asarray([self.initial_level_sd**2,
                                      self.initial_slope_sd**2,
                                      self.slope_mean_sd**2])))

    def init_params(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        u1 = jax.random.uniform(k1, (), minval=0.05, maxval=0.5)
        u2 = jax.random.uniform(k2, (), minval=0.01, maxval=0.2)
        phi = jax.random.uniform(k3, (), minval=0.2, maxval=0.8)
        return {"sigma_level_sq": (self.initial_level_sd * u1) ** 2,
                "sigma_slope_sq": (self.initial_level_sd * u2) ** 2,
                "phi": phi}

    def draw_params(self, key, params, path):
        k1, k2, k3 = jax.random.split(key, 3)
        level, slope, d_mean = path[:, 0], path[:, 1], path[0, 2]
        # level innovation: mu_{t+1} - mu_t - delta_t
        e_lvl = level[1:] - level[:-1] - slope[:-1]
        lvl = self.level_prior.draw_variance(
            k1, e_lvl.shape[0], jnp.sum(e_lvl * e_lvl))
        # phi | slope path: regression of (delta_{t+1}-D) on (delta_t - D),
        # truncated to (-1, 1) (reference SemilocalLinearTrend's
        # stationary-AR1 slope sampler)
        dc = slope - d_mean
        sxx = jnp.sum(dc[:-1] * dc[:-1])
        sxy = jnp.sum(dc[:-1] * dc[1:])
        sig = params["sigma_slope_sq"]
        post_prec = sxx / sig + 1.0 / self.phi_prior_sd**2
        post_mean = (sxy / sig
                     + self.phi_prior_mean / self.phi_prior_sd**2) / post_prec
        phi = dists.trun_normal.sample(
            k2, post_mean, jnp.sqrt(1.0 / post_prec), lo=-0.999, hi=0.999)
        e_slope = dc[1:] - phi * dc[:-1]
        slope_var = self.slope_prior.draw_variance(
            k3, e_slope.shape[0], jnp.sum(e_slope * e_slope))
        return {"sigma_level_sq": lvl, "sigma_slope_sq": slope_var,
                "phi": phi}

    def asis_groups(self):
        return [("sigma_level_sq", self.level_prior, (0,)),
                ("sigma_slope_sq", self.slope_prior, (1,))]


# ---------------------------------------------------------------------------
# Dynamic regression — reference DynamicRegressionStateModel.hpp;
# bsts add.dynamic.regression
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class DynamicRegression:
    """Time-varying regression coefficients: beta_{t+1,j} = beta_{t,j} +
    eta_j with per-coefficient random-walk sds; Z_t = x_t (time-varying)."""

    predictors: jax.Array  # [T, pdim]
    sigma_prior: SdPrior
    initial_sd: float = 1.0
    name: str = "dynamic_regression"

    @property
    def dim(self):
        return self.predictors.shape[1]

    @property
    def err_dim(self):
        return self.predictors.shape[1]

    @staticmethod
    def default(y, predictors, name="dynamic_regression"):
        sd = float(jnp.std(y))
        xsd = float(jnp.mean(jnp.std(predictors, axis=0)) + 1e-12)
        return DynamicRegression(
            predictors=predictors,
            sigma_prior=SdPrior(sigma_guess=0.01 * sd / xsd,
                                upper_limit=sd / xsd),
            initial_sd=sd / xsd, name=name)

    def z(self):
        # static fallback (first row); composite uses z_seq
        return self.predictors[0]

    def z_seq(self, t_len):
        return self.predictors

    def build(self, params):
        d = self.dim
        return jnp.eye(d), jnp.eye(d), jnp.diag(params["sigma_dynreg_sq"])

    def init_dist(self):
        d = self.dim
        return jnp.zeros((d,)), self.initial_sd**2 * jnp.eye(d)

    def init_params(self, key):
        u = jax.random.uniform(key, (self.dim,), minval=0.02, maxval=0.3)
        return {"sigma_dynreg_sq": (self.initial_sd * u) ** 2}

    def draw_params(self, key, params, path):
        eta = path[1:] - path[:-1]  # [T-1, d]
        keys = jax.random.split(key, self.dim)
        sigs = jax.vmap(
            lambda k, ss: self.sigma_prior.draw_variance(
                k, eta.shape[0], ss))(keys, jnp.sum(eta * eta, axis=0))
        return {"sigma_dynreg_sq": sigs}

    def asis_groups(self):
        return []


# ---------------------------------------------------------------------------
# Random-walk holiday — reference RandomWalkHolidayStateModel.hpp +
# Holiday.hpp date machinery; bsts add.random.walk.holiday
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class RandomWalkHoliday:
    """Holiday-window effects: one state component per day of the holiday
    influence window. Day j's effect follows a random walk that moves only
    when that day recurs (reference RandomWalkHolidayStateModel: the state
    variance is sigma^2 on active days, 0 otherwise); the observation
    loads the active day's effect (time-varying one-hot Z_t).

    active: [T] int array; active[t] = j in [0, window) when time t is
    day j of the holiday window, else -1."""

    active: jax.Array  # [T] int
    window: int
    sigma_prior: SdPrior
    initial_sd: float = 1.0
    name: str = "holiday"

    @property
    def dim(self):
        return self.window

    @property
    def err_dim(self):
        return self.window

    @staticmethod
    def default(y, active, window, name="holiday"):
        sd = float(jnp.std(y))
        return RandomWalkHoliday(
            active=jnp.asarray(active), window=window,
            sigma_prior=SdPrior(sigma_guess=0.1 * sd, upper_limit=sd),
            initial_sd=sd, name=name)

    def z(self):
        return jnp.zeros((self.window,))

    def z_seq(self, t_len):
        onehot = jax.nn.one_hot(self.active, self.window,
                                dtype=jnp.result_type(float))
        return jnp.where((self.active >= 0)[:, None], onehot, 0.0)

    def q_scale_seq(self, params, t_len):
        # transition t -> t+1 refreshes the day active at t+1
        nxt = jnp.concatenate([self.active[1:], jnp.asarray([-1])])
        onehot = jax.nn.one_hot(nxt, self.window,
                                dtype=jnp.result_type(float))
        return jnp.where((nxt >= 0)[:, None], onehot, 0.0)

    def build(self, params):
        d = self.window
        q_mat = params["sigma_holiday_sq"] * jnp.eye(d)
        return jnp.eye(d), jnp.eye(d), q_mat

    def init_dist(self):
        d = self.window
        return jnp.zeros((d,)), self.initial_sd**2 * jnp.eye(d)

    def init_params(self, key):
        u = jax.random.uniform(key, (), minval=0.05, maxval=0.5)
        return {"sigma_holiday_sq": (self.initial_sd * u) ** 2}

    def draw_params(self, key, params, path):
        # innovations only on refresh steps
        nxt = jnp.concatenate([self.active[1:], jnp.asarray([-1])])
        onehot = jax.nn.one_hot(nxt, self.window,
                                dtype=path.dtype)
        mask = jnp.where((nxt >= 0)[:, None], onehot, 0.0)[:-1]
        eta = (path[1:] - path[:-1]) * mask
        n = jnp.sum(mask)
        sigsq = self.sigma_prior.draw_variance(key, n, jnp.sum(eta * eta))
        return {"sigma_holiday_sq": sigsq}

    def asis_groups(self):
        return []


# ---------------------------------------------------------------------------
# Student local linear trend — reference StudentLocalLinearTrend.hpp +
# StudentLocalLinearTrendPosteriorSampler; bsts
# add.student.local.linear.trend
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class StudentLocalLinearTrend:
    """LLT with t-distributed level/slope innovations via latent
    per-time precision weights (scale mixture of normals): Q_t =
    diag(sigma_level^2 / w_level_t, sigma_slope^2 / w_slope_t). The
    weights are part of the block's params (imputed each sweep from the
    state path); nu is slice-sampled (reference
    StudentLocalLinearTrendPosteriorSampler draws weights + nu)."""

    t_len: int
    level_prior: SdPrior
    slope_prior: SdPrior
    initial_level_mean: float = 0.0
    initial_level_sd: float = 1.0
    initial_slope_sd: float = 1.0
    nu_prior_rate: float = 0.1
    name: str = "student_trend"
    dim: int = 2
    err_dim: int = 2

    @staticmethod
    def default(y, name="student_trend"):
        sd = float(jnp.std(y))
        return StudentLocalLinearTrend(
            t_len=int(y.shape[0]),
            level_prior=SdPrior(sigma_guess=0.01 * sd, upper_limit=sd),
            slope_prior=SdPrior(sigma_guess=0.01 * sd, upper_limit=sd),
            initial_level_mean=float(y[0]), initial_level_sd=sd,
            initial_slope_sd=sd, name=name)

    def z(self):
        return jnp.asarray([1.0, 0.0])

    def _t(self):
        return jnp.asarray([[1.0, 1.0], [0.0, 1.0]])

    def build(self, params):
        q_mat = jnp.diag(jnp.stack([params["sigma_level_sq"],
                                    params["sigma_slope_sq"]]))
        return self._t(), jnp.eye(2), q_mat

    def q_scale_seq(self, params, t_len):
        # sd scale 1/sqrt(w); row t applies to transition t -> t+1
        w = jnp.stack([params["w_level"], params["w_slope"]], axis=-1)
        scale = 1.0 / jnp.sqrt(jnp.maximum(w, 1e-12))
        return jnp.concatenate(
            [scale, jnp.ones((1, 2), scale.dtype)], axis=0)

    def init_dist(self):
        return (jnp.asarray([self.initial_level_mean, 0.0]),
                jnp.diag(jnp.asarray([self.initial_level_sd**2,
                                      self.initial_slope_sd**2])))

    def init_params(self, key):
        k1, k2 = jax.random.split(key)
        u1 = jax.random.uniform(k1, (), minval=0.05, maxval=0.5)
        u2 = jax.random.uniform(k2, (), minval=0.01, maxval=0.2)
        ones = jnp.ones((self.t_len - 1,))
        return {"sigma_level_sq": (self.initial_level_sd * u1) ** 2,
                "sigma_slope_sq": (self.initial_level_sd * u2) ** 2,
                "nu_level": jnp.asarray(10.0), "nu_slope": jnp.asarray(10.0),
                "w_level": ones, "w_slope": ones}

    def draw_params(self, key, params, path):
        from boom_tpu.inference.kernels.slice import slice_step

        ks = jax.random.split(key, 6)
        eta = _innovations(path, self._t())  # [T-1, 2]

        def impute_w(k, e, sigsq, nu):
            return dists.gamma.sample(
                k, 0.5 * (nu + 1.0), 0.5 * (nu + e * e / sigsq))

        w_lvl = impute_w(ks[0], eta[:, 0], params["sigma_level_sq"],
                         params["nu_level"])
        w_slp = impute_w(ks[1], eta[:, 1], params["sigma_slope_sq"],
                         params["nu_slope"])
        lvl = self.level_prior.draw_variance(
            ks[2], eta.shape[0], jnp.sum(w_lvl * eta[:, 0] ** 2))
        slp = self.slope_prior.draw_variance(
            ks[3], eta.shape[0], jnp.sum(w_slp * eta[:, 1] ** 2))

        def nu_logpost(nu, w):
            n = w.shape[0]
            half = 0.5 * nu
            return (n * (half * jnp.log(half)
                         - jax.scipy.special.gammaln(half))
                    + (half - 1.0) * jnp.sum(jnp.log(w))
                    - half * jnp.sum(w) - self.nu_prior_rate * nu)

        nu_lvl = slice_step(ks[4], params["nu_level"],
                            lambda v: nu_logpost(v, w_lvl),
                            width=2.0, lower=0.5, upper=500.0)
        nu_slp = slice_step(ks[5], params["nu_slope"],
                            lambda v: nu_logpost(v, w_slp),
                            width=2.0, lower=0.5, upper=500.0)
        return {"sigma_level_sq": lvl, "sigma_slope_sq": slp,
                "nu_level": nu_lvl, "nu_slope": nu_slp,
                "w_level": w_lvl, "w_slope": w_slp}

    def asis_groups(self):
        return []


# ---------------------------------------------------------------------------
# Regression holiday — reference RegressionHolidayStateModel.hpp:176 +
# RegressionHolidayBaseImpl; bsts add.regression.holiday
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class RegressionHoliday:
    """Holiday effects as a regression on day-of-window dummies.

    The state is trivial (deterministically 1); each holiday's per-day
    effects are PARAMETERS packed into the observation row Z_t =
    pattern[which_holiday(t), which_day(t)] (reference
    RegressionHolidayBaseImpl: "all regression information packed into
    the observation matrix"). Because window dummies never co-occur,
    each daily effect has an independent Gaussian conjugate draw from
    the observation residuals (RegressionHolidayStateModel.cpp:161-182),
    which is why this block sets `needs_residual`: the composite sweep
    hands it `resid` (y minus all other contributions) and `h` (the
    observation variance, scalar or [T]).

    which_holiday/which_day: [T] int arrays from
    boom_tpu.utils.holiday_window_arrays (−1 where inactive).
    prior: Gaussian prior N(prior_mean, prior_sd^2) on each daily effect.
    """

    which_holiday: jax.Array  # [T] int, -1 inactive
    which_day: jax.Array  # [T] int, -1 inactive
    num_holidays: int
    window: int  # max window width across holidays
    prior_mean: float = 0.0
    prior_sd: float = 1.0
    name: str = "regression_holiday"
    dim: int = 1
    err_dim: int = 0
    needs_residual: bool = True

    @staticmethod
    def from_holidays(y, holidays, first_date, name="regression_holiday",
                      prior_mean=0.0, prior_sd=None):
        """Build from utils.dates Holiday objects + the date of y[0]."""
        from boom_tpu.utils.dates import holiday_window_arrays

        wh, wd, width = holiday_window_arrays(
            holidays, first_date, int(y.shape[0]))
        sd = float(jnp.std(y))
        return RegressionHoliday(
            which_holiday=jnp.asarray(wh), which_day=jnp.asarray(wd),
            num_holidays=len(holidays), window=width,
            prior_mean=prior_mean,
            prior_sd=prior_sd if prior_sd is not None else sd,
            name=name)

    @property
    def _flat_idx(self):
        """[T] index into the flattened [H*W] pattern; 0 where inactive
        (masked separately)."""
        idx = self.which_holiday * self.window + self.which_day
        return jnp.where(self.which_day >= 0, idx, 0)

    @property
    def _active(self):
        return self.which_day >= 0

    def z(self):
        return jnp.ones((1,))

    def z_seq_params(self, params, t_len):
        vals = params["pattern"].reshape(-1)[self._flat_idx]
        return jnp.where(self._active, vals, 0.0)[:t_len, None]

    def future_z_rows(self, params, which_holiday, which_day):
        """[h, 1] observation rows for a forecast horizon, given the
        future holiday/day index arrays (pass as future_z[name] to
        Bsts.predict)."""
        which_holiday = jnp.asarray(which_holiday)
        which_day = jnp.asarray(which_day)
        idx = jnp.where(which_day >= 0,
                        which_holiday * self.window + which_day, 0)
        vals = params["pattern"].reshape(-1)[idx]
        return jnp.where(which_day >= 0, vals, 0.0)[:, None]

    def build(self, params):
        return jnp.ones((1, 1)), jnp.zeros((1, 0)), jnp.zeros((0, 0))

    def init_dist(self):
        # the state is deterministically 1
        return jnp.ones((1,)), jnp.zeros((1, 1))

    def init_params(self, key):
        return {"pattern": self.prior_sd * 0.1 * jax.random.normal(
            key, (self.num_holidays, self.window))}

    def _daily_posterior(self, resid, h):
        """Per-(holiday, day) Gaussian posterior moments given residuals."""
        n_flat = self.num_holidays * self.window
        inv_h = jnp.broadcast_to(1.0 / h, resid.shape)
        t_len = resid.shape[0]  # may be a training slice of the series
        act = self._active[:t_len]
        idx = self._flat_idx[:t_len]
        prec_data = jax.ops.segment_sum(
            jnp.where(act, inv_h, 0.0), idx, n_flat)
        rhs_data = jax.ops.segment_sum(
            jnp.where(act, resid * inv_h, 0.0), idx, n_flat)
        return prec_data, rhs_data

    def draw_params(self, key, params, path, *, resid, h):
        prec_data, rhs_data = self._daily_posterior(resid, h)
        prec = prec_data + 1.0 / self.prior_sd**2
        mean = (rhs_data + self.prior_mean / self.prior_sd**2) / prec
        z = jax.random.normal(key, mean.shape)
        pattern = (mean + z / jnp.sqrt(prec)).reshape(
            self.num_holidays, self.window)
        return {"pattern": pattern}

    def asis_groups(self):
        return []


# ---------------------------------------------------------------------------
# Hierarchical regression holiday — reference
# HierarchicalRegressionHolidayStateModel.hpp:72 (+
# HierarchicalGaussianRegressionAsisSampler); bsts
# add.regression.holiday(hierarchical)
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class HierarchicalRegressionHoliday:
    """Like RegressionHoliday, but the per-holiday daily-effect vectors
    share an MVN hierarchy: pattern_h ~ MVN(b0, V), with conjugate
    hyperdraws b0 | patterns ~ MVN and V | patterns ~ InvWishart.
    Borrowing strength across many similar holidays is the point
    (reference header: "The more, similar holidays added the better").
    Every holiday must share the same window width."""

    which_holiday: jax.Array  # [T] int
    which_day: jax.Array  # [T] int
    num_holidays: int
    window: int
    b0_prior_mean: float = 0.0
    b0_prior_sd: float = 1.0
    v_prior_df: float | None = None  # default window + 2
    v_prior_scale: float = 1.0  # V0 = scale^2 * I
    name: str = "hier_regression_holiday"
    dim: int = 1
    err_dim: int = 0
    needs_residual: bool = True

    @staticmethod
    def from_holidays(y, holidays, first_date,
                      name="hier_regression_holiday"):
        from boom_tpu.utils.dates import holiday_window_arrays

        widths = {h.maximum_window_width() for h in holidays}
        assert len(widths) == 1, (
            f"all holidays need equal windows, got {widths}")
        wh, wd, width = holiday_window_arrays(
            holidays, first_date, int(y.shape[0]))
        sd = float(jnp.std(y))
        return HierarchicalRegressionHoliday(
            which_holiday=jnp.asarray(wh), which_day=jnp.asarray(wd),
            num_holidays=len(holidays), window=width,
            b0_prior_sd=sd, v_prior_scale=0.5 * sd, name=name)

    _flat_idx = RegressionHoliday._flat_idx
    _active = RegressionHoliday._active
    z = RegressionHoliday.z
    z_seq_params = RegressionHoliday.z_seq_params
    future_z_rows = RegressionHoliday.future_z_rows
    build = RegressionHoliday.build
    init_dist = RegressionHoliday.init_dist
    _daily_posterior = RegressionHoliday._daily_posterior

    def init_params(self, key):
        k1, k2 = jax.random.split(key)
        w = self.window
        return {
            "pattern": 0.1 * self.b0_prior_sd * jax.random.normal(
                k1, (self.num_holidays, w)),
            "b0": jnp.zeros((w,)),
            "v": self.v_prior_scale**2 * jnp.eye(w),
        }

    def draw_params(self, key, params, path, *, resid, h):
        from boom_tpu import dists

        kp, kb, kv = jax.random.split(key, 3)
        hh, w = self.num_holidays, self.window
        prec_data, rhs_data = self._daily_posterior(resid, h)
        prec_data = prec_data.reshape(hh, w)
        rhs_data = rhs_data.reshape(hh, w)
        v = params["v"]
        v_inv = jnp.linalg.inv(v + 1e-10 * jnp.eye(w))

        # pattern_h | b0, V: MVN with precision diag(data) + V^-1
        def draw_one(k, pd, rd):
            prec = jnp.diag(pd) + v_inv
            return dists.mvn.sample_suf(k, rd + v_inv @ params["b0"], prec)

        pattern = jax.vmap(draw_one)(jax.random.split(kp, hh),
                                     prec_data, rhs_data)

        # b0 | patterns, V ~ MVN (prior N(mu0, tau0^2 I))
        prec_b = hh * v_inv + jnp.eye(w) / self.b0_prior_sd**2
        rhs_b = (v_inv @ jnp.sum(pattern, 0)
                 + self.b0_prior_mean / self.b0_prior_sd**2)
        b0 = dists.mvn.sample_suf(kb, rhs_b, prec_b)

        # V | patterns, b0 ~ InvWishart(df0 + H, V0 + scatter)
        df0 = (self.v_prior_df if self.v_prior_df is not None
               else w + 2.0)
        dev = pattern - b0[None, :]
        scatter = dev.T @ dev
        v_new = dists.inverse_wishart.sample(
            kv, df0 + hh,
            self.v_prior_scale**2 * jnp.eye(w) + scatter)
        return {"pattern": pattern, "b0": b0, "v": v_new}

    def asis_groups(self):
        return []


# ---------------------------------------------------------------------------
# General seasonal LLT — reference GeneralSeasonalStateModel.hpp:70
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class GeneralSeasonalLLT:
    """One local-linear-trend PER SEASON; season s = t mod S contributes
    its level to the observation at time t; the level components are
    de-meaned every transition for identifiability (the reference's
    SubsetEffectConstraintMatrix M premultiplies both the transition and
    the error expander, SparseMatrix.hpp:1701). Intended for "a sinusoid
    with growing amplitude". Per-season level/slope variances get plain
    LLT conjugate draws on their own state chunk, exactly as the
    reference's observe_state delegates to subordinate LLT models
    (GeneralSeasonalStateModel.cpp:99-107)."""

    nseasons: int
    level_prior: SdPrior
    slope_prior: SdPrior
    initial_sd: float = 1.0
    name: str = "general_seasonal_llt"

    @property
    def dim(self):
        return 2 * self.nseasons

    @property
    def err_dim(self):
        return 2 * self.nseasons

    @staticmethod
    def default(y, nseasons, name=None):
        sd = float(jnp.std(y))
        return GeneralSeasonalLLT(
            nseasons=nseasons,
            level_prior=SdPrior(sigma_guess=0.01 * sd, upper_limit=sd),
            slope_prior=SdPrior(sigma_guess=0.01 * sd, upper_limit=sd),
            initial_sd=sd, name=name or f"general_seasonal_{nseasons}")

    def _m(self):
        """De-mean levels (even positions), pass slopes through."""
        d = self.dim
        m = jnp.eye(d)
        lvl = jnp.arange(d) % 2 == 0
        sub = jnp.outer(lvl, lvl) / self.nseasons
        return m - sub

    def _t0(self):
        llt = jnp.asarray([[1.0, 1.0], [0.0, 1.0]])
        return jax.scipy.linalg.block_diag(*([llt] * self.nseasons))

    def z(self):
        return jnp.zeros((self.dim,)).at[0].set(1.0)

    def z_seq(self, t_len):
        pos = 2 * (jnp.arange(t_len) % self.nseasons)
        return jax.nn.one_hot(pos, self.dim, dtype=jnp.result_type(float))

    def build(self, params):
        m = self._m()
        q = jnp.diag(jnp.stack([params["sigma_level_sq"],
                                params["sigma_slope_sq"]],
                               axis=-1).reshape(-1))
        return m @ self._t0(), m, q

    def init_dist(self):
        return (jnp.zeros((self.dim,)),
                self.initial_sd**2 * jnp.eye(self.dim))

    def init_params(self, key):
        k1, k2 = jax.random.split(key)
        s = self.nseasons
        u1 = jax.random.uniform(k1, (s,), minval=0.05, maxval=0.5)
        u2 = jax.random.uniform(k2, (s,), minval=0.01, maxval=0.2)
        return {"sigma_level_sq": (self.initial_sd * u1) ** 2,
                "sigma_slope_sq": (self.initial_sd * u2) ** 2}

    def draw_params(self, key, params, path):
        # per-season chunks against the PLAIN LLT transition — matching
        # the reference, whose observe_state hands raw 2-dim chunks to
        # subordinate LocalLinearTrend models
        llt = jnp.asarray([[1.0, 1.0], [0.0, 1.0]])
        chunks = path.reshape(path.shape[0], self.nseasons, 2)

        def one(k, chunk):
            k1, k2 = jax.random.split(k)
            eta = chunk[1:] - chunk[:-1] @ llt.T
            lvl = self.level_prior.draw_variance(
                k1, eta.shape[0], jnp.sum(eta[:, 0] ** 2))
            slp = self.slope_prior.draw_variance(
                k2, eta.shape[0], jnp.sum(eta[:, 1] ** 2))
            return lvl, slp

        keys = jax.random.split(key, self.nseasons)
        lvls, slps = jax.vmap(one)(keys, jnp.swapaxes(chunks, 0, 1))
        return {"sigma_level_sq": lvls, "sigma_slope_sq": slps}

    def asis_groups(self):
        return []


# ---------------------------------------------------------------------------
# Dynamic regression with AR(p) coefficients — reference
# DynamicRegressionArStateModel.hpp; bsts AddDynamicRegression(model.options=
# DynamicRegressionArOptions)
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class DynamicRegressionAr:
    """Time-varying regression coefficients, each following its own AR(p)
    with mean zero: state per coefficient j is the lag stack
    (beta_j[t], ..., beta_j[t-p+1]); Z_t has x[t, j] at position
    j * lags (reference header comment). Coefficient AR parameters get
    conjugate draws with fixed-trip stationarity rejection, mirroring
    ArPosteriorSampler."""

    predictors: jax.Array  # [T, p]
    lags: int
    sigma_prior: SdPrior
    phi_prior_sd: float = 1.0
    initial_sd: float = 1.0
    name: str = "dynamic_regression_ar"

    @property
    def xdim(self):
        return self.predictors.shape[1]

    @property
    def dim(self):
        return self.xdim * self.lags

    @property
    def err_dim(self):
        return self.xdim

    @staticmethod
    def default(y, predictors, lags=1, name="dynamic_regression_ar"):
        sd = float(jnp.std(y))
        xsd = float(jnp.mean(jnp.std(predictors, axis=0)) + 1e-12)
        return DynamicRegressionAr(
            predictors=predictors, lags=lags,
            sigma_prior=SdPrior(sigma_guess=0.01 * sd / xsd,
                                upper_limit=sd / xsd),
            initial_sd=sd / xsd, name=name)

    def z(self):
        return self.z_seq(1)[0]

    def z_seq(self, t_len):
        z = jnp.zeros((self.predictors.shape[0], self.dim),
                      self.predictors.dtype)
        cols = jnp.arange(self.xdim) * self.lags
        z = z.at[:, cols].set(self.predictors)
        return z[:t_len]

    def _companion(self, phi):
        """[lags, lags] companion matrix for one coefficient."""
        p = self.lags
        top = phi[None, :]
        shift = jnp.eye(p - 1, p) if p > 1 else jnp.zeros((0, p))
        return jnp.concatenate([top, shift], axis=0)

    def build(self, params):
        t_blocks = jax.vmap(self._companion)(params["phi"])  # [x, l, l]
        t_mat = jax.scipy.linalg.block_diag(
            *[t_blocks[j] for j in range(self.xdim)])
        r_mat = jnp.zeros((self.dim, self.xdim))
        for j in range(self.xdim):
            r_mat = r_mat.at[j * self.lags, j].set(1.0)
        q_mat = jnp.diag(params["sigma_sq"])
        return t_mat, r_mat, q_mat

    def init_dist(self):
        return (jnp.zeros((self.dim,)),
                self.initial_sd**2 * jnp.eye(self.dim))

    def init_params(self, key):
        k1, k2 = jax.random.split(key)
        phi0 = jax.random.uniform(k1, (self.xdim,), minval=0.3,
                                  maxval=0.9)
        phi = jnp.zeros((self.xdim, self.lags)).at[:, 0].set(phi0)
        u = jax.random.uniform(k2, (self.xdim,), minval=0.1, maxval=0.7)
        return {"phi": phi, "sigma_sq": (self.initial_sd * u) ** 2}

    def draw_params(self, key, params, path):
        chunks = path.reshape(path.shape[0], self.xdim, self.lags)

        def one(k, chunk, sigsq_cur, phi_cur):
            k_phi, k_sig = jax.random.split(k)
            resp = chunk[1:, 0]
            preds = chunk[:-1, :]
            prec = (preds.T @ preds) / sigsq_cur + jnp.eye(
                self.lags) / self.phi_prior_sd**2
            b = (preds.T @ resp) / sigsq_cur
            cands = jax.vmap(
                lambda kk: dists.mvn.sample_suf(kk, b, prec))(
                    jax.random.split(k_phi, 16))
            ok = jax.vmap(_jury_stationary)(cands)
            idx = jnp.argmax(ok)
            phi = jnp.where(jnp.any(ok), cands[idx], phi_cur * 0.5)
            eps = resp - preds @ phi
            sigsq = self.sigma_prior.draw_variance(
                k_sig, eps.shape[0], jnp.sum(eps * eps))
            return phi, sigsq

        keys = jax.random.split(key, self.xdim)
        phi, sigsq = jax.vmap(one)(keys, jnp.swapaxes(chunks, 0, 1),
                                   params["sigma_sq"], params["phi"])
        return {"phi": phi, "sigma_sq": sigsq}

    def asis_groups(self):
        return []
