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
        df = self.sample_size + n
        ss = self.sample_size * self.sigma_guess**2 + sum_sq
        if math.isinf(self.upper_limit):
            return dists.scaled_inv_chisq.sample(key, df, ss / df)
        prec = dists.trun_gamma.sample(
            key, 0.5 * df, 0.5 * ss, lo=1.0 / self.upper_limit**2)
        return 1.0 / prec


def _innovations(path, t_mat):
    """eta rows: path[t+1] - T path[t], [T-1, dim]."""
    return path[1:] - path[:-1] @ jnp.asarray(t_mat).T


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
