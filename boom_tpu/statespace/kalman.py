"""Kalman filter and Durbin-Koopman simulation smoother for scalar series.

Reference: Models/StateSpace/Filters/ScalarKalmanFilter.cpp:132 (update),
Models/StateSpace/StateSpaceModelBase.cpp — impute_state at :278,
simulate_forward at :771, fast_disturbance_smooth at :843-:866. This is
the hot loop of every bsts fit (SURVEY.md §3.1).

Model (scalar observation, time-invariant system matrices here; the bsts
layer builds them from state blocks):

    y_t     = Z' alpha_t + eps_t,        eps_t ~ N(0, H)
    alpha_1 = a0 + P0^{1/2} xi
    alpha_{t+1} = T alpha_t + R eta_t,   eta_t ~ N(0, Q)

TPU-native notes: the per-step update is a [d, d] matmul batched over
vmapped chains, so the device sees [chains, d, d] batched GEMMs; the
simulation smoother runs the SAME filter once on a combined series
(y - y_plus) instead of twice (the reference's CP trick at
simulate_forward, StateSpaceModelBase.cpp:771, runs two filters in
lockstep; algebraically one filter on the difference suffices because
filtering is linear in y). Missing observations are a mask (F_inf gates).
"""

from __future__ import annotations

import math
from typing import NamedTuple

# unroll factor for time-axis scans: amortizes per-iteration loop overhead
# (the dominant cost of small-state Kalman steps on TPU)
SCAN_UNROLL = 8

import jax
import jax.numpy as jnp


class SsmParams(NamedTuple):
    """Time-invariant scalar-observation state-space system."""

    z: jax.Array  # [d] observation vector
    t_mat: jax.Array  # [d, d] transition
    r_mat: jax.Array  # [d, q] error expander
    q_mat: jax.Array  # [q, q] state error covariance
    h: jax.Array  # scalar observation variance
    a0: jax.Array  # [d] initial state mean
    p0: jax.Array  # [d, d] initial state covariance

    @property
    def rqr(self):
        return self.r_mat @ self.q_mat @ self.r_mat.T


class FilterResult(NamedTuple):
    loglik: jax.Array
    v: jax.Array  # [T] prediction errors
    f: jax.Array  # [T] prediction error variances
    k: jax.Array  # [T, d] Kalman gains (for T a_t update)
    a: jax.Array  # [T, d] predicted state means a_t = E[alpha_t | y_{1:t-1}]
    p: jax.Array  # [T, d, d] predicted state covariances


def kalman_filter(params: SsmParams, y, observed=None) -> FilterResult:
    """Forward pass. `observed` is a bool mask (True = y_t present)."""
    y = jnp.asarray(y)
    t_len = y.shape[0]
    if observed is None:
        observed = jnp.ones((t_len,), bool)
    dtype = params.z.dtype
    rqr = params.rqr

    def step(carry, inp):
        a, p = carry
        y_t, obs_t = inp
        v = jnp.where(obs_t, y_t - params.z @ a, 0.0)
        pz = p @ params.z
        f = params.z @ pz + params.h
        k_gain = jnp.where(obs_t, (params.t_mat @ pz) / f,
                           jnp.zeros_like(pz))
        l_mat = params.t_mat - jnp.outer(k_gain, params.z)
        a_next = params.t_mat @ a + k_gain * v
        p_next = params.t_mat @ p @ l_mat.T + rqr
        p_next = 0.5 * (p_next + p_next.T)
        ll = jnp.where(
            obs_t,
            -0.5 * (math.log(2.0 * math.pi) + jnp.log(f) + v * v / f),
            0.0)
        return (a_next, p_next), (v, f, k_gain, a, p, ll)

    (_, _), (v, f, k, a, p, ll) = jax.lax.scan(
        step, (params.a0.astype(dtype), params.p0.astype(dtype)),
        (y.astype(dtype), observed), unroll=SCAN_UNROLL)
    return FilterResult(loglik=ll.sum(), v=v, f=f, k=k, a=a, p=p)


def fast_state_smoother(params: SsmParams, filt: FilterResult, observed=None):
    """Koopman (1993) fast state smoother: E[alpha_t | y_{1:T}].

    Backward pass for the weighted-innovation process r, then a forward
    state recursion (reference fast_disturbance_smooth,
    StateSpaceModelBase.cpp:843, followed by propagate_disturbances)."""
    t_len = filt.v.shape[0]
    if observed is None:
        observed = jnp.ones((t_len,), bool)
    rqr = params.rqr

    def bstep(r, inp):
        v, f, k_gain, obs = inp
        l_mat = params.t_mat - jnp.outer(k_gain, params.z)
        r_prev = jnp.where(obs, params.z * (v / f), 0.0) + l_mat.T @ r
        return r_prev, r_prev

    zero_r = jnp.zeros_like(params.a0)
    _, rs = jax.lax.scan(bstep, zero_r,
                         (filt.v, filt.f, filt.k, observed), reverse=True,
                         unroll=SCAN_UNROLL)
    # rs[t] = r_{t-1}; alpha_1 = a_1 + P_1 r_0
    alpha0 = filt.a[0] + filt.p[0] @ rs[0]

    def fstep(alpha, r_t):
        alpha_next = params.t_mat @ alpha + rqr @ r_t
        return alpha_next, alpha_next

    _, alphas = jax.lax.scan(fstep, alpha0, rs[1:], unroll=SCAN_UNROLL)
    return jnp.concatenate([alpha0[None], alphas], axis=0)


def smooth_states(params: SsmParams, y, observed=None):
    filt = kalman_filter(params, y, observed)
    return fast_state_smoother(params, filt, observed)


def simulate(key, params: SsmParams, t_len: int):
    """Draw (alpha_{1:T}, y_{1:T}) from the model (simulate_forward's
    unconditional half, StateSpaceModelBase.cpp:771)."""
    k0, ka, ke = jax.random.split(key, 3)
    dtype = params.z.dtype
    p0_chol = jnp.linalg.cholesky(
        params.p0 + 1e-12 * jnp.eye(params.p0.shape[0], dtype=dtype))
    alpha1 = params.a0 + p0_chol @ jax.random.normal(
        k0, params.a0.shape, dtype)
    q_chol = jnp.linalg.cholesky(
        params.q_mat + 1e-12 * jnp.eye(params.q_mat.shape[0], dtype=dtype))

    def step(alpha, k):
        eta = q_chol @ jax.random.normal(k, (params.q_mat.shape[0],), dtype)
        alpha_next = params.t_mat @ alpha + params.r_mat @ eta
        return alpha_next, alpha_next

    _, alphas = jax.lax.scan(step, alpha1, jax.random.split(ka, t_len - 1),
                             unroll=SCAN_UNROLL)
    alphas = jnp.concatenate([alpha1[None], alphas], axis=0)
    eps = jnp.sqrt(params.h) * jax.random.normal(ke, (t_len,), dtype)
    y = alphas @ params.z + eps
    return alphas, y


def simulation_smoother(key, params: SsmParams, y, observed=None):
    """Draw alpha ~ p(alpha | y): Durbin-Koopman (2002) mean-correction
    simulation smoother (the reference's impute_state,
    StateSpaceModelBase.cpp:278).

    alpha_draw = alpha_plus + E_0[alpha | y - y_plus] where (alpha_plus,
    y_plus) is an unconditional simulation and E_0 is the smoother run
    with zero initial mean. The smoother is affine in the data,
    E[alpha|y] = c(a0) + A y, so alpha_hat(y) - alpha_hat(y_plus) =
    A (y - y_plus) = E_0[alpha | y - y_plus]: one filter+smoother on the
    difference replaces the reference's two lockstep filters."""
    y = jnp.asarray(y)
    alpha_plus, y_plus = simulate(key, params, y.shape[0])
    params0 = params._replace(a0=jnp.zeros_like(params.a0))
    alpha_hat_diff = smooth_states(params0, y - y_plus, observed)
    return alpha_plus + alpha_hat_diff
