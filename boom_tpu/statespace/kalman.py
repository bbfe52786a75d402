"""Kalman filter and Durbin-Koopman simulation smoother for scalar series.

Reference: Models/StateSpace/Filters/ScalarKalmanFilter.cpp:132 (update),
Models/StateSpace/StateSpaceModelBase.cpp — impute_state at :278,
simulate_forward at :771, fast_disturbance_smooth at :843-:866. This is
the hot loop of every bsts fit (SURVEY.md §3.1).

Model (scalar observation):

    y_t     = Z_t' alpha_t + eps_t,        eps_t ~ N(0, H_t)
    alpha_1 = a0 + P0^{1/2} xi
    alpha_{t+1} = T alpha_t + R eta_t,     eta_t ~ N(0, Q_t)

System matrices may be time-varying where the reference's state models
need it (SparseKalmanTools handles the same generality):
  * z: [d] static or [T, d] (dynamic regression Z_t = x_t, holiday
    activation windows — reference DynamicRegressionStateModel.hpp,
    RandomWalkHolidayStateModel.hpp)
  * h: scalar or [T] (heteroscedastic observations: the latent-Gaussian
    reduction of logit/Poisson/student observation families, reference
    StateSpaceNormalMixture in StateSpaceLogitModel.hpp etc.)
  * q_scale: None or [T, q] per-time sd scale: Q_t = (s_t s_t') .* Q
    (student local linear trend latent weights; holiday windows where the
    random walk only moves on active days)

TPU-native notes: the per-step update is a [d, d] matmul batched over
vmapped chains, so the device sees [chains, d, d] batched GEMMs; the
simulation smoother runs the SAME filter once on a combined series
(y - y_plus) instead of twice (the reference's CP trick at
simulate_forward, StateSpaceModelBase.cpp:771, runs two filters in
lockstep; algebraically one filter on the difference suffices because
filtering is linear in y). Missing observations are a mask (F gates).
The static-system path keeps its own scan body so the bench-critical
case pays nothing for the generality.
"""

from __future__ import annotations

import math
from typing import NamedTuple

# unroll factor for time-axis scans: amortizes per-iteration loop overhead
# (the dominant cost of small-state Kalman steps on TPU). Platform-aware
# at trace time: r5 measured the bench bsts sweep at 19.62 s (unroll 8)
# -> 19.00 s (16) -> 18.82 s (32) on the TPU, while on the CPU test
# backend a bigger unroll only doubles every scan's compile time. The
# module constant SCAN_UNROLL stays as the CPU/base value; _unroll()
# is what the scans call.
SCAN_UNROLL = 8
_TPU_SCAN_UNROLL = 32


def _unroll():
    try:
        import jax

        if jax.default_backend() == "tpu":
            return _TPU_SCAN_UNROLL
    except Exception:
        pass
    return SCAN_UNROLL

import jax
import jax.numpy as jnp


class SsmParams(NamedTuple):
    """Scalar-observation state-space system (fields may be time-varying;
    see module docstring)."""

    z: jax.Array  # [d] or [T, d] observation vector
    t_mat: jax.Array  # [d, d] transition
    r_mat: jax.Array  # [d, q] error expander
    q_mat: jax.Array  # [q, q] state error covariance
    h: jax.Array  # scalar or [T] observation variance
    a0: jax.Array  # [d] initial state mean
    p0: jax.Array  # [d, d] initial state covariance
    q_scale: jax.Array | None = None  # optional [T, q] sd scale on Q
    # optional [T, d, d] per-step transition: T_t maps alpha_t ->
    # alpha_{t+1} (the MonthlyAnnualCycle family rotates its seasonal
    # block only at month boundaries — reference SeasonalStateModel.hpp:
    # 134 new_season(t); here the date pattern is a static trace-time
    # sequence so XLA still sees fixed shapes)
    t_seq: jax.Array | None = None

    @property
    def rqr(self):
        return self.r_mat @ self.q_mat @ self.r_mat.T

    @property
    def time_varying(self):
        return (self.z.ndim == 2 or jnp.ndim(self.h) == 1
                or self.q_scale is not None or self.t_seq is not None)

    def ts(self, t_len):
        """[T, d, d] transition matrices."""
        if self.t_seq is not None:
            return self.t_seq
        return jnp.broadcast_to(self.t_mat, (t_len,) + self.t_mat.shape)

    def zs(self, t_len):
        """[T, d] observation vectors."""
        if self.z.ndim == 2:
            return self.z
        return jnp.broadcast_to(self.z, (t_len, self.z.shape[0]))

    def hs(self, t_len):
        """[T] observation variances."""
        return jnp.broadcast_to(self.h, (t_len,))

    def rqrs(self, t_len):
        """[T, d, d] state error covariances (expanded)."""
        if self.q_scale is None:
            return jnp.broadcast_to(self.rqr,
                                    (t_len,) + self.rqr.shape)
        q_t = (self.q_scale[:, :, None] * self.q_scale[:, None, :]
               * self.q_mat)
        return jnp.einsum("dq,tqr,er->tde", self.r_mat, q_t, self.r_mat)


class FilterResult(NamedTuple):
    loglik: jax.Array
    v: jax.Array  # [T] prediction errors
    f: jax.Array  # [T] prediction error variances
    k: jax.Array  # [T, d] Kalman gains (for T a_t update)
    a: jax.Array  # [T, d] predicted state means a_t = E[alpha_t | y_{1:t-1}]
    p: jax.Array  # [T, d, d] predicted state covariances


# State-dimension crossover between the elementwise VPU form and the
# dot_general/MXU form of the [d, d] filter products. Small d (trend +
# short seasonal): dot_general pads onto the 128x128 MXU under a chain
# vmap — measured ~10-25x SLOWER at bench config (8192 chains, d=2)
# than broadcast-multiply-sum on the VPU. Large composite states
# (seasonal 52 + holidays + trend reach d >= 60): the O(d^3) VPU work
# loses to the MXU. Crossover measured by tools/measure_mm_crossover.py
# on TPU v5e: elementwise wins through d=16, dot wins from d~32; 24
# splits the gap. Dispatch is static (d is a trace-time shape).
_MXU_DISPATCH_D = 24


def _mm(a, b):
    """[d, d] matrix product: elementwise VPU form below the crossover,
    full-precision dot_general (MXU) above it (see _MXU_DISPATCH_D)."""
    if a.shape[-1] >= _MXU_DISPATCH_D:
        return jnp.matmul(a, b, precision="highest")
    return jnp.sum(a[..., :, :, None] * b[..., None, :, :], axis=-2)


def _mv(m, v):
    """Matrix-vector product (same dispatch as _mm)."""
    if m.shape[-1] >= _MXU_DISPATCH_D:
        return jnp.einsum("...ij,...j->...i", m, v,
                          precision="highest")
    return jnp.sum(m * v[..., None, :], axis=-1)


def _vdot(a, b):
    return jnp.sum(a * b, axis=-1)


def _filter_core(params: SsmParams, y, observed, want_ap: bool):
    """Shared forward pass. With want_ap=False only (v, f, k, ll) are
    emitted per step — the Koopman smoother needs nothing else (its
    alpha_1 uses a0/P0 directly), and skipping the [T, d, d] P output
    removes the dominant HBM write traffic of every bsts sweep."""
    t_len = y.shape[0]
    dtype = params.t_mat.dtype
    tv = params.time_varying

    def step_core(a, p, y_t, obs_t, z_t, h_t, rqr_t, t_mat):
        v = jnp.where(obs_t, y_t - _vdot(z_t, a), 0.0)
        pz = _mv(p, z_t)
        f = _vdot(z_t, pz) + h_t
        k_gain = jnp.where(obs_t, _mv(t_mat, pz) / f, jnp.zeros_like(pz))
        l_mat = t_mat - k_gain[..., :, None] * z_t[..., None, :]
        a_next = _mv(t_mat, a) + k_gain * v
        p_next = _mm(_mm(t_mat, p), jnp.swapaxes(l_mat, -1, -2)) + rqr_t
        p_next = 0.5 * (p_next + jnp.swapaxes(p_next, -1, -2))
        ll = jnp.where(
            obs_t,
            -0.5 * (math.log(2.0 * math.pi) + jnp.log(f) + v * v / f),
            0.0)
        out = (v, f, k_gain, ll)
        if want_ap:
            out = out + (a, p)
        return (a_next, p_next), out

    if tv and params.t_seq is not None:
        xs = (y.astype(dtype), observed, params.zs(t_len).astype(dtype),
              params.hs(t_len).astype(dtype), params.rqrs(t_len),
              params.ts(t_len).astype(dtype))

        def step(carry, inp):
            return step_core(*carry, *inp)
    elif tv:
        t_static = params.t_mat
        xs = (y.astype(dtype), observed, params.zs(t_len).astype(dtype),
              params.hs(t_len).astype(dtype), params.rqrs(t_len))

        def step(carry, inp):
            return step_core(*carry, *inp, t_static)
    else:
        rqr = params.rqr
        z_vec, h_sc = params.z, params.h
        t_static = params.t_mat
        xs = (y.astype(dtype), observed)

        def step(carry, inp):
            return step_core(*carry, inp[0], inp[1], z_vec, h_sc, rqr,
                             t_static)

    return jax.lax.scan(
        step, (params.a0.astype(dtype), params.p0.astype(dtype)),
        xs, unroll=_unroll())


def kalman_filter(params: SsmParams, y, observed=None) -> FilterResult:
    """Forward pass. `observed` is a bool mask (True = y_t present)."""
    y = jnp.asarray(y)
    t_len = y.shape[0]
    if observed is None:
        observed = jnp.ones((t_len,), bool)
    (_, _), (v, f, k, ll, a, p) = _filter_core(params, y, observed,
                                               want_ap=True)
    return FilterResult(loglik=ll.sum(), v=v, f=f, k=k, a=a, p=p)


def kalman_loglik(params: SsmParams, y, observed=None):
    """Marginal log likelihood only: the filter runs with NOTHING stacked
    per step (loglik accumulates in the carry), so no [T, ...] outputs are
    ever written. This is the evaluation primitive for marginal-variance
    moves (Bsts marginal slice/MTM), MLE, and log_lik, where dozens of
    likelihood evaluations per sweep would otherwise pay the smoother's
    HBM write traffic for arrays they never read."""
    y = jnp.asarray(y)
    t_len = y.shape[0]
    dtype = params.t_mat.dtype
    if observed is None:
        observed = jnp.ones((t_len,), bool)
    tv = params.time_varying

    def step_core(a, p, ll, y_t, obs_t, z_t, h_t, rqr_t, t_mat):
        v = jnp.where(obs_t, y_t - _vdot(z_t, a), 0.0)
        pz = _mv(p, z_t)
        f = _vdot(z_t, pz) + h_t
        k_gain = jnp.where(obs_t, _mv(t_mat, pz) / f, jnp.zeros_like(pz))
        l_mat = t_mat - k_gain[..., :, None] * z_t[..., None, :]
        a_next = _mv(t_mat, a) + k_gain * v
        p_next = _mm(_mm(t_mat, p), jnp.swapaxes(l_mat, -1, -2)) + rqr_t
        p_next = 0.5 * (p_next + jnp.swapaxes(p_next, -1, -2))
        ll_next = ll + jnp.where(
            obs_t,
            -0.5 * (math.log(2.0 * math.pi) + jnp.log(f) + v * v / f),
            0.0)
        return a_next, p_next, ll_next

    if tv and params.t_seq is not None:
        xs = (y.astype(dtype), observed, params.zs(t_len).astype(dtype),
              params.hs(t_len).astype(dtype), params.rqrs(t_len),
              params.ts(t_len).astype(dtype))

        def step(carry, inp):
            return step_core(*carry, *inp), None
    elif tv:
        t_static = params.t_mat
        xs = (y.astype(dtype), observed, params.zs(t_len).astype(dtype),
              params.hs(t_len).astype(dtype), params.rqrs(t_len))

        def step(carry, inp):
            return step_core(*carry, *inp, t_static), None
    else:
        rqr = params.rqr
        z_vec, h_sc = params.z, params.h
        t_static = params.t_mat
        xs = (y.astype(dtype), observed)

        def step(carry, inp):
            return step_core(*carry, inp[0], inp[1], z_vec, h_sc,
                             rqr, t_static), None

    (_, _, ll), _ = jax.lax.scan(
        step, (params.a0.astype(dtype), params.p0.astype(dtype),
               jnp.zeros((), dtype)),
        xs, unroll=_unroll())
    return ll


def _smoother_passes(params: SsmParams, v, f, k, observed):
    """Backward r recursion + forward state recursion given the filter's
    (v, f, k) streams (reference fast_disturbance_smooth,
    StateSpaceModelBase.cpp:843, followed by propagate_disturbances)."""
    t_len = v.shape[0]
    tv = params.time_varying
    zs = params.zs(t_len)
    rqrs = params.rqrs(t_len) if tv else None
    rqr = None if tv else params.rqr
    t_mat = params.t_mat
    ts = params.ts(t_len) if params.t_seq is not None else None

    zero_r = jnp.zeros_like(params.a0)
    if ts is not None:
        def bstep(r, inp):
            v_t, f_t, k_gain, obs, z_t, t_t = inp
            l_mat = t_t - k_gain[..., :, None] * z_t[..., None, :]
            r_prev = (jnp.where(obs, z_t * (v_t / f_t), 0.0)
                      + _mv(jnp.swapaxes(l_mat, -1, -2), r))
            return r_prev, r_prev

        _, rs = jax.lax.scan(bstep, zero_r, (v, f, k, observed, zs, ts),
                             reverse=True, unroll=_unroll())
    else:
        # static-T body: T stays a closure constant so the scan reads no
        # [T, d, d] stream (the bench-critical path's HBM budget)
        def bstep(r, inp):
            v_t, f_t, k_gain, obs, z_t = inp
            l_mat = t_mat - k_gain[..., :, None] * z_t[..., None, :]
            r_prev = (jnp.where(obs, z_t * (v_t / f_t), 0.0)
                      + _mv(jnp.swapaxes(l_mat, -1, -2), r))
            return r_prev, r_prev

        _, rs = jax.lax.scan(bstep, zero_r, (v, f, k, observed, zs),
                             reverse=True, unroll=_unroll())
    # rs[t] = r_{t-1}; alpha_1 = a_1 + P_1 r_0 with a_1 = a0, P_1 = P0
    alpha0 = params.a0 + _mv(params.p0, rs[0])

    if tv and ts is not None:
        def fstep(alpha, inp):
            r_t, rqr_t, t_t = inp
            alpha_next = _mv(t_t, alpha) + _mv(rqr_t, r_t)
            return alpha_next, alpha_next

        _, alphas = jax.lax.scan(fstep, alpha0,
                                 (rs[1:], rqrs[:-1], ts[:-1]),
                                 unroll=_unroll())
    elif tv:
        def fstep(alpha, inp):
            r_t, rqr_t = inp
            alpha_next = _mv(t_mat, alpha) + _mv(rqr_t, r_t)
            return alpha_next, alpha_next

        _, alphas = jax.lax.scan(fstep, alpha0, (rs[1:], rqrs[:-1]),
                                 unroll=_unroll())
    else:
        def fstep(alpha, r_t):
            alpha_next = _mv(t_mat, alpha) + _mv(rqr, r_t)
            return alpha_next, alpha_next

        _, alphas = jax.lax.scan(fstep, alpha0, rs[1:], unroll=_unroll())
    return jnp.concatenate([alpha0[None], alphas], axis=0)


def fast_state_smoother(params: SsmParams, filt: FilterResult, observed=None):
    """Koopman (1993) fast state smoother: E[alpha_t | y_{1:T}]."""
    t_len = filt.v.shape[0]
    if observed is None:
        observed = jnp.ones((t_len,), bool)
    return _smoother_passes(params, filt.v, filt.f, filt.k, observed)


def smooth_states(params: SsmParams, y, observed=None):
    """Filter + smoother on the light path: per-step (a, P) are never
    stored, which halves the HBM traffic of the bsts hot loop."""
    y = jnp.asarray(y)
    t_len = y.shape[0]
    if observed is None:
        observed = jnp.ones((t_len,), bool)
    (_, _), (v, f, k, _) = _filter_core(params, y, observed, want_ap=False)
    return _smoother_passes(params, v, f, k, observed)


def simulate(key, params: SsmParams, t_len: int):
    """Draw (alpha_{1:T}, y_{1:T}) from the model (simulate_forward's
    unconditional half, StateSpaceModelBase.cpp:771)."""
    k0, ka, ke = jax.random.split(key, 3)
    dtype = params.t_mat.dtype
    p0_chol = jnp.linalg.cholesky(
        params.p0 + 1e-12 * jnp.eye(params.p0.shape[0], dtype=dtype))
    alpha1 = params.a0 + p0_chol @ jax.random.normal(
        k0, params.a0.shape, dtype)
    q_dim = params.q_mat.shape[0]
    q_chol = jnp.linalg.cholesky(
        params.q_mat + 1e-12 * jnp.eye(q_dim, dtype=dtype))
    scales = (jnp.ones((t_len, q_dim), dtype) if params.q_scale is None
              else params.q_scale)
    # all T-1 innovation normals in ONE vectorized RNG call: per-step
    # key-split + threefry inside the scan body costs more than the
    # Kalman step itself at small state dims
    norms = jax.random.normal(ka, (t_len - 1, q_dim), dtype)
    etas = scales[:-1] * jnp.einsum("ij,tj->ti", q_chol, norms)

    if params.t_seq is not None:
        def step(alpha, inp):
            eta_t, t_t = inp
            alpha_next = _mv(t_t, alpha) + _mv(params.r_mat, eta_t)
            return alpha_next, alpha_next

        _, alphas = jax.lax.scan(step, alpha1,
                                 (etas, params.ts(t_len)[:-1]),
                                 unroll=_unroll())
    else:
        def step(alpha, eta_t):
            alpha_next = _mv(params.t_mat, alpha) + _mv(params.r_mat,
                                                        eta_t)
            return alpha_next, alpha_next

        _, alphas = jax.lax.scan(step, alpha1, etas, unroll=_unroll())
    alphas = jnp.concatenate([alpha1[None], alphas], axis=0)
    eps = jnp.sqrt(params.hs(t_len)) * jax.random.normal(ke, (t_len,), dtype)
    y = jnp.einsum("td,td->t", params.zs(t_len), alphas) + eps
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
    difference replaces the reference's two lockstep filters. On the
    static-system path the unconditional simulation is FUSED into the
    filter scan (one forward scan instead of two) with all RNG hoisted
    out — time-axis scan count is the unit cost of the bsts sweep."""
    y = jnp.asarray(y)
    t_len = y.shape[0]
    if observed is None:
        observed = jnp.ones((t_len,), bool)
    if params.time_varying:
        alpha_plus, y_plus = simulate(key, params, t_len)
        params0 = params._replace(a0=jnp.zeros_like(params.a0))
        alpha_hat_diff = smooth_states(params0, y - y_plus, observed)
        return alpha_plus + alpha_hat_diff

    # ---- fused static path ------------------------------------------------
    dtype = params.t_mat.dtype
    k0, ka, ke = jax.random.split(key, 3)
    d = params.a0.shape[0]
    p0_chol = jnp.linalg.cholesky(
        params.p0 + 1e-12 * jnp.eye(d, dtype=dtype))
    alpha1 = params.a0 + _mv(p0_chol, jax.random.normal(k0, (d,), dtype))
    q_dim = params.q_mat.shape[0]
    q_chol = jnp.linalg.cholesky(
        params.q_mat + 1e-12 * jnp.eye(q_dim, dtype=dtype))
    norms = jax.random.normal(ka, (t_len - 1, q_dim), dtype)
    # state-space innovations R eta_t, pre-expanded to [T-1, d]; a zero
    # row pads the last step (its innovation is never used)
    w = jnp.einsum("dq,tq->td", params.r_mat,
                   jnp.einsum("ij,tj->ti", q_chol, norms))
    w = jnp.concatenate([w, jnp.zeros((1, d), dtype)], axis=0)
    eps = jnp.sqrt(params.h).astype(dtype) * jax.random.normal(
        ke, (t_len,), dtype)

    t_mat, z_vec, h_sc, rqr = (params.t_mat, params.z, params.h,
                               params.rqr)

    def step(carry, inp):
        alpha_sim, a, p = carry
        y_t, obs_t, w_t, eps_t = inp
        yd = y_t - (_vdot(z_vec, alpha_sim) + eps_t)
        v = jnp.where(obs_t, yd - _vdot(z_vec, a), 0.0)
        pz = _mv(p, z_vec)
        f = _vdot(z_vec, pz) + h_sc
        k_gain = jnp.where(obs_t, _mv(t_mat, pz) / f, jnp.zeros_like(pz))
        l_mat = t_mat - k_gain[..., :, None] * z_vec[..., None, :]
        a_next = _mv(t_mat, a) + k_gain * v
        p_next = _mm(_mm(t_mat, p), jnp.swapaxes(l_mat, -1, -2)) + rqr
        p_next = 0.5 * (p_next + jnp.swapaxes(p_next, -1, -2))
        alpha_next = _mv(t_mat, alpha_sim) + w_t
        return (alpha_next, a_next, p_next), (alpha_sim, v, f, k_gain)

    zero_a = jnp.zeros_like(params.a0).astype(dtype)
    (_, _, _), (alpha_plus, v, f, k) = jax.lax.scan(
        step, (alpha1.astype(dtype), zero_a, params.p0.astype(dtype)),
        (y.astype(dtype), observed, w, eps), unroll=_unroll())
    params0 = params._replace(a0=jnp.zeros_like(params.a0))
    alpha_hat_diff = _smoother_passes(params0, v, f, k, observed)
    return alpha_plus + alpha_hat_diff
