"""Temporal-parallel (associative-scan) Kalman filtering and smoothing.

The reference's Kalman loop is strictly sequential in time
(ScalarKalmanFilter.cpp:132) — O(T) sequential steps per MCMC sweep, which
on TPU is latency-bound, not FLOP-bound. This module implements the
parallel-prefix formulation of Särkkä & García-Fernández, "Temporal
Parallelization of Bayesian Smoothers" (IEEE TAC 2021): filtering and
smoothing become `jax.lax.associative_scan`s with O(log T) sequential
depth, each stage a batched [T, d, d] matmul/solve that the MXU eats. This
is the state-space analog of sequence parallelism (SURVEY.md §5
"long-context").

Used by the bsts Gibbs kernel for the Durbin-Koopman simulation smoother:
unconditional simulation is a linear recurrence (also an associative
scan), and the conditional mean comes from the parallel filter+smoother.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from boom_tpu.statespace.kalman import SsmParams


def _hp(fn):
    """Trace fn under full-precision matmuls. On TPU, `@`/einsum default
    to bf16 MXU passes — an 8e-3 relative error that downstream
    innovation differencing amplifies catastrophically (states ~1e3,
    innovations ~1e-2 for a bsts trend). The [d, d] systems here are tiny;
    full precision costs nothing measurable."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped


def _solve_small(a, b):
    """Solve a @ x = b for small static d via unrolled no-pivot
    Gauss-Jordan — pure elementwise VPU ops, no LU custom-call (which
    dominates runtime on TPU for tiny matrices). The matrices here are
    I + C J with C PSD and J PSD (diagonally dominant in practice), so
    pivoting is unnecessary."""
    d = a.shape[-1]
    aug = jnp.concatenate([a, b], axis=-1)
    for i in range(d):
        row = aug[..., i, :] / aug[..., i, i:i + 1]
        aug = aug - aug[..., :, i:i + 1] * row[..., None, :]
        # restore row i (zeroed by its own elimination)
        aug = jnp.concatenate([
            aug[..., :i, :], row[..., None, :], aug[..., i + 1:, :]],
            axis=-2)
    return aug[..., d:]


class FilterElement(NamedTuple):
    """Parametrizes p(x_k | y_{i+1:k}, x_i) as a conditional affine-Gaussian
    (A, b, C) plus an information pair (eta, J) (Särkkä-García-Fernández
    eq. 10)."""

    a: jax.Array  # [T, d, d]
    b: jax.Array  # [T, d]
    c: jax.Array  # [T, d, d]
    eta: jax.Array  # [T, d]
    j: jax.Array  # [T, d, d]


@_hp
def _generic_filter_elements(params: SsmParams, y, observed):
    """Per-step elements for k >= 2 (predict with F, Q then update with
    y_k); missing steps are pure predictions. Used for EVERY step by the
    time-sharded filter (non-first blocks have no special element)."""
    d = params.z.shape[0]
    f_mat = params.t_mat
    q = params.rqr
    z = params.z
    r_var = params.h

    s = z @ (q @ z) + r_var  # scalar
    k_gain = (q @ z) / s  # [d]
    i_kh = jnp.eye(d, dtype=z.dtype) - jnp.outer(k_gain, z)
    a_obs = i_kh @ f_mat
    c_obs = i_kh @ q
    fz = f_mat.T @ z
    j_obs = jnp.outer(fz, fz) / s

    def make(y_k, obs_k):
        a_k = jnp.where(obs_k, a_obs, f_mat)
        b_k = jnp.where(obs_k, k_gain * y_k, jnp.zeros_like(k_gain))
        c_k = jnp.where(obs_k, c_obs, q)
        eta_k = jnp.where(obs_k, fz * (y_k / s), jnp.zeros_like(fz))
        j_k = jnp.where(obs_k, j_obs, jnp.zeros_like(j_obs))
        return a_k, b_k, c_k, eta_k, j_k

    a, b, c, eta, j = jax.vmap(make)(y, observed)
    return FilterElement(a=a, b=b, c=c, eta=eta, j=j)


@_hp
def _first_element(params: SsmParams, y0, obs0):
    """The k = 1 element: filter the prior N(a0, P0) against y_1."""
    d = params.z.shape[0]
    z = params.z
    s1 = z @ (params.p0 @ z) + params.h
    k1 = (params.p0 @ z) / s1
    m1 = params.a0 + k1 * (y0 - z @ params.a0)
    c1 = (jnp.eye(d, dtype=z.dtype) - jnp.outer(k1, z)) @ params.p0
    b1 = jnp.where(obs0, m1, params.a0)
    c1 = jnp.where(obs0, c1, params.p0)
    return FilterElement(
        a=jnp.zeros((d, d), z.dtype), b=b1, c=0.5 * (c1 + c1.T),
        eta=jnp.zeros((d,), z.dtype), j=jnp.zeros((d, d), z.dtype))


@_hp
def _filter_elements(params: SsmParams, y, observed):
    """Build the per-step elements. Step 1 conditions on the prior
    N(a0, P0)."""
    elems = _generic_filter_elements(params, y, observed)
    first = _first_element(params, y[0], observed[0])
    return FilterElement(*(
        arr.at[0].set(f) for arr, f in zip(elems, first)))


def _combine_filter(e1: FilterElement, e2: FilterElement) -> FilterElement:
    """Associative combination (Särkkä-García-Fernández lemma 8); e1 is
    the earlier block. Batched over leading dims by associative_scan."""
    d = e1.a.shape[-1]
    eye = jnp.eye(d, dtype=e1.a.dtype)
    # (I + C1 J2)^{-1}
    icj = eye + e1.c @ e2.j
    a2_icj_inv = jnp.swapaxes(
        _solve_small(jnp.swapaxes(icj, -1, -2), jnp.swapaxes(e2.a, -1, -2)),
        -1, -2)  # = A2 (I + C1 J2)^{-1}
    a = a2_icj_inv @ e1.a
    b = (a2_icj_inv @ (e1.b + jnp.einsum("...ij,...j->...i", e1.c, e2.eta)
                       )[..., None])[..., 0] + e2.b
    c = a2_icj_inv @ e1.c @ jnp.swapaxes(e2.a, -1, -2) + e2.c
    # (I + J2 C1)^{-1}
    ijc = eye + e2.j @ e1.c
    rhs = jnp.concatenate([
        (e2.eta - jnp.einsum("...ij,...j->...i", e2.j, e1.b))[..., None],
        e2.j @ e1.a], axis=-1)
    sol = _solve_small(ijc, rhs)
    eta = jnp.einsum("...ji,...j->...i", e1.a, sol[..., 0]) + e1.eta
    jmat = jnp.swapaxes(e1.a, -1, -2) @ sol[..., 1:] + e1.j
    c = 0.5 * (c + jnp.swapaxes(c, -1, -2))
    jmat = 0.5 * (jmat + jnp.swapaxes(jmat, -1, -2))
    return FilterElement(a=a, b=b, c=c, eta=eta, j=jmat)


@_hp
def parallel_filter_moments(params: SsmParams, y, observed=None):
    """Filtered means/covs for all t in O(log T) depth.

    Returns (m [T, d], P [T, d, d]) with m[t] = E[alpha_t | y_{1:t}]."""
    y = jnp.asarray(y)
    if observed is None:
        observed = jnp.ones(y.shape, bool)
    elems = _filter_elements(params, y, observed)
    out = jax.lax.associative_scan(_combine_filter, elems)
    return out.b, out.c


class SmoothElement(NamedTuple):
    e: jax.Array  # [T, d, d]
    g: jax.Array  # [T, d]


def _combine_smooth(later: SmoothElement, earlier: SmoothElement
                    ) -> SmoothElement:
    """m_k|T = g_k + E_k m_{k+1|T}; suffix composition. NOTE: with
    reverse=True, associative_scan passes the accumulated LATER suffix as
    the first argument."""
    return SmoothElement(
        e=earlier.e @ later.e,
        g=earlier.g + jnp.einsum("...ij,...j->...i", earlier.e, later.g))


@_hp
def _smooth_elements(params: SsmParams, fm, fp):
    """RTS suffix-scan elements (E_k, g_k) from filtered moments."""
    f_mat = params.t_mat
    q = params.rqr
    d = f_mat.shape[0]

    def gains(m, p):
        pred = f_mat @ p @ f_mat.T + q
        eps = 1e-12 if p.dtype == jnp.float64 else 1e-6
        pred = pred + eps * jnp.eye(d, dtype=p.dtype)
        g_mat = _solve_small(pred, f_mat @ p).T  # P F' pred^{-1}
        return g_mat, m - g_mat @ (f_mat @ m)

    e_all, g_all = jax.vmap(gains)(fm[:-1], fp[:-1])
    # last element: identity on the filtered mean
    e_all = jnp.concatenate(
        [e_all, jnp.zeros((1, d, d), fm.dtype)], axis=0)
    g_all = jnp.concatenate([g_all, fm[-1:]], axis=0)
    return e_all, g_all


@_hp
def parallel_smooth_means(params: SsmParams, fm, fp):
    """Smoothed means E[alpha_t | y_{1:T}] from filtered moments, in
    O(log T) depth (RTS gains + suffix associative scan)."""
    e_all, g_all = _smooth_elements(params, fm, fp)
    out = jax.lax.associative_scan(
        _combine_smooth, SmoothElement(e=e_all, g=g_all), reverse=True)
    return out.g


@_hp
def parallel_smooth_states(params: SsmParams, y, observed=None):
    fm, fp = parallel_filter_moments(params, y, observed)
    return parallel_smooth_means(params, fm, fp)


@_hp
def _simulate_elements(key, params: SsmParams, t_len: int):
    """(A_k, b_k) elements of the linear state recurrence, plus the
    observation-noise key for the caller."""
    k0, ka, ke = jax.random.split(key, 3)
    d = params.z.shape[0]
    dtype = params.z.dtype
    p0_chol = jnp.linalg.cholesky(
        params.p0 + 1e-12 * jnp.eye(d, dtype=dtype))
    alpha1 = params.a0 + p0_chol @ jax.random.normal(k0, (d,), dtype)
    q_dim = params.q_mat.shape[0]
    if q_dim > 0:
        q_chol = jnp.linalg.cholesky(
            params.q_mat + 1e-12 * jnp.eye(q_dim, dtype=dtype))
        eta = jax.random.normal(ka, (t_len - 1, q_dim), dtype) @ q_chol.T
        w = eta @ params.r_mat.T  # [T-1, d]
    else:
        w = jnp.zeros((t_len - 1, d), dtype)

    a_elems = jnp.broadcast_to(params.t_mat, (t_len, d, d))
    a_elems = a_elems.at[0].set(jnp.zeros((d, d), dtype))
    b_elems = jnp.concatenate([alpha1[None], w], axis=0)
    return a_elems, b_elems, ke


@_hp
def parallel_simulate(key, params: SsmParams, t_len: int):
    """Unconditional draw of (alpha, y): the state recursion
    alpha_{t+1} = T alpha_t + R eta_t is a linear recurrence — an
    associative scan over (A, b) pairs."""
    dtype = params.z.dtype
    a_elems, b_elems, ke = _simulate_elements(key, params, t_len)

    def comb(x, z2):
        a1, b1 = x
        a2, b2 = z2
        return a2 @ a1, jnp.einsum("...ij,...j->...i", a2, b1) + b2

    _, alphas = jax.lax.associative_scan(comb, (a_elems, b_elems))
    eps = jnp.sqrt(params.h) * jax.random.normal(ke, (t_len,), dtype)
    y = alphas @ params.z + eps
    return alphas, y


@_hp
def parallel_simulation_smoother(key, params: SsmParams, y, observed=None):
    """Durbin-Koopman simulation smoother with O(log T) sequential depth
    (drop-in for kalman.simulation_smoother)."""
    y = jnp.asarray(y)
    alpha_plus, y_plus = parallel_simulate(key, params, y.shape[0])
    params0 = params._replace(a0=jnp.zeros_like(params.a0))
    alpha_hat_diff = parallel_smooth_states(params0, y - y_plus, observed)
    return alpha_plus + alpha_hat_diff
