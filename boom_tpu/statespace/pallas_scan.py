"""Pallas TPU kernel for temporal-parallel Kalman filtering/smoothing.

`jax.lax.associative_scan` (parallel_kalman.py) materializes every one of
its O(log T) levels to HBM and launches a separate fusion per level, so at
the single-series regime (the reference's `bsts(y, niter=...)` use case —
one long series, a handful of chains) it barely beats the latency-bound
sequential scan. This module runs the ENTIRE Hillis-Steele recursive-
doubling scan inside one Pallas kernel with every level resident in VMEM:
time on lanes, the 3d^2+2d element components as rows, each level a batch
of elementwise VPU ops plus a static lane roll. One kernel launch, zero
intermediate HBM traffic.

The algebra is the Särkkä & García-Fernández (IEEE TAC 2021) parallel
filter/smoother, identical to parallel_kalman.py (reference sequential
loop: Models/StateSpace/Filters/ScalarKalmanFilter.cpp:132); this file
only changes WHERE the scan runs. The combine is unrolled over the state
dimension d at trace time — all row ops are (1, T) elementwise VPU work,
the d x d solves are unrolled no-pivot Gauss-Jordan (same argument as
parallel_kalman._solve_small: the systems are I + (PSD)(PSD)).

Wins at d <= ~6 and T >= ~512 with few chains; the bsts 'auto' smoother
dispatch (bsts.py) picks this path in that regime and the batched
sequential scan when thousands of vmapped chains already saturate the VPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from boom_tpu.statespace.kalman import SsmParams
from boom_tpu.statespace.parallel_kalman import (
    _filter_elements,
    _hp,
    _simulate_elements,
    _smooth_elements,
)

_LANE = 128


def _interpret() -> bool:
    """Run the kernel in interpreter mode off-TPU (CPU tests)."""
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# list-of-rows linear algebra (each "scalar" is a (1, T) array)
# ---------------------------------------------------------------------------

def _unpack_mat(rows, off, d):
    return [[rows[off + i * d + j] for j in range(d)] for i in range(d)]


def _unpack_vec(rows, off, d):
    return [rows[off + i] for i in range(d)]


def _mm(a, b):
    d, m = len(a), len(b[0])
    return [[sum(a[i][k] * b[k][j] for k in range(len(b)))
             for j in range(m)] for i in range(d)]


def _mv(a, v):
    return [sum(a[i][k] * v[k] for k in range(len(v))) for i in range(len(a))]


def _tr(a):
    return [[a[j][i] for j in range(len(a))] for i in range(len(a[0]))]


def _madd(a, b):
    return [[a[i][j] + b[i][j] for j in range(len(a[0]))]
            for i in range(len(a))]


def _vadd(u, v):
    return [u[i] + v[i] for i in range(len(u))]


def _sym(a):
    d = len(a)
    return [[0.5 * (a[i][j] + a[j][i]) for j in range(d)] for i in range(d)]


def _gj_solve(m_rows, b_rows):
    """Solve M X = B by unrolled no-pivot Gauss-Jordan; M: d x d lists,
    B: d x m lists of (1, T) rows. The systems here are I + C J with C, J
    PSD (diagonally dominant in practice) — no pivoting needed."""
    d, m = len(m_rows), len(b_rows[0])
    aug = [list(m_rows[i]) + list(b_rows[i]) for i in range(d)]
    for i in range(d):
        inv = 1.0 / aug[i][i]
        row_i = [aug[i][c] * inv for c in range(d + m)]
        new_aug = []
        for r in range(d):
            if r == i:
                new_aug.append(row_i)
            else:
                fac = aug[r][i]
                new_aug.append([aug[r][c] - fac * row_i[c]
                                for c in range(d + m)])
        aug = new_aug
    return [[aug[r][d + c] for c in range(m)] for r in range(d)]


def _eye_rows(like_row, d):
    one = jnp.ones_like(like_row)
    zero = jnp.zeros_like(like_row)
    return [[one if i == j else zero for j in range(d)] for i in range(d)]


# ---------------------------------------------------------------------------
# combine functions (earlier element first, per forward Hillis-Steele)
# ---------------------------------------------------------------------------

def _combine_filter_rows(d, x1, x2):
    """Särkkä-García-Fernández lemma 8 on row lists. Layout per element:
    [A (d^2), C (d^2), J (d^2), b (d), eta (d)]."""
    a1 = _unpack_mat(x1, 0, d)
    c1 = _unpack_mat(x1, d * d, d)
    j1 = _unpack_mat(x1, 2 * d * d, d)
    b1 = _unpack_vec(x1, 3 * d * d, d)
    e1 = _unpack_vec(x1, 3 * d * d + d, d)
    a2 = _unpack_mat(x2, 0, d)
    c2 = _unpack_mat(x2, d * d, d)
    j2 = _unpack_mat(x2, 2 * d * d, d)
    b2 = _unpack_vec(x2, 3 * d * d, d)
    e2 = _unpack_vec(x2, 3 * d * d + d, d)
    eye = _eye_rows(x1[0], d)

    icj = _madd(eye, _mm(c1, j2))           # I + C1 J2
    x_mat = _tr(_gj_solve(_tr(icj), _tr(a2)))  # A2 (I + C1 J2)^{-1}
    a = _mm(x_mat, a1)
    b = _vadd(_mv(x_mat, _vadd(b1, _mv(c1, e2))), b2)
    c = _sym(_madd(_mm(_mm(x_mat, c1), _tr(a2)), c2))
    ijc = _madd(eye, _mm(j2, c1))           # I + J2 C1
    rhs_v = [e2[i] - _mv(j2, b1)[i] for i in range(d)]
    rhs = [[rhs_v[i]] + _mm(j2, a1)[i] for i in range(d)]
    sol = _gj_solve(ijc, rhs)
    a1t = _tr(a1)
    eta = _vadd(_mv(a1t, [sol[i][0] for i in range(d)]), e1)
    jmat = _sym(_madd(_mm(a1t, [[sol[i][1 + j] for j in range(d)]
                                for i in range(d)]), j1))
    out = []
    for mat in (a, c, jmat):
        out += [mat[i][j] for i in range(d) for j in range(d)]
    return out + list(b) + list(eta)


def _combine_affine_rows(d, x1, x2):
    """Forward affine composition x -> A2(A1 x + b1) + b2. Layout:
    [A (d^2), b (d)]. Used for the unconditional simulation recurrence."""
    a1 = _unpack_mat(x1, 0, d)
    b1 = _unpack_vec(x1, d * d, d)
    a2 = _unpack_mat(x2, 0, d)
    b2 = _unpack_vec(x2, d * d, d)
    a = _mm(a2, a1)
    b = _vadd(_mv(a2, b1), b2)
    return [a[i][j] for i in range(d) for j in range(d)] + list(b)


def _combine_smooth_rows(d, x1, x2):
    """Suffix composition on the FLIPPED time axis: x1 is the accumulated
    later-in-real-time suffix, x2 the earlier element; result
    (E2 E1, g2 + E2 g1) per parallel_kalman._combine_smooth. Layout:
    [E (d^2), g (d)]."""
    e1 = _unpack_mat(x1, 0, d)
    g1 = _unpack_vec(x1, d * d, d)
    e2 = _unpack_mat(x2, 0, d)
    g2 = _unpack_vec(x2, d * d, d)
    e = _mm(e2, e1)
    g = _vadd(g2, _mv(e2, g1))
    return [e[i][j] for i in range(d) for j in range(d)] + list(g)


# ---------------------------------------------------------------------------
# the kernel: in-VMEM Hillis-Steele inclusive scan over the lane axis
# ---------------------------------------------------------------------------

def _scan_kernel(combine_rows, levels, dynamic, x_ref, o_ref):
    f_rows = x_ref.shape[0]
    t_pad = x_ref.shape[1]
    if dynamic:
        # rolled program: one combine instance inside a fori_loop with a
        # dynamic lane rotate — keeps the Mosaic program small for larger
        # state dims where the unrolled form blows up the compiler
        lane = jax.lax.broadcasted_iota(jnp.int32, (f_rows, t_pad), 1)

        def body(lvl, acc):
            s = jnp.left_shift(1, lvl)
            rolled = pltpu.roll(acc, s, 1)
            comb = combine_rows(
                [rolled[i:i + 1, :] for i in range(f_rows)],
                [acc[i:i + 1, :] for i in range(f_rows)])
            return jnp.where(lane >= s, jnp.concatenate(comb, axis=0), acc)

        o_ref[:] = jax.lax.fori_loop(0, levels, body, x_ref[:])
        return
    rows = [x_ref[i:i + 1, :] for i in range(f_rows)]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, t_pad), 1)
    for lvl in range(levels):
        s = 1 << lvl
        # static circular roll: wrapped lanes (i < s) are masked below,
        # so garbage from the pad tail never reaches a live lane
        shifted = [jnp.concatenate([r[:, t_pad - s:], r[:, :t_pad - s]],
                                   axis=1) for r in rows]
        comb = combine_rows(shifted, rows)
        keep = lane >= s
        rows = [jnp.where(keep, c, r) for c, r in zip(comb, rows)]
    for i in range(f_rows):
        o_ref[i:i + 1, :] = rows[i]


@functools.partial(jax.jit, static_argnums=(0, 1))
def _pallas_inclusive_scan(combine_name, d, stacked):
    """stacked: (F, T). Returns the inclusive scan along axis 1 computed
    by a single Pallas kernel (interpreter mode off-TPU)."""
    combine = {
        "filter": _combine_filter_rows,
        "affine": _combine_affine_rows,
        "smooth": _combine_smooth_rows,
    }[combine_name]
    f_rows, t_len = stacked.shape
    t_pad = max(_LANE, -(-t_len // _LANE) * _LANE)
    x = jnp.pad(stacked, ((0, 0), (0, t_pad - t_len)))
    levels = max(1, (t_len - 1).bit_length())
    # unrolled levels compile to the fastest code but the Mosaic program
    # grows as levels * d^3; beyond ~3-state systems roll the loop
    # (pltpu.roll takes a dynamic shift). Interpreter mode (CPU tests)
    # lacks pltpu.roll, so it always unrolls.
    interpret = _interpret()
    dynamic = (not interpret) and levels * d ** 3 > 400
    kernel = functools.partial(
        _scan_kernel, functools.partial(combine, d), levels, dynamic)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((f_rows, t_pad), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(x)
    return out[:, :t_len]


def _stack_filter(elems):
    t_len, d = elems.b.shape
    return jnp.concatenate([
        elems.a.reshape(t_len, d * d).T,
        elems.c.reshape(t_len, d * d).T,
        elems.j.reshape(t_len, d * d).T,
        elems.b.T, elems.eta.T], axis=0)


# ---------------------------------------------------------------------------
# public API (drop-ins for the parallel_kalman functions)
# ---------------------------------------------------------------------------

@_hp
def pallas_filter_moments(params: SsmParams, y, observed=None):
    """Filtered means/covs for all t — one Pallas kernel launch."""
    y = jnp.asarray(y)
    if observed is None:
        observed = jnp.ones(y.shape, bool)
    d = params.z.shape[0]
    t_len = y.shape[0]
    elems = _filter_elements(params, y, observed)
    out = _pallas_inclusive_scan("filter", d, _stack_filter(elems))
    fm = out[3 * d * d:3 * d * d + d].T
    fp = out[d * d:2 * d * d].T.reshape(t_len, d, d)
    return fm, fp


@_hp
def pallas_smooth_means(params: SsmParams, fm, fp):
    """Smoothed means from filtered moments (suffix scan, flipped)."""
    d = fm.shape[1]
    e_all, g_all = _smooth_elements(params, fm, fp)
    t_len = fm.shape[0]
    stacked = jnp.concatenate(
        [e_all.reshape(t_len, d * d).T, g_all.T], axis=0)
    out = _pallas_inclusive_scan("smooth", d, stacked[:, ::-1])[:, ::-1]
    return out[d * d:].T


@_hp
def pallas_smooth_states(params: SsmParams, y, observed=None):
    fm, fp = pallas_filter_moments(params, y, observed)
    return pallas_smooth_means(params, fm, fp)


@_hp
def pallas_simulate(key, params: SsmParams, t_len: int):
    """Unconditional (alpha, y) draw via the Pallas affine scan."""
    d = params.z.shape[0]
    dtype = params.z.dtype
    a_elems, b_elems, ke = _simulate_elements(key, params, t_len)
    stacked = jnp.concatenate(
        [a_elems.reshape(t_len, d * d).T, b_elems.T], axis=0)
    out = _pallas_inclusive_scan("affine", d, stacked)
    alphas = out[d * d:].T
    eps = jnp.sqrt(params.h) * jax.random.normal(ke, (t_len,), dtype)
    y = alphas @ params.z + eps
    return alphas, y


@_hp
def pallas_simulation_smoother(key, params: SsmParams, y, observed=None):
    """Durbin-Koopman simulation smoother, O(log T) depth, fully
    in-VMEM (drop-in for kalman.simulation_smoother on static systems)."""
    y = jnp.asarray(y)
    alpha_plus, y_plus = pallas_simulate(key, params, y.shape[0])
    params0 = params._replace(a0=jnp.zeros_like(params.a0))
    alpha_hat_diff = pallas_smooth_states(params0, y - y_plus, observed)
    return alpha_plus + alpha_hat_diff
