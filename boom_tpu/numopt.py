"""Numerical optimization: the numopt/ layer replacement.

Reference: numopt.hpp — max_nd0/1/2 drivers (:76-:166), bfgs (:214),
conj_grad (:246), newton_raphson_min (:281), nelder_mead (:187),
numopt/Brent.hpp (scalar), numopt/Integral.hpp (1-d quadrature),
numopt/ScalarLaplaceApproximation.hpp. Used for MLE/MAP paths and the
TIM sampler's mode finding.

TPU-native form: fixed-iteration jittable loops (lax.while_loop /
fori_loop) over pure functions; gradients/Hessians come from jax.grad /
jax.hessian instead of the reference's hand-coded dTarget/d2Target
functors. All routines MINIMIZE (like the reference's *_min drivers);
use `maximize=`True or negate for posterior modes.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree


class OptResult(NamedTuple):
    x: jax.Array
    value: jax.Array
    converged: jax.Array
    iterations: jax.Array


def bfgs(fn: Callable, x0, max_iters: int = 200, tol: float = 1e-8):
    """BFGS minimization on a pytree (reference numopt.hpp:214; the
    reference delegates to its own C++ BFGS — here a jittable
    while_loop with inverse-Hessian updates and Armijo backtracking)."""
    flat0, unravel = ravel_pytree(x0)
    dim = flat0.shape[0]
    dtype = flat0.dtype

    def f(z):
        return fn(unravel(z))

    val_grad = jax.value_and_grad(f)

    def cond(c):
        return (~c["done"]) & (c["it"] < max_iters)

    def body(c):
        z, g, h_inv = c["z"], c["g"], c["h_inv"]
        direction = -(h_inv @ g)
        # Armijo backtracking (fixed 20 halvings)
        slope = g @ direction

        def bt(carry, _):
            alpha, ok = carry
            cand = z + alpha * direction
            fv = f(cand)
            good = fv <= c["val"] + 1e-4 * alpha * slope
            new_ok = ok | good
            return (jnp.where(new_ok, alpha, alpha * 0.5), new_ok), None

        (alpha, ok), _ = jax.lax.scan(
            bt, (jnp.ones((), dtype), jnp.asarray(False)), None, length=20)
        z_new = z + jnp.where(ok, alpha, 0.0) * direction
        val_new, g_new = val_grad(z_new)
        s = z_new - z
        y_vec = g_new - g
        sy = s @ y_vec
        safe = sy > 1e-12
        rho = jnp.where(safe, 1.0 / jnp.where(safe, sy, 1.0), 0.0)
        eye = jnp.eye(dim, dtype=dtype)
        v = eye - rho * jnp.outer(s, y_vec)
        h_new = jnp.where(
            safe, v @ h_inv @ v.T + rho * jnp.outer(s, s), h_inv)
        done = (jnp.max(jnp.abs(g_new)) < tol) | ~ok
        return {"z": z_new, "val": val_new, "g": g_new, "h_inv": h_new,
                "it": c["it"] + 1, "done": done}

    v0, g0 = val_grad(flat0)
    init = {"z": flat0, "val": v0, "g": g0,
            "h_inv": jnp.eye(dim, dtype=dtype),
            "it": jnp.asarray(0), "done": jnp.asarray(False)}
    out = jax.lax.while_loop(cond, body, init)
    return OptResult(x=unravel(out["z"]), value=out["val"],
                     converged=jnp.max(jnp.abs(out["g"])) < 1e-5,
                     iterations=out["it"])


def newton_raphson(fn: Callable, x0, max_iters: int = 50, tol: float = 1e-10,
                   ridge: float = 1e-8):
    """Damped Newton minimization with ridge-regularized Hessian solves
    (reference newton_raphson_min, numopt.hpp:281). Halves the step while
    the objective does not decrease (fixed 10 backtracks)."""
    flat0, unravel = ravel_pytree(x0)
    dim = flat0.shape[0]

    def f(z):
        return fn(unravel(z))

    grad_f = jax.grad(f)
    hess_f = jax.hessian(f)

    def cond(c):
        z, val, g, it, done = c
        return (~done) & (it < max_iters)

    def body(c):
        z, val, g, it, done = c
        h = hess_f(z) + ridge * jnp.eye(dim, dtype=z.dtype)
        step = jnp.linalg.solve(h, g)

        def backtrack(carry, _):
            alpha, best_z, best_val, ok = carry
            cand = z - alpha * step
            cv = f(cand)
            better = cv < best_val
            return (alpha * 0.5,
                    jnp.where(better & ~ok, cand, best_z),
                    jnp.where(better & ~ok, cv, best_val),
                    ok | better), None

        (_, z_new, val_new, improved), _ = jax.lax.scan(
            backtrack, (jnp.ones((), z.dtype), z, val,
                        jnp.asarray(False)), None, length=10)
        g_new = grad_f(z_new)
        done_new = (jnp.max(jnp.abs(g_new)) < tol) | ~improved
        return z_new, val_new, g_new, it + 1, done_new

    z0 = flat0
    init = (z0, f(z0), grad_f(z0), jnp.asarray(0), jnp.asarray(False))
    z, val, g, it, done = jax.lax.while_loop(cond, body, init)
    return OptResult(x=unravel(z), value=val,
                     converged=jnp.max(jnp.abs(g)) < 1e-5, iterations=it)


def nelder_mead(fn: Callable, x0, max_iters: int = 500, tol: float = 1e-8,
                init_scale: float = 0.5):
    """Derivative-free Nelder-Mead simplex minimization (reference
    numopt.hpp:187). Fixed-trip jittable loop."""
    flat0, unravel = ravel_pytree(x0)
    d = flat0.shape[0]

    def f(z):
        return fn(unravel(z))

    simplex = jnp.concatenate(
        [flat0[None], flat0[None] + init_scale * jnp.eye(d, dtype=flat0.dtype)])
    values = jax.vmap(f)(simplex)

    def body(carry, _):
        simplex, values = carry
        order = jnp.argsort(values)
        simplex, values = simplex[order], values[order]
        best, worst = values[0], values[-1]
        centroid = jnp.mean(simplex[:-1], 0)
        # reflection
        xr = centroid + (centroid - simplex[-1])
        fr = f(xr)
        # expansion
        xe = centroid + 2.0 * (centroid - simplex[-1])
        fe = f(xe)
        # outside contraction
        xc = centroid + 0.5 * (simplex[-1] - centroid)
        fc = f(xc)

        use_expand = (fr < best) & (fe < fr)
        use_reflect = (fr < values[-2]) & ~use_expand
        use_contract = (~use_expand) & (~use_reflect) & (fc < worst)
        new_last = jnp.where(
            use_expand, xe,
            jnp.where(use_reflect, xr, jnp.where(use_contract, xc,
                                                 simplex[-1])))
        new_last_val = jnp.where(
            use_expand, fe,
            jnp.where(use_reflect, fr, jnp.where(use_contract, fc, worst)))
        shrink = (~use_expand) & (~use_reflect) & (~use_contract)

        def do_shrink(sv):
            s, v = sv
            s2 = s.at[1:].set(0.5 * (s[1:] + s[0][None]))
            return s2, jax.vmap(f)(s2)

        def no_shrink(sv):
            s, v = sv
            return (s.at[-1].set(new_last), v.at[-1].set(new_last_val))

        simplex, values = jax.lax.cond(shrink, do_shrink, no_shrink,
                                       (simplex, values))
        return (simplex, values), None

    (simplex, values), _ = jax.lax.scan(
        body, (simplex, values), None, length=max_iters)
    i = jnp.argmin(values)
    spread = jnp.max(values) - jnp.min(values)
    return OptResult(x=unravel(simplex[i]), value=values[i],
                     converged=spread < tol,
                     iterations=jnp.asarray(max_iters))


def brent_minimize(fn: Callable, lo: float, hi: float,
                   max_iters: int = 100, tol: float = 1e-10):
    """Scalar minimization by golden-section with parabolic safeguard
    (reference numopt/Brent.hpp). Fixed-trip golden-section: robust and
    branch-light for TPU."""
    gr = 0.5 * (jnp.sqrt(5.0) - 1.0)
    a, b = jnp.asarray(lo, jnp.result_type(float)), jnp.asarray(
        hi, jnp.result_type(float))

    def body(carry, _):
        a, b = carry
        c = b - gr * (b - a)
        d = a + gr * (b - a)
        fc, fd = fn(c), fn(d)
        a = jnp.where(fc < fd, a, c)
        b = jnp.where(fc < fd, d, b)
        return (a, b), None

    (a, b), _ = jax.lax.scan(body, (a, b), None, length=max_iters)
    x = 0.5 * (a + b)
    return OptResult(x=x, value=fn(x), converged=(b - a) < tol,
                     iterations=jnp.asarray(max_iters))


# 32-point Gauss-Legendre nodes/weights on [-1, 1], generated at import
# by the Golub-Welsch eigen method (numerically exact to double).
def _gauss_legendre(n: int = 32):
    import numpy as np

    k = np.arange(1, n)
    beta = k / np.sqrt(4.0 * k * k - 1.0)
    t = np.diag(beta, 1) + np.diag(beta, -1)
    nodes, vecs = np.linalg.eigh(t)
    weights = 2.0 * vecs[0] ** 2
    return jnp.asarray(nodes), jnp.asarray(weights)


_GL_NODES, _GL_WEIGHTS = _gauss_legendre(32)


def integrate(fn: Callable, lo, hi, panels: int = 8):
    """1-d quadrature: composite 32-point Gauss-Legendre over `panels`
    subintervals (reference numopt/Integral.hpp wraps QUADPACK; fixed
    panel quadrature is the jittable equivalent — exact for polynomials
    of degree 63 per panel)."""
    lo = jnp.asarray(lo, jnp.result_type(float))
    hi = jnp.asarray(hi, jnp.result_type(float))
    edges = lo + (hi - lo) * jnp.arange(panels + 1) / panels
    mid = 0.5 * (edges[1:] + edges[:-1])  # [P]
    half = 0.5 * (edges[1:] - edges[:-1])  # [P]
    x = mid[:, None] + half[:, None] * _GL_NODES[None, :]  # [P, 32]
    w = half[:, None] * _GL_WEIGHTS[None, :]
    return jnp.sum(w * jax.vmap(jax.vmap(fn))(x))


def laplace_approximation(log_density: Callable, x0, max_iters: int = 50):
    """Scalar/vector Laplace approximation to int exp(log_density):
    mode by Newton, covariance = inverse negative Hessian, log integral =
    logf(mode) + d/2 log(2 pi) - 1/2 logdet(-H) (reference
    numopt/ScalarLaplaceApproximation.hpp). Returns (mode, cov,
    log_integral)."""
    res = newton_raphson(lambda z: -log_density(z), x0,
                         max_iters=max_iters)
    flat, unravel = ravel_pytree(res.x)

    def f(z):
        return log_density(unravel(z))

    h = jax.hessian(f)(flat)
    neg_h = -h
    d = flat.shape[0]
    chol = jnp.linalg.cholesky(neg_h)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol)))
    cov = jax.scipy.linalg.cho_solve((chol, True), jnp.eye(d))
    log_integral = (f(flat) + 0.5 * d * jnp.log(2.0 * jnp.pi)
                    - 0.5 * logdet)
    return res.x, cov, log_integral


def linear_assignment(cost):
    """Minimum-cost perfect assignment on a square cost matrix
    (reference numopt/LinearAssignment.hpp + the vendored solver in
    numopt/linear_assignment/). Host-side O(n^3) Hungarian (Jonker-
    Volgenant potentials variant) in numpy — assignment problems here
    are analysis-time (mixture relabeling) or tiny, never traced.

    Returns row_to_col: row i is assigned column row_to_col[i]."""
    import numpy as np

    c = np.asarray(cost, dtype=float)
    assert c.ndim == 2 and c.shape[0] == c.shape[1], c.shape
    n = c.shape[0]
    # potentials u (rows), v (cols); way[j] = predecessor col on the
    # augmenting path; p[j] = row matched to col j (1-indexed internals)
    inf = float("inf")
    u = np.zeros(n + 1)
    v = np.zeros(n + 1)
    p = np.zeros(n + 1, dtype=int)
    way = np.zeros(n + 1, dtype=int)
    for i in range(1, n + 1):
        p[0] = i
        j0 = 0
        minv = np.full(n + 1, inf)
        used = np.zeros(n + 1, dtype=bool)
        while True:
            used[j0] = True
            i0, delta, j1 = p[j0], inf, 0
            for j in range(1, n + 1):
                if not used[j]:
                    cur = c[i0 - 1, j - 1] - u[i0] - v[j]
                    if cur < minv[j]:
                        minv[j] = cur
                        way[j] = j0
                    if minv[j] < delta:
                        delta = minv[j]
                        j1 = j
            for j in range(n + 1):
                if used[j]:
                    u[p[j]] += delta
                    v[j] -= delta
                else:
                    minv[j] -= delta
            j0 = j1
            if p[j0] == 0:
                break
        while j0:
            j1 = way[j0]
            p[j0] = p[j1]
            j0 = j1
    row_to_col = np.zeros(n, dtype=int)
    for j in range(1, n + 1):
        if p[j] > 0:
            row_to_col[p[j] - 1] = j - 1
    return row_to_col
