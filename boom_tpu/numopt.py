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


def conjugate_gradient(fn: Callable, x0, max_iters: int = 200,
                       tol: float = 1e-8, ls_iters: int = 24):
    """Nonlinear conjugate gradient (Polak-Ribiere+ with automatic
    restart; reference numopt/conj_grad.cpp, numopt.hpp:246). Line
    search is fixed-trip backtracking Armijo — jittable, no dynamic
    shapes."""
    x0_flat, unravel = ravel_pytree(x0)
    val_grad = jax.value_and_grad(lambda xf: jnp.asarray(fn(unravel(xf))))

    def line_search(xf, d, f0, g0):
        slope = g0 @ d

        def body(carry, _):
            step, best_f, best_step = carry
            f_try = jnp.asarray(fn(unravel(xf + step * d)))
            ok = f_try <= f0 + 1e-4 * step * slope
            best_step = jnp.where(ok & (f_try < best_f), step, best_step)
            best_f = jnp.where(ok, jnp.minimum(f_try, best_f), best_f)
            return (step * 0.5, best_f, best_step), None

        (_, _, step), _ = jax.lax.scan(
            body, (jnp.asarray(1.0, xf.dtype), f0, jnp.asarray(0.0, xf.dtype)),
            None, length=ls_iters)
        return step

    def body(carry):
        xf, d, g_prev, f_prev, it, done = carry
        step = line_search(xf, d, f_prev, g_prev)
        x_new = xf + step * d
        f_new, g_new = val_grad(x_new)
        # Polak-Ribiere+, restarted when beta < 0
        beta = jnp.maximum(
            g_new @ (g_new - g_prev) / jnp.maximum(g_prev @ g_prev, 1e-30),
            0.0)
        d_new = -g_new + beta * d
        # reset to steepest descent if not a descent direction
        d_new = jnp.where(g_new @ d_new < 0, d_new, -g_new)
        done = (jnp.linalg.norm(g_new) < tol) | (step == 0.0)
        return x_new, d_new, g_new, f_new, it + 1, done

    f0, g0 = val_grad(x0_flat)
    init = (x0_flat, -g0, g0, f0, jnp.asarray(0), jnp.asarray(False))
    xf, _, g, f, it, done = jax.lax.while_loop(
        lambda c: (~c[5]) & (c[4] < max_iters), body, init)
    return OptResult(x=unravel(xf), value=f, converged=done, iterations=it)


def powell(fn: Callable, x0, max_iters: int = 50, tol: float = 1e-10,
           bracket: float = 1.0, golden_iters: int = 40):
    """Powell's derivative-free direction-set method (reference
    numopt/Powell.hpp, which wraps the classic direction-set loop).
    Each pass line-minimizes along every direction by fixed-trip
    golden-section on [-bracket, +bracket] (expanded adaptively), then
    replaces the direction of largest decrease with the total move."""
    x0_flat, unravel = ravel_pytree(x0)
    n = x0_flat.shape[0]
    f_flat = lambda xf: jnp.asarray(fn(unravel(xf)))
    gr = 0.5 * (jnp.sqrt(5.0) - 1.0)

    def line_min(xf, d):
        def fb(t):
            return f_flat(xf + t * d)

        # coarse bracketing: probe +-bracket * 2^k, center the golden
        # search on the best probe so long moves are reachable
        scales = bracket * 2.0 ** jnp.arange(-2, 6, dtype=xf.dtype)
        cand = jnp.concatenate(
            [jnp.zeros((1,), xf.dtype), scales, -scales])
        f_cand = jax.vmap(fb)(cand)
        t0 = cand[jnp.argmin(f_cand)]
        span = jnp.abs(t0) + bracket

        def golden(carry, _):
            lo, hi = carry
            m1 = hi - gr * (hi - lo)
            m2 = lo + gr * (hi - lo)
            shrink_hi = fb(m1) < fb(m2)
            return (jnp.where(shrink_hi, lo, m1),
                    jnp.where(shrink_hi, m2, hi)), None

        (lo, hi), _ = jax.lax.scan(
            golden, (t0 - span, t0 + span), None, length=golden_iters)
        t = 0.5 * (lo + hi)
        t = jnp.where(fb(t) < fb(0.0), t, 0.0)
        return xf + t * d, fb(t)

    def sweep(carry):
        xf, dirs, f_cur, it, done = carry

        def one_dir(inner, i):
            x_c, best_drop, best_i, f_c = inner
            x_n, f_n = line_min(x_c, dirs[i])
            drop = f_c - f_n
            better = drop > best_drop
            return (x_n, jnp.where(better, drop, best_drop),
                    jnp.where(better, i, best_i), f_n), None

        (x_new, best_drop, best_i, f_new), _ = jax.lax.scan(
            one_dir, (xf, jnp.asarray(0.0, xf.dtype), 0, f_cur),
            jnp.arange(n))
        # replace the best direction with the net displacement; reset the
        # set to the axes every n sweeps (the classic guard against the
        # direction set collapsing to a degenerate subspace)
        net = x_new - xf
        norm = jnp.linalg.norm(net)
        new_dir = jnp.where(norm > 1e-30, net / jnp.maximum(norm, 1e-30),
                            dirs[best_i])
        dirs = dirs.at[best_i].set(new_dir)
        dirs = jnp.where((it + 1) % n == 0,
                         jnp.eye(n, dtype=xf.dtype), dirs)
        done = jnp.abs(f_cur - f_new) < tol * (jnp.abs(f_cur) + tol)
        return x_new, dirs, f_new, it + 1, done

    init = (x0_flat, jnp.eye(n, dtype=x0_flat.dtype), f_flat(x0_flat),
            jnp.asarray(0), jnp.asarray(False))
    xf, _, f, it, done = jax.lax.while_loop(
        lambda c: (~c[4]) & (c[3] < max_iters), sweep, init)
    return OptResult(x=unravel(xf), value=f, converged=done, iterations=it)


def simulated_annealing(key, fn: Callable, x0, num_steps: int = 2000,
                        initial_temperature: float = 1.0,
                        cooling: float = 0.999, step_size: float = 0.5,
                        num_restarts: int = 8, spread: float = 2.0):
    """Simulated annealing with Gaussian proposals and geometric cooling
    (reference numopt/SimulatedAnnealingOptimizer.hpp). `num_restarts`
    annealers run batched under vmap from perturbed starts (one walker
    per VPU lane-batch — restarts are how SA escapes the nearest basin);
    the best point visited by any walker is returned."""
    x0_flat, unravel = ravel_pytree(x0)
    f_flat = lambda xf: jnp.asarray(fn(unravel(xf)))

    def one_run(k, x_start):
        def step(carry, kk):
            xf, f_cur, best_x, best_f, temp = carry
            kp, ka = jax.random.split(kk)
            prop = xf + step_size * jnp.maximum(temp, 0.05) \
                * jax.random.normal(kp, xf.shape, xf.dtype)
            f_prop = f_flat(prop)
            accept = jnp.log(jax.random.uniform(ka, (), xf.dtype)) < (
                (f_cur - f_prop) / jnp.maximum(temp, 1e-12))
            xf = jnp.where(accept, prop, xf)
            f_cur = jnp.where(accept, f_prop, f_cur)
            better = f_cur < best_f
            best_x = jnp.where(better, xf, best_x)
            best_f = jnp.where(better, f_cur, best_f)
            return (xf, f_cur, best_x, best_f, temp * cooling), None

        f0 = f_flat(x_start)
        (_, _, best_x, best_f, _), _ = jax.lax.scan(
            step, (x_start, f0, x_start, f0,
                   jnp.asarray(initial_temperature, x0_flat.dtype)),
            jax.random.split(k, num_steps))
        return best_x, best_f

    k_init, k_run = jax.random.split(key)
    starts = x0_flat + spread * jax.random.normal(
        k_init, (num_restarts,) + x0_flat.shape, x0_flat.dtype)
    starts = starts.at[0].set(x0_flat)
    best_xs, best_fs = jax.vmap(one_run)(
        jax.random.split(k_run, num_restarts), starts)
    i = jnp.argmin(best_fs)
    return OptResult(x=unravel(best_xs[i]), value=best_fs[i],
                     converged=jnp.asarray(True),
                     iterations=jnp.asarray(num_steps))


class MarkovDecisionProcess:
    """Finite stationary MDP (reference
    numopt/MarkovDecisionProcess.hpp:24): transition_probabilities[r, a, s]
    = P(next = s | state = r, action = a); rewards[r, a, s] = expected
    reward of that transition. `value_iteration` and `optimal_policy`
    are one lax.scan over the horizon — each Bellman backup is a single
    batched contraction the MXU handles."""

    def __init__(self, transition_probabilities, rewards):
        self.probs = jnp.asarray(transition_probabilities)
        self.rewards = jnp.asarray(rewards)
        assert self.probs.ndim == 3
        assert self.probs.shape == self.rewards.shape

    @property
    def num_states(self):
        return self.probs.shape[0]

    @property
    def num_actions(self):
        return self.probs.shape[1]

    def _q_backup(self, v):
        # Q[r, a] = sum_s P[r, a, s] (reward[r, a, s] + gamma V[s])
        return jnp.einsum("ras,ras->ra", self.probs,
                          self.rewards + v[None, None, :])

    def value_iteration(self, horizon: int, discount_rate: float):
        """V[s]: discounted expected total reward from state s
        (MarkovDecisionProcess.hpp:58)."""

        def backup(v, _):
            q = jnp.einsum("ras,ras->ra", self.probs,
                           self.rewards + discount_rate * v[None, None, :])
            return jnp.max(q, axis=1), None

        v0 = jnp.zeros((self.num_states,), self.rewards.dtype)
        v, _ = jax.lax.scan(backup, v0, None, length=horizon)
        return v

    def optimal_policy(self, horizon: int, discount_rate: float):
        """pi[s]: the optimal action in state s
        (MarkovDecisionProcess.hpp:69)."""
        v = self.value_iteration(horizon, discount_rate)
        q = jnp.einsum("ras,ras->ra", self.probs,
                       self.rewards + discount_rate * v[None, None, :])
        return jnp.argmax(q, axis=1)


class QLearning:
    """Tabular epsilon-greedy Q-learning (reference numopt/Qlearning.hpp).
    Functional API: `update` returns the new Q table; `run` drives an
    episode against an MDP simulator under one lax.scan."""

    def __init__(self, num_states: int, num_actions: int,
                 learning_rate: float = 0.1, discount: float = 0.95,
                 epsilon: float = 0.1):
        self.num_states = num_states
        self.num_actions = num_actions
        self.learning_rate = learning_rate
        self.discount = discount
        self.epsilon = epsilon

    def init_q(self, dtype=jnp.float32):
        return jnp.zeros((self.num_states, self.num_actions), dtype)

    def choose_action(self, key, q, state):
        ke, ka = jax.random.split(key)
        greedy = jnp.argmax(q[state])
        random_a = jax.random.randint(ka, (), 0, self.num_actions)
        explore = jax.random.uniform(ke, ()) < self.epsilon
        return jnp.where(explore, random_a, greedy)

    def update(self, q, state, action, reward, next_state):
        target = reward + self.discount * jnp.max(q[next_state])
        delta = target - q[state, action]
        return q.at[state, action].add(self.learning_rate * delta)

    def run(self, key, mdp: MarkovDecisionProcess, num_steps: int,
            initial_state: int = 0):
        """Learn online against the true MDP dynamics."""

        def step(carry, k):
            q, s = carry
            ka, kt = jax.random.split(k)
            a = self.choose_action(ka, q, s)
            s_next = jax.random.categorical(kt, jnp.log(
                jnp.clip(mdp.probs[s, a], 1e-30, None)))
            r = mdp.rewards[s, a, s_next]
            return (self.update(q, s, a, r, s_next), s_next), r

        (q, _), rewards = jax.lax.scan(
            step, (self.init_q(mdp.rewards.dtype),
                   jnp.asarray(initial_state)),
            jax.random.split(key, num_steps))
        return q, rewards


def class_assigner(key, marginal_posteriors, global_target,
                   max_kl: float = 0.05, num_sweeps: int = 200,
                   initial_temperature: float = 1.0,
                   alpha_steps: int = 8):
    """Assign each object to a class so that individual posteriors stay
    respected while the empirical class distribution matches a global
    target (reference numopt/ClassAssigner.hpp:20): minimize
        mean_i log(pi_i(k*_i) / pi_i(k_i)) + alpha KL(target, empirical)
    by simulated annealing over single-site moves, escalating alpha
    until the achieved KL is below max_kl (ClassAssigner.hpp:33-35).

    Returns (assignment [n], kl achieved)."""
    pi = jnp.asarray(marginal_posteriors)
    target = jnp.asarray(global_target)
    n, k = pi.shape
    log_pi = jnp.log(jnp.clip(pi, 1e-30, None))
    map_lp = jnp.max(log_pi, axis=1)

    def kl_of_counts(counts):
        emp = counts / n
        return jnp.sum(jnp.where(
            target > 0,
            target * (jnp.log(jnp.clip(target, 1e-30, None))
                      - jnp.log(jnp.clip(emp, 1e-30, None))), 0.0))

    def cost(assign_lp_sum, counts, alpha):
        return ((jnp.sum(map_lp) - assign_lp_sum) / n
                + alpha * kl_of_counts(counts))

    def anneal(key, assign, alpha):
        counts = jnp.sum(jax.nn.one_hot(assign, k), axis=0)
        lp_sum = jnp.sum(jnp.take_along_axis(
            log_pi, assign[:, None], axis=1))

        def sweep_step(carry, inp):
            assign, counts, lp_sum, temp = carry
            k_i, k_c, k_a = inp
            i = jax.random.randint(k_i, (), 0, n)
            new_c = jax.random.randint(k_c, (), 0, k)
            old_c = assign[i]
            new_counts = counts.at[old_c].add(-1.0).at[new_c].add(1.0)
            new_lp = lp_sum - log_pi[i, old_c] + log_pi[i, new_c]
            delta = (cost(new_lp, new_counts, alpha)
                     - cost(lp_sum, counts, alpha))
            accept = jnp.log(jax.random.uniform(k_a, ())) < (
                -delta / jnp.maximum(temp, 1e-12))
            assign = jnp.where(accept, assign.at[i].set(new_c), assign)
            counts = jnp.where(accept, new_counts, counts)
            lp_sum = jnp.where(accept, new_lp, lp_sum)
            return (assign, counts, lp_sum, temp * 0.995), None

        steps = num_sweeps * n
        keys = jax.random.split(key, (steps, 3))
        (assign, counts, lp_sum, _), _ = jax.lax.scan(
            sweep_step, (assign, counts, lp_sum,
                         jnp.asarray(initial_temperature)),
            (keys[:, 0], keys[:, 1], keys[:, 2]))
        return assign, kl_of_counts(counts)

    assign0 = jnp.argmax(log_pi, axis=1)

    def alpha_step(carry, k_a):
        assign, alpha, kl, done = carry
        new_assign, new_kl = anneal(k_a, assign, alpha)
        take = ~done
        assign = jnp.where(take, new_assign, assign)
        kl = jnp.where(take, new_kl, kl)
        done = done | (kl <= max_kl)
        return (assign, alpha * 4.0, kl, done), None

    counts0 = jnp.sum(jax.nn.one_hot(assign0, k), axis=0)
    (assign, _, kl, _), _ = jax.lax.scan(
        alpha_step,
        (assign0, jnp.asarray(1.0), kl_of_counts(counts0),
         jnp.asarray(False)),
        jax.random.split(key, alpha_steps))
    return assign, kl
