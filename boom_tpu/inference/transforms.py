"""Change-of-variable transforms with log-Jacobians.

Reference: TargetFun/Transformation.hpp (Transformation/Jacobian),
TargetFun/LogTransform.hpp, LogitTransform.hpp,
MultinomialLogitTransform.hpp — used to sample positive / interval /
simplex parameters on unconstrained scales.

Each transform maps unconstrained -> constrained:
    forward(u) -> x,  inverse(x) -> u,  log_det_jac(u) -> scalar
and `transformed_log_target(t, log_target)` gives the unconstrained-space
density log p(forward(u)) + log|J|(u) for use with any kernel (slice, MH,
HMC/NUTS) — the TPU replacement for the reference's Jacobian plumbing.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Transform:
    forward: Callable
    inverse: Callable
    log_det_jac: Callable  # of the unconstrained value u

    def __call__(self, u):
        return self.forward(u)


def _sum_all(x):
    return jnp.sum(x) if jnp.ndim(x) else x


# positive scale: x = exp(u) (reference LogTransform)
log_transform = Transform(
    forward=jnp.exp,
    inverse=jnp.log,
    log_det_jac=lambda u: _sum_all(u),
)

# softplus alternative for positive scale (better-conditioned tails)
softplus_transform = Transform(
    forward=jax.nn.softplus,
    inverse=lambda x: x + jnp.log(-jnp.expm1(-x)),
    log_det_jac=lambda u: _sum_all(jax.nn.log_sigmoid(u)),
)


def interval_transform(lo=0.0, hi=1.0):
    """x = lo + (hi-lo) sigmoid(u) (reference LogitTransform for (0,1))."""
    width = hi - lo

    def forward(u):
        return lo + width * jax.nn.sigmoid(u)

    def inverse(x):
        p = (x - lo) / width
        return jnp.log(p) - jnp.log1p(-p)

    def log_det_jac(u):
        return _sum_all(jnp.log(width) + jax.nn.log_sigmoid(u)
                        + jax.nn.log_sigmoid(-u))

    return Transform(forward, inverse, log_det_jac)


logit_transform = interval_transform(0.0, 1.0)


def simplex_transform(dim: int):
    """Stick-breaking map R^{d-1} -> interior of the d-simplex with the
    Stan-style centering offsets (reference MultinomialLogitTransform is
    the additive-log-ratio variant; stick-breaking is better conditioned).
    """
    offsets = jnp.log(jnp.arange(dim - 1, 0, -1, dtype=jnp.result_type(
        float)))

    def forward(u):
        zs = jax.nn.sigmoid(u - offsets)

        def body(rest, z):
            x = rest * z
            return rest - x, x

        rest, xs = jax.lax.scan(body, jnp.ones((), u.dtype), zs)
        return jnp.concatenate([xs, rest[None]])

    def inverse(x):
        rest = 1.0 - jnp.concatenate(
            [jnp.zeros((1,), x.dtype), jnp.cumsum(x[:-1])])
        z = x[:-1] / rest[:-1]
        return jnp.log(z) - jnp.log1p(-z) + offsets

    def log_det_jac(u):
        zs = jax.nn.sigmoid(u - offsets)

        def body(rest, z):
            return rest * (1.0 - z), rest

        _, rests = jax.lax.scan(body, jnp.ones((), u.dtype), zs)
        return jnp.sum(jnp.log(rests) + jax.nn.log_sigmoid(u - offsets)
                       + jax.nn.log_sigmoid(offsets - u))

    return Transform(forward, inverse, log_det_jac)


def mlogit_transform(dim: int):
    """Additive log ratio: x_k = exp(u_k) / (1 + sum exp(u)), the exact
    reference MultinomialLogitTransform (TargetFun/
    MultinomialLogitTransform.hpp) with its Jacobian."""

    def forward(u):
        z = jnp.concatenate([jnp.zeros((1,), u.dtype), u])
        return jax.nn.softmax(z)

    def inverse(x):
        return jnp.log(x[1:]) - jnp.log(x[0])

    def log_det_jac(u):
        z = jnp.concatenate([jnp.zeros((1,), u.dtype), u])
        logp = jax.nn.log_softmax(z)
        # |J| = prod_k x_k (all d of them)
        return jnp.sum(logp)

    return Transform(forward, inverse, log_det_jac)


def transformed_log_target(transform: Transform, log_target: Callable):
    """Unconstrained-space log density: log p(f(u)) + log |df/du|."""

    def logp(u):
        return log_target(transform.forward(u)) + transform.log_det_jac(u)

    return logp


def check_jacobian(transform: Transform, u, tol=1e-5):
    """Numerical Jacobian check (reference TargetFun/JacobianChecker.hpp):
    compares log_det_jac against jax.jacfwd's determinant. Returns the
    absolute error (test helper)."""
    u = jnp.asarray(u)
    jac = jax.jacfwd(transform.forward)(u)
    if jac.ndim == 0 or u.ndim == 0:
        ld = jnp.log(jnp.abs(jac))
    else:
        jac2d = jac.reshape(-1, u.size)
        # square part (simplex maps d-1 -> d: drop the dependent last row)
        sq = jac2d[:u.size, :]
        ld = jnp.linalg.slogdet(sq)[1]
    return jnp.abs(ld - transform.log_det_jac(u))
