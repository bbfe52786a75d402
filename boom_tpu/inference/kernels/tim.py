"""TIM: tailored independence Metropolis.

Reference: Samplers/TIM.hpp:42 — find the posterior mode, build a
multivariate-T proposal at the mode (covariance = inverse negative
Hessian), then run independence MH. Used by e.g.
BinomialLogitSamplerTim. Here the mode comes from numopt.newton_raphson
(autodiff Hessian), and the proposal/acceptance are fully vectorizable
over chains.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from boom_tpu import dists
from boom_tpu import numopt


class TimProposal(NamedTuple):
    mode: jax.Array  # flat [d]
    chol: jax.Array  # [d, d] cholesky of the proposal covariance
    df: jax.Array


def build_tim_proposal(log_target: Callable, x0, df: float = 3.0,
                       max_iters: int = 50, inflate: float = 1.2):
    """Locate the mode and build the multivariate-T proposal (reference
    TIM::locate_mode)."""
    flat0, unravel = ravel_pytree(x0)

    def f(z):
        return -log_target(unravel(z))

    res = numopt.newton_raphson(f, flat0, max_iters=max_iters)
    mode, _ = ravel_pytree(res.x)
    h = jax.hessian(f)(mode)
    d = mode.shape[0]
    cov = jnp.linalg.inv(h + 1e-8 * jnp.eye(d, dtype=mode.dtype))
    cov = 0.5 * (cov + cov.T) * inflate**2
    chol = jnp.linalg.cholesky(cov)
    return TimProposal(mode=mode, chol=chol, df=jnp.asarray(df)), unravel


def tim_step(key, x_flat, log_target_flat, prop: TimProposal):
    """One independence-MH step from the tailored T proposal."""
    k_prop, k_acc = jax.random.split(key)
    cand = dists.mvt.sample(k_prop, prop.mode, None, prop.df,
                            chol=prop.chol)
    lq_cand = dists.mvt.logpdf(cand, prop.mode, None, prop.df,
                               chol=prop.chol)
    lq_cur = dists.mvt.logpdf(x_flat, prop.mode, None, prop.df,
                              chol=prop.chol)
    log_ratio = (log_target_flat(cand) - log_target_flat(x_flat)
                 + lq_cur - lq_cand)
    accept = jnp.log(jax.random.uniform(k_acc, (),
                                        x_flat.dtype)) < log_ratio
    return jnp.where(accept, cand, x_flat), accept


def tim_kernel(name: str, log_target: Callable[[Any, Any], jax.Array],
               example_value, df: float = 3.0, example_state=None):
    """Kernel updating state[name] by TIM. The mode/proposal are located
    ONCE, eagerly, at kernel-construction time against `example_state`
    (the reference re-runs mode finding per draw only when asked; the
    frozen-proposal form is its common usage). Eager construction keeps
    the Newton mode search out of any jitted scan body and guarantees the
    cached proposal is a concrete array, never a leaked tracer."""
    if example_state is None:
        example_state = {name: example_value}
    prop, unravel = build_tim_proposal(
        lambda v: log_target(v, example_state), example_value, df)
    # Materialize as host-side constants so the kernel closes over
    # concrete values even if built inside a transformed context.
    prop = jax.tree.map(jax.device_get, prop)

    def kernel(key, state):
        flat, _ = ravel_pytree(state[name])

        def lt_flat(z):
            return log_target(unravel(z), state)

        new_flat, _ = tim_step(key, flat, lt_flat, prop)
        out = dict(state)
        out[name] = unravel(new_flat)
        return out

    return kernel
