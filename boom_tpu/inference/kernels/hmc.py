"""Hamiltonian Monte Carlo with dual-averaging step-size adaptation and
diagonal mass-matrix estimation, plus MALA/Langevin kernels.

BOOM has no HMC/NUTS — only MALA-style Langevin samplers
(Samplers/ScalarLangevinSampler.hpp:30, UnivariateLangevinSampler). HMC/NUTS
is a required addition per SURVEY.md §2.4; gradients come free from jax.grad
on the same log-density used by every other kernel. Cross-chain adaptation
(averaging acceptance statistics over the vmapped chain axis) is the
TPU-native version of what serial implementations do per chain — see
`boom_tpu.parallel` for the sharded form.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

Flat = Any  # pytree of arrays


def _tree_dot(a, b):
    return sum(
        jnp.sum(x * y)
        for x, y in zip(jax.tree_util.tree_leaves(a),
                        jax.tree_util.tree_leaves(b)))


def _tree_axpy(alpha, x, y):
    return jax.tree_util.tree_map(lambda xi, yi: alpha * xi + yi, x, y)


class HmcState(NamedTuple):
    """Carried alongside the position inside the chain state."""

    step_size: jax.Array
    inv_mass: Flat  # diagonal inverse mass (pytree like position)
    # dual averaging accumulators (Hoffman & Gelman 2014, Nesterov)
    da_t: jax.Array
    da_h: jax.Array
    da_log_eps_bar: jax.Array
    mu: jax.Array
    # running moments for mass adaptation
    welford_n: jax.Array
    welford_mean: Flat
    welford_m2: Flat


def hmc_init(position, step_size=0.1):
    zeros = jax.tree_util.tree_map(jnp.zeros_like, position)
    ones = jax.tree_util.tree_map(jnp.ones_like, position)
    eps = jnp.asarray(step_size, jnp.result_type(float))
    return HmcState(
        step_size=eps,
        inv_mass=ones,
        da_t=jnp.zeros((), jnp.result_type(float)),
        da_h=jnp.zeros((), jnp.result_type(float)),
        da_log_eps_bar=jnp.zeros((), jnp.result_type(float)),
        mu=jnp.log(10.0 * eps),
        welford_n=jnp.zeros((), jnp.result_type(float)),
        welford_mean=zeros,
        welford_m2=zeros,
    )


def leapfrog(position, momentum, grad, log_target_grad, step_size, inv_mass,
             num_steps: int):
    """Standard leapfrog integrator on a pytree position."""

    def body(carry, _):
        q, p, g = carry
        p_half = _tree_axpy(0.5 * step_size, g, p)
        q_new = jax.tree_util.tree_map(
            lambda qi, pi, im: qi + step_size * im * pi, q, p_half, inv_mass)
        lp, g_new = log_target_grad(q_new)
        p_new = _tree_axpy(0.5 * step_size, g_new, p_half)
        return (q_new, p_new, g_new), lp

    (q, p, g), lps = jax.lax.scan(
        body, (position, momentum, grad), None, length=num_steps)
    return q, p, g, lps[-1]


def hmc_step(
    key: jax.Array,
    position,
    hmc_state: HmcState,
    log_target: Callable[[Any], jax.Array],
    num_steps: int = 16,
):
    """One HMC transition. Returns (position, accept_prob, new_logp)."""
    k_mom, k_acc = jax.random.split(key)

    def lp_grad(q):
        return jax.value_and_grad(log_target)(q)

    lp0, g0 = lp_grad(position)
    # momentum ~ N(0, M) with M = 1/inv_mass (diagonal)
    leaves, treedef = jax.tree_util.tree_flatten(position)
    mom_keys = list(jax.random.split(k_mom, len(leaves)))
    momentum = jax.tree_util.tree_unflatten(treedef, [
        jax.random.normal(k, l.shape, l.dtype) for k, l in zip(mom_keys, leaves)])
    momentum = jax.tree_util.tree_map(
        lambda m, im: m / jnp.sqrt(im), momentum, hmc_state.inv_mass)

    ke0 = 0.5 * _tree_dot(
        momentum, jax.tree_util.tree_map(
            lambda m, im: m * im, momentum, hmc_state.inv_mass))

    q, p, _, lp1 = leapfrog(position, momentum, g0, lp_grad,
                            hmc_state.step_size, hmc_state.inv_mass,
                            num_steps)
    ke1 = 0.5 * _tree_dot(
        p, jax.tree_util.tree_map(lambda m, im: m * im, p,
                                  hmc_state.inv_mass))
    log_ratio = (lp1 - ke1) - (lp0 - ke0)
    log_ratio = jnp.where(jnp.isfinite(log_ratio), log_ratio, -jnp.inf)
    accept_prob = jnp.minimum(1.0, jnp.exp(log_ratio))
    u = jax.random.uniform(k_acc, (), jnp.result_type(log_ratio))
    accept = jnp.log(u) < log_ratio

    new_pos = jax.tree_util.tree_map(
        lambda a, b: jnp.where(accept, a, b), q, position)
    return new_pos, accept_prob, jnp.where(accept, lp1, lp0)


def dual_averaging_update(hmc_state: HmcState, accept_prob,
                          target_accept=0.8, gamma=0.05, t0=10.0,
                          kappa=0.75):
    """Nesterov dual averaging on log step size (Hoffman-Gelman 2014)."""
    t = hmc_state.da_t + 1.0
    eta_h = 1.0 / (t + t0)
    h = (1.0 - eta_h) * hmc_state.da_h + eta_h * (target_accept - accept_prob)
    log_eps = hmc_state.mu - jnp.sqrt(t) / gamma * h
    eta_x = t ** (-kappa)
    log_eps_bar = eta_x * log_eps + (1.0 - eta_x) * hmc_state.da_log_eps_bar
    return hmc_state._replace(
        step_size=jnp.exp(log_eps),
        da_t=t,
        da_h=h,
        da_log_eps_bar=log_eps_bar,
    )


def welford_update(hmc_state: HmcState, position):
    """Accumulate running variance of the position for mass adaptation."""
    n = hmc_state.welford_n + 1.0
    delta = jax.tree_util.tree_map(
        lambda q, m: q - m, position, hmc_state.welford_mean)
    mean = jax.tree_util.tree_map(
        lambda m, d: m + d / n, hmc_state.welford_mean, delta)
    delta2 = jax.tree_util.tree_map(
        lambda q, m: q - m, position, mean)
    m2 = jax.tree_util.tree_map(
        lambda s, d, d2: s + d * d2, hmc_state.welford_m2, delta, delta2)
    return hmc_state._replace(welford_n=n, welford_mean=mean, welford_m2=m2)


def finalize_adaptation(hmc_state: HmcState, regularize=1e-3,
                        pool_axis: str | tuple | None = None):
    """Freeze step size at the dual-averaged value and set the diagonal
    inverse mass to the (regularized) sample variance.

    pool_axis: mesh/vmap axis name(s) to ``pmean`` the mass estimate
    over (cross-chain pooled warmup, SURVEY §7 phase 8) — each chain's
    Welford variance is averaged across the chain axis so every chain
    samples with the SAME pooled metric. Only valid inside a program
    that binds the axis (vmap(axis_name=...) / shard_map)."""
    n = jnp.maximum(hmc_state.welford_n - 1.0, 1.0)
    var = jax.tree_util.tree_map(
        lambda m2: (m2 / n) * (hmc_state.welford_n / (hmc_state.welford_n + 5.0))
        + regularize,
        hmc_state.welford_m2)
    log_eps = hmc_state.da_log_eps_bar
    if pool_axis is not None:
        var = jax.tree_util.tree_map(
            lambda v: jax.lax.pmean(v, pool_axis), var)
        log_eps = jax.lax.pmean(log_eps, pool_axis)
    return hmc_state._replace(
        step_size=jnp.exp(log_eps),
        inv_mass=var,
    )


def pool_hmc_states(hmc_states, regularize=1e-3):
    """Host-side pooled finalize for a CHAIN-BATCHED HmcState (leading
    axis = chains, as produced by run_mcmc's final_state): averages the
    Welford mass estimate and dual-averaged log step over chains and
    broadcasts the pooled values back to every chain. The out-of-program
    companion of ``finalize_adaptation(pool_axis=...)``."""
    frozen = jax.vmap(lambda h: finalize_adaptation(h, regularize))(
        hmc_states)

    def pooled(x):
        return jnp.broadcast_to(jnp.mean(x, axis=0, keepdims=True),
                                x.shape)

    return frozen._replace(
        step_size=pooled(frozen.step_size),
        inv_mass=jax.tree_util.tree_map(pooled, frozen.inv_mass),
    )


def hmc_kernel(
    name: str,
    log_target: Callable[[Any, Any], jax.Array],
    num_steps: int = 16,
    hmc_field: str = "_hmc",
    adapt_field: str | None = "_adapting",
    target_accept: float = 0.8,
    pool_axis: str | tuple | None = None,
):
    """Kernel updating state[name] by HMC; ``log_target(value, state)``.

    While ``state[adapt_field]`` is truthy the kernel adapts step size
    (dual averaging) and accumulates position moments; freeze with
    ``finalize_adaptation`` between warmup and sampling (the driver's burn
    phase can run an adapting kernel, then the caller swaps in the frozen
    kernel — or keep adapt_field False for fixed settings)."""

    def kernel(key, state):
        hs: HmcState = state[hmc_field]
        pos = state[name]
        new_pos, accept_prob, _ = hmc_step(
            key, pos, hs, lambda v: log_target(v, state), num_steps)
        if pool_axis is not None:
            # cross-chain pooled dual averaging (SURVEY §7 phase 8):
            # every chain adapts on the MEAN acceptance statistic, so
            # the shared step size converges at sqrt(num_chains) lower
            # noise and all chains stay in lockstep
            accept_prob = jax.lax.pmean(accept_prob, pool_axis)
        adapting = state.get(adapt_field, False) if adapt_field else False
        if adapt_field and adapt_field in state:
            def do_adapt(h):
                h = dual_averaging_update(h, accept_prob, target_accept)
                return welford_update(h, new_pos)

            hs = jax.lax.cond(
                jnp.asarray(adapting, bool), do_adapt, lambda h: h, hs)
        out = dict(state)
        out[name] = new_pos
        out[hmc_field] = hs
        return out

    return kernel


def mala_step(
    key: jax.Array,
    x,
    log_target: Callable[[Any], jax.Array],
    step_size=0.1,
):
    """Metropolis-adjusted Langevin (reference ScalarLangevinSampler.hpp:30
    generalized to pytrees): proposal N(x + eps^2/2 grad, eps^2)."""
    k_prop, k_acc = jax.random.split(key)
    lp_x, g_x = jax.value_and_grad(log_target)(x)
    leaves, treedef = jax.tree_util.tree_flatten(x)
    noise = jax.tree_util.tree_unflatten(treedef, [
        jax.random.normal(k, l.shape, l.dtype)
        for k, l in zip(jax.random.split(k_prop, len(leaves)), leaves)])
    half = 0.5 * step_size * step_size
    y = jax.tree_util.tree_map(
        lambda xi, gi, ni: xi + half * gi + step_size * ni, x, g_x, noise)
    lp_y, g_y = jax.value_and_grad(log_target)(y)

    def log_q(b, a, g_a):
        # log N(b; a + half*grad(a), eps^2) up to constants
        diff = jax.tree_util.tree_map(
            lambda bi, ai, gi: bi - ai - half * gi, b, a, g_a)
        return -_tree_dot(diff, diff) / (2.0 * step_size * step_size)

    log_ratio = lp_y - lp_x + log_q(x, y, g_y) - log_q(y, x, g_x)
    u = jax.random.uniform(k_acc, (), jnp.result_type(lp_x))
    accept = jnp.log(u) < log_ratio
    new_x = jax.tree_util.tree_map(
        lambda a, b: jnp.where(accept, a, b), y, x)
    return new_x, accept


def mala_kernel(name, log_target, step_size=0.1):
    def kernel(key, state):
        new_x, _ = mala_step(key, state[name],
                             lambda v: log_target(v, state), step_size)
        out = dict(state)
        out[name] = new_x
        return out

    return kernel
