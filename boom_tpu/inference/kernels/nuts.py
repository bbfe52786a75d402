"""No-U-Turn Sampler (iterative, multinomial) — TPU-native fixed-shape form.

BOOM has no HMC/NUTS (its gradient-free default is slice sampling;
Samplers/ScalarLangevinSampler.hpp:30 is MALA); NUTS is a required new
backend per SURVEY.md §7 phase 4. This is the iterative formulation
(bounded tree depth, no recursion): the trajectory is built by doublings
under a `lax.while_loop`, each subtree by a bounded inner loop, with
U-turn checks against O(max_depth) checkpointed states — the standard
trick for accelerator NUTS, compatible with jit/vmap (fixed shapes, no
data-dependent Python control flow).

Multinomial leaf selection (progressive within subtree, weight-proportional
across doublings), endpoint U-turn criterion with the mass-metric inner
product, divergence cutoff at delta-energy 1000. Reuses the dual-averaging
step-size and Welford mass adaptation from hmc.py.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from boom_tpu.inference.kernels.hmc import (
    HmcState,
    dual_averaging_update,
    hmc_init,
    welford_update,
)

__all__ = ["nuts_step", "nuts_kernel", "hmc_init"]

_DIVERGENCE = 1000.0


def _tz_slot(x, cap):
    """Number of trailing zeros of x (= cap when x == 0), clipped to cap."""
    low = x & -x  # lowest set bit (0 if x == 0)
    tz = jax.lax.population_count(low - 1)  # popcount of trailing-ones mask
    return jnp.minimum(tz, cap)


def nuts_step(
    key: jax.Array,
    position,
    hmc_state: HmcState,
    log_target: Callable[[Any], jax.Array],
    max_depth: int = 8,
):
    """One NUTS transition. Returns (new_position, accept_stat, new_logp).

    accept_stat is the mean Metropolis acceptance statistic over visited
    leaves (the dual-averaging signal of Hoffman & Gelman 2014)."""
    flat0, unravel = ravel_pytree(position)
    inv_mass, _ = ravel_pytree(hmc_state.inv_mass)
    eps = hmc_state.step_size
    dim = flat0.shape[0]
    dtype = flat0.dtype
    cap = max_depth - 1

    def logp_flat(zf):
        return log_target(unravel(zf))

    lp_grad = jax.value_and_grad(logp_flat)

    def kinetic(r):
        return 0.5 * jnp.sum(r * r * inv_mass)

    def leapfrog1(z, r, g):
        r_half = r + 0.5 * eps * g
        z_new = z + eps * inv_mass * r_half
        lp, g_new = lp_grad(z_new)
        r_new = r_half + 0.5 * eps * g_new
        return z_new, r_new, g_new, lp

    def turning(z_lo, r_lo, z_hi, r_hi):
        dz = z_hi - z_lo
        return ((dz @ (inv_mass * r_lo) < 0.0)
                | (dz @ (inv_mass * r_hi) < 0.0))

    k_mom, k_loop = jax.random.split(key)
    lp0, g0 = lp_grad(flat0)
    r0 = jax.random.normal(k_mom, (dim,), dtype) / jnp.sqrt(inv_mass)
    h0 = -lp0 + kinetic(r0)

    def build_subtree(key, z0, r0_, g0_, n_leaves):
        """Forward-integrate n_leaves steps with internal U-turn checks.

        Returns (z_end, r_end, g_end, lse weight, proposal, proposal_lp,
        turned, diverged, acc_sum, n_visited)."""
        ckpt_z = jnp.zeros((max_depth, dim), dtype)
        ckpt_r = jnp.zeros((max_depth, dim), dtype)

        def cond(c):
            i = c[0]
            return (i < n_leaves) & ~c[8] & ~c[9]

        def body(c):
            (i, z, r, g, cz, cr, lse, zp, turned, diverged, k, acc, lp_p) = c
            k, k_sel = jax.random.split(k)
            z, r, g, lp = leapfrog1(z, r, g)
            energy = -lp + kinetic(r)
            delta = energy - h0
            diverged = delta > _DIVERGENCE
            lw = jnp.where(diverged, -jnp.inf, -delta)  # log w rel. exp(-h0)
            acc = acc + jnp.minimum(1.0, jnp.exp(-delta))
            # progressive multinomial proposal within the subtree
            lse_new = jnp.logaddexp(lse, lw)
            take = (jnp.log(jax.random.uniform(k_sel, (), dtype))
                    < lw - lse_new)
            zp = jnp.where(take, z, zp)
            lp_p = jnp.where(take, lp, lp_p)
            # store checkpoint when leaf i starts a subtree (i even or 0)
            slot = _tz_slot(i, cap)
            store = (i % 2 == 0)
            cz = jnp.where(store, cz.at[slot].set(z), cz)
            cr = jnp.where(store, cr.at[slot].set(r), cr)
            # U-turn checks for every aligned subtree ending at leaf i
            def check(k_lvl, t):
                size = 1 << k_lvl
                complete = (i & (size - 1)) == (size - 1)
                a = i - size + 1
                s = _tz_slot(a, cap)
                t_k = turning(cz[s], cr[s], z, r)
                return t | (complete & t_k)

            turned = jax.lax.fori_loop(1, max_depth + 1, check,
                                       jnp.asarray(False))
            return (i + 1, z, r, g, cz, cr, lse_new, zp, turned, diverged,
                    k, acc, lp_p)

        init = (jnp.asarray(0), z0, r0_, g0_, ckpt_z, ckpt_r,
                jnp.asarray(-jnp.inf, dtype), z0, jnp.asarray(False),
                jnp.asarray(False), key, jnp.asarray(0.0, dtype),
                jnp.asarray(0.0, dtype))
        (i, z, r, g, _, _, lse, zp, turned, diverged, _, acc, lp_p) = (
            jax.lax.while_loop(cond, body, init))
        return z, r, g, lse, zp, lp_p, turned, diverged, acc, i

    # outer doubling loop
    def cond(c):
        return (c["depth"] < max_depth) & ~c["turned"] & ~c["diverged"]

    def body(c):
        k, k_dir, k_sub, k_merge = jax.random.split(c["key"], 4)
        go_right = jax.random.bernoulli(k_dir)
        n_leaves = 1 << c["depth"]  # 2^depth (traced ok: depth is dynamic?)
        # depth is a traced int; 1 << traced works via lax shift
        z0 = jnp.where(go_right, c["z_hi"], c["z_lo"])
        r0_ = jnp.where(go_right, c["r_hi"], -c["r_lo"])
        g0_ = jnp.where(go_right, c["g_hi"], c["g_lo"])
        (z_e, r_e, g_e, lse_sub, zp_sub, lp_sub, turned_sub, diverged,
         acc, n_vis) = build_subtree(k_sub, z0, r0_, g0_, n_leaves)

        ok = ~turned_sub & ~diverged
        # merge proposal with prob w_sub / (w_tot + w_sub)
        lse_new = jnp.logaddexp(c["lse"], lse_sub)
        take = ok & (jnp.log(jax.random.uniform(k_merge, (), dtype))
                     < lse_sub - lse_new)
        z_prop = jnp.where(take, zp_sub, c["z_prop"])
        lp_prop = jnp.where(take, lp_sub, c["lp_prop"])
        lse = jnp.where(ok, lse_new, c["lse"])

        # extend edges (only when subtree valid)
        upd = lambda new, old: jnp.where(ok, new, old)
        z_hi = upd(jnp.where(go_right, z_e, c["z_hi"]), c["z_hi"])
        r_hi = upd(jnp.where(go_right, r_e, c["r_hi"]), c["r_hi"])
        g_hi = upd(jnp.where(go_right, g_e, c["g_hi"]), c["g_hi"])
        z_lo = upd(jnp.where(go_right, c["z_lo"], z_e), c["z_lo"])
        r_lo = upd(jnp.where(go_right, c["r_lo"], -r_e), c["r_lo"])
        g_lo = upd(jnp.where(go_right, c["g_lo"], g_e), c["g_lo"])

        turned_full = turning(z_lo, r_lo, z_hi, r_hi)
        return {
            "key": k, "depth": c["depth"] + 1,
            "z_lo": z_lo, "r_lo": r_lo, "g_lo": g_lo,
            "z_hi": z_hi, "r_hi": r_hi, "g_hi": g_hi,
            "z_prop": z_prop, "lp_prop": lp_prop, "lse": lse,
            "turned": turned_sub | (ok & turned_full),
            "diverged": diverged,
            "acc_sum": c["acc_sum"] + acc,
            "n_vis": c["n_vis"] + n_vis,
        }

    init = {
        "key": k_loop, "depth": jnp.asarray(0),
        "z_lo": flat0, "r_lo": r0, "g_lo": g0,
        "z_hi": flat0, "r_hi": r0, "g_hi": g0,
        "z_prop": flat0, "lp_prop": lp0,
        "lse": jnp.asarray(0.0, dtype),  # initial leaf weight exp(0)
        "turned": jnp.asarray(False), "diverged": jnp.asarray(False),
        "acc_sum": jnp.asarray(0.0, dtype), "n_vis": jnp.asarray(0),
    }
    out = jax.lax.while_loop(cond, body, init)
    accept_stat = out["acc_sum"] / jnp.maximum(
        jnp.asarray(out["n_vis"], dtype), 1.0)
    return unravel(out["z_prop"]), accept_stat, out["lp_prop"]


def nuts_kernel(
    name: str,
    log_target: Callable[[Any, Any], jax.Array],
    max_depth: int = 8,
    hmc_field: str = "_hmc",
    adapt_field: str | None = "_adapting",
    target_accept: float = 0.8,
    pool_axis: str | tuple | None = None,
):
    """Kernel updating state[name] by NUTS; ``log_target(value, state)``.

    Same adaptation contract as hmc_kernel: while state[adapt_field] is
    truthy, dual-averaging step size + Welford mass accumulation run;
    freeze with hmc.finalize_adaptation between warmup and sampling."""

    def kernel(key, state):
        hs: HmcState = state[hmc_field]
        pos = state[name]
        new_pos, accept_stat, _ = nuts_step(
            key, pos, hs, lambda v: log_target(v, state), max_depth)
        if pool_axis is not None:
            # cross-chain pooled dual averaging (see hmc_kernel)
            accept_stat = jax.lax.pmean(accept_stat, pool_axis)
        if adapt_field and adapt_field in state:
            adapting = state[adapt_field]

            def do_adapt(h):
                h = dual_averaging_update(h, accept_stat, target_accept)
                return welford_update(h, new_pos)

            hs = jax.lax.cond(
                jnp.asarray(adapting, bool), do_adapt, lambda h: h, hs)
        out = dict(state)
        out[name] = new_pos
        out[hmc_field] = hs
        return out

    return kernel
