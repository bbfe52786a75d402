"""Device-mesh utilities for sharded MCMC."""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
try:
    from jax import shard_map as _jax_shard_map

    def shard_map(f, mesh, in_specs, out_specs, check_rep=False):
        return _jax_shard_map(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs, check_vma=check_rep)
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from boom_tpu.inference.driver import McmcResult, run_chain
from boom_tpu.inference.state import Kernel


def make_mesh(axis_sizes: dict[str, int] | None = None,
              devices=None) -> Mesh:
    """Build a Mesh. Default: 1-D 'chains' mesh over all devices."""
    devices = devices if devices is not None else jax.devices()
    if axis_sizes is None:
        axis_sizes = {"chains": len(devices)}
    names = tuple(axis_sizes)
    sizes = tuple(axis_sizes.values())
    import numpy as np

    arr = np.asarray(devices[: int(np.prod(sizes))]).reshape(sizes)
    return Mesh(arr, names)


def shard_chains(states, mesh: Mesh, axis: str = "chains"):
    """Place a [num_chains, ...] pytree with the chain axis sharded."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, sharding), states)


def run_mcmc_sharded(
    key: jax.Array,
    kernel: Kernel,
    init_states,
    num_draws: int,
    mesh: Mesh,
    *,
    chain_axis: str = "chains",
    burn: int = 0,
    thin: int = 1,
    extract: Callable[[Any], Any] | None = None,
    local_axis_name: str | None = None,
) -> McmcResult:
    """Like inference.run_mcmc but with the chain axis sharded over the
    mesh: each device runs its own vmapped block of chains (chain
    parallelism — SURVEY.md §2.8). Collective-free per step; diagnostics
    gather across devices afterwards.

    local_axis_name: bind the per-device chain vmap to a named axis.
    A kernel built with ``pool_axis=(chain_axis, local_axis_name)``
    then pools adaptation statistics over EVERY chain — pmean over the
    local vmap lanes composes with the cross-device mesh collective
    (cross-chain pooled warmup, SURVEY §7 phase 8)."""
    leaf = jax.tree_util.tree_leaves(init_states)[0]
    num_chains = leaf.shape[0]
    chain_keys = jax.random.split(key, num_chains)

    spec = P(chain_axis)

    def block(keys, states):
        def one(k, s):
            return run_chain(k, kernel, s, num_draws, burn=burn, thin=thin,
                             extract=extract)

        return jax.vmap(one, axis_name=local_axis_name)(keys, states)

    sharded = shard_map(
        block, mesh=mesh,
        in_specs=(spec, jax.tree_util.tree_map(lambda _: spec, init_states)),
        out_specs=spec,
        check_rep=False,
    )
    init_states = shard_chains(init_states, mesh, chain_axis)
    chain_keys = shard_chains(chain_keys, mesh, chain_axis)
    draws, final_state = jax.jit(sharded)(chain_keys, init_states)
    return McmcResult(draws=draws, final_state=final_state)


def data_parallel_suf(make_suf: Callable, x, y, mesh: Mesh,
                      data_axis: str = "data"):
    """Compute sufficient statistics with observations sharded over the
    'data' mesh axis and combined by psum — the combine_data contract
    (reference ModelTypes.hpp:89) as an all-reduce.

    make_suf(x_shard, y_shard) must return a pytree of sums (e.g.
    RegSuf.from_data)."""
    spec_in = P(data_axis)

    def local(xs, ys):
        suf = make_suf(xs, ys)
        return jax.tree_util.tree_map(
            lambda s: jax.lax.psum(s, data_axis), suf)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(spec_in, spec_in),
        out_specs=jax.tree_util.tree_map(lambda _: P(), make_suf(x[:1], y[:1])),
        check_rep=False,
    )
    return jax.jit(fn)(x, y)
