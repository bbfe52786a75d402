"""Multi-chain MCMC driver: vmap over chains, scan over iterations.

Replaces the reference's host-side MCMC loop (Interfaces/R/bsts/src/
bsts.cc:83-117: `for i < niter: model->sample_posterior(); io_manager.write()`)
and the RListIoManager draw storage (Interfaces/R/list_io.hpp:54-80). The
entire loop — warmup, thinning, draw recording — compiles into one XLA
program; draws land in preallocated device arrays (the io_manager analog)
with zero host crossings until the user asks for results.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

from boom_tpu.inference.state import Kernel


@dataclasses.dataclass
class McmcResult:
    """Posterior draws plus bookkeeping.

    draws: pytree of arrays with leading dims [num_chains, num_draws, ...]
           (the RListIoManager analog, already chain-major for diagnostics).
    final_state: pytree with leading dim [num_chains] — resume checkpoint.
    """

    draws: Any
    final_state: Any

    def stacked(self):
        """Draws flattened over chains: [num_chains*num_draws, ...]."""
        return jax.tree_util.tree_map(
            lambda a: a.reshape((-1,) + a.shape[2:]), self.draws)


def run_chain(
    key: jax.Array,
    kernel: Kernel,
    init_state,
    num_draws: int,
    *,
    burn: int = 0,
    thin: int = 1,
    extract: Callable[[Any], Any] | None = None,
):
    """One chain: scan the kernel, record ``extract(state)`` per kept draw."""
    extract = extract or (lambda s: s)

    def one_step(state, k):
        return kernel(k, state), None

    def kept_step(state, k):
        keys = jax.random.split(k, thin)

        def body(s, kk):
            return kernel(kk, s), None

        state, _ = jax.lax.scan(body, state, keys)
        return state, extract(state)

    if burn > 0:
        burn_keys = jax.random.split(jax.random.fold_in(key, 0), burn)
        init_state, _ = jax.lax.scan(one_step, init_state, burn_keys)

    draw_keys = jax.random.split(jax.random.fold_in(key, 1), num_draws)
    final_state, draws = jax.lax.scan(kept_step, init_state, draw_keys)
    return draws, final_state


def run_mcmc(
    key: jax.Array,
    kernel: Kernel,
    init_states,
    num_draws: int,
    *,
    num_chains: int | None = None,
    burn: int = 0,
    thin: int = 1,
    extract: Callable[[Any], Any] | None = None,
    jit: bool = True,
) -> McmcResult:
    """Run ``num_chains`` independent chains of ``kernel``.

    init_states: a pytree whose leaves have leading dim [num_chains]
      (per-chain initial states — overdispersed starts are the caller's
      choice), or a callable ``(chain_key) -> state`` used to build them.

    The chain axis is a ``vmap`` — on a sharded mesh the same axis is
    sharded by ``parallel.shard_chains`` (chain parallelism; the capability
    BOOM leaves to R users running mclapply, SURVEY.md §2.8).
    """
    if callable(init_states):
        assert num_chains is not None, "num_chains required with init fn"
        init_keys = jax.random.split(jax.random.fold_in(key, 7), num_chains)
        init_states = jax.vmap(init_states)(init_keys)
    else:
        leaf = jax.tree_util.tree_leaves(init_states)[0]
        num_chains = leaf.shape[0]

    chain_keys = jax.random.split(key, num_chains)

    def one(k, s):
        return run_chain(k, kernel, s, num_draws, burn=burn, thin=thin,
                         extract=extract)

    fn = jax.vmap(one)
    if jit:
        fn = jax.jit(fn)
    draws, final_state = fn(chain_keys, init_states)
    return McmcResult(draws=draws, final_state=final_state)
