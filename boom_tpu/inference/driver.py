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
    # valid-draw count for interrupted chunked runs (reference `ngood`,
    # bsts.cc:108-117); None = all draws valid
    ngood: int | None = None

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
    axis_name: str | None = None,
) -> McmcResult:
    """Run ``num_chains`` independent chains of ``kernel``.

    init_states: a pytree whose leaves have leading dim [num_chains]
      (per-chain initial states — overdispersed starts are the caller's
      choice), or a callable ``(chain_key) -> state`` used to build them.

    The chain axis is a ``vmap`` — on a sharded mesh the same axis is
    sharded by ``parallel.shard_chains`` (chain parallelism; the capability
    BOOM leaves to R users running mclapply, SURVEY.md §2.8).

    axis_name: bind the chain vmap to a named axis so kernels can use
    cross-chain collectives (``jax.lax.pmean``) — e.g. pooled warmup
    adaptation via ``hmc_kernel(pool_axis=axis_name)``.
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

    fn = jax.vmap(one, axis_name=axis_name)
    if jit:
        fn = jax.jit(fn)
    draws, final_state = fn(chain_keys, init_states)
    return McmcResult(draws=draws, final_state=final_state)


def run_mcmc_chunked(
    key: jax.Array,
    kernel: Kernel,
    init_states,
    num_draws: int,
    *,
    num_chains: int | None = None,
    burn: int = 0,
    thin: int = 1,
    chunk_size: int = 50,
    extract: Callable[[Any], Any] | None = None,
    ping: int | None = None,
    checkpoint_path: str | None = None,
    checkpoint_every: int | None = None,
    timeout_seconds: float | None = None,
) -> McmcResult:
    """Chunked multi-chain driver with the reference's long-run
    ergonomics (Interfaces/R/bsts/src/bsts.cc:83-117): the jitted scan
    is split into chunks so that between device launches the host can

      * print progress (cpputil/ProgressTracker.hpp:27 / the bsts
        `ping` argument),
      * checkpoint (params, kernel state, keys) every k chunks,
      * stop on Ctrl-C or a wall-clock timeout and RETURN THE DRAWS
        COLLECTED SO FAR — the reference's partial-result contract,
        where an interrupted run comes back annotated with `ngood`
        (bsts.cc:96-117). `result.ngood` holds the number of valid
        draws per chain; trailing rows beyond ngood are zeros.

    Each chunk is one jitted program (compiled once, reused), so the
    steady-state throughput matches run_mcmc up to one host round-trip
    per chunk.
    """
    import time as _time

    import numpy as np

    from boom_tpu.utils.progress import ProgressTracker

    if callable(init_states):
        assert num_chains is not None, "num_chains required with init fn"
        init_keys = jax.random.split(jax.random.fold_in(key, 7), num_chains)
        init_states = jax.vmap(init_states)(init_keys)
    else:
        leaf = jax.tree_util.tree_leaves(init_states)[0]
        num_chains = leaf.shape[0]
    extract = extract or (lambda s: s)

    @jax.jit
    def burn_chunk(keys, states):
        def one(k, s):
            def body(st, kk):
                return kernel(kk, st), None

            s, _ = jax.lax.scan(body, s, jax.random.split(k, chunk_size))
            return s

        return jax.vmap(one)(keys, states)

    from functools import partial

    @partial(jax.jit, static_argnames=("n_keep",))
    def draw_chunk(keys, states, n_keep):
        def one(k, s):
            def body(st, kk):
                keys_t = jax.random.split(kk, thin)

                def inner(st2, k3):
                    return kernel(k3, st2), None

                st, _ = jax.lax.scan(inner, st, keys_t)
                return st, extract(st)

            return jax.lax.scan(body, s, jax.random.split(k, n_keep))

        return jax.vmap(one)(keys, states)

    tracker = (ProgressTracker(burn + num_draws * thin, ping=ping)
               if ping else None)
    start = _time.monotonic()
    state = init_states
    it = 0

    def expired():
        return (timeout_seconds is not None
                and _time.monotonic() - start > timeout_seconds)

    chunks: list = []
    ngood = 0
    try:
        n_burn_chunks = -(-burn // chunk_size) if burn else 0
        for c in range(n_burn_chunks):
            ck = jax.random.split(jax.random.fold_in(key, 1000 + c),
                                  num_chains)
            state = burn_chunk(ck, state)
            jax.block_until_ready(state)
            it += chunk_size
            if tracker:
                tracker.update(it)
            if expired():
                raise TimeoutError
        done = 0
        c = 0
        while done < num_draws:
            take = min(chunk_size, num_draws - done)
            ck = jax.random.split(jax.random.fold_in(key, 2000 + c),
                                  num_chains)
            # jit caches per static n_keep; only the last chunk differs
            state, out = draw_chunk(ck, state, take)
            jax.block_until_ready(out)
            chunks.append(out)
            done += take
            ngood = done
            it += take * thin
            c += 1
            if tracker:
                tracker.update(it)
            if checkpoint_path and checkpoint_every and \
                    c % checkpoint_every == 0:
                from boom_tpu.inference.checkpoint import save_checkpoint

                save_checkpoint(checkpoint_path, state,
                                meta={"draws_done": done})
            if expired():
                raise TimeoutError
    except (KeyboardInterrupt, TimeoutError):
        pass  # partial-result return below (reference ngood semantics)

    if chunks:
        draws = jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=1), *chunks)
    else:
        draws = None
    if ngood < num_draws and draws is not None:
        # pad to the requested length with zeros so downstream shapes
        # are stable; ngood marks the valid prefix
        pad = num_draws - ngood
        draws = jax.tree_util.tree_map(
            lambda a: jnp.concatenate(
                [a, jnp.zeros((a.shape[0], pad) + a.shape[2:],
                              a.dtype)], axis=1), draws)
    return McmcResult(draws=draws, final_state=state, ngood=ngood)
