"""Checkpoint / resume for MCMC runs.

Reference: the three reference mechanisms (SURVEY.md §5): RListIoManager
write-then-stream (Interfaces/R/list_io.hpp:54-80), ParamFileIoManager
flat files (cpputil/ParamFileIoManager.hpp:35), and python pickling
(Bsts.__getstate__, bsts.py:1155). Here: one atomic .npz of the full
chain-state pytree (params + kernel state + rng key), so a run resumes
exactly; draw streams go through boom_tpu.runtime's native async draw
log. The partial-result semantics (the reference's `ngood` annotation on
timeout/interrupt, bsts.cc:108-117) are preserved by checkpointing every
k iterations via `checkpointed_run`.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np


def save_checkpoint(path: str, state: Any, key=None, meta: dict | None = None):
    """Atomically write (state pytree, rng key, metadata) to path.npz."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    payload = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    if key is not None:
        payload["_rng_key"] = np.asarray(jax.random.key_data(key))
    payload["_meta"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8)
    payload["_treedef"] = np.frombuffer(
        str(treedef).encode(), dtype=np.uint8)
    dirname = os.path.dirname(os.path.abspath(path))
    fd, tmp = tempfile.mkstemp(dir=dirname, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **payload)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_checkpoint(path: str, example_state: Any):
    """Load (state, key, meta); example_state supplies the treedef."""
    data = np.load(path)
    _, treedef = jax.tree_util.tree_flatten(example_state)
    n = treedef.num_leaves
    leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(n)]
    state = jax.tree_util.tree_unflatten(treedef, leaves)
    key = None
    if "_rng_key" in data:
        key = jax.random.wrap_key_data(jnp.asarray(data["_rng_key"]))
    meta = json.loads(bytes(data["_meta"]).decode())
    return state, key, meta


def checkpointed_run(
    key: jax.Array,
    kernel: Callable,
    state: Any,
    num_iters: int,
    checkpoint_every: int,
    path: str,
    extract: Callable[[Any], Any] | None = None,
    draw_log=None,
):
    """Run kernel for num_iters, checkpointing every checkpoint_every
    sweeps (the ngood/partial-result contract: a crash resumes from the
    last checkpoint with `resume_run`). Inner blocks are jitted scans;
    only checkpoint boundaries touch the host. Returns (state, draws)
    where draws stacks extract(state) per iteration."""
    extract = extract or (lambda s: s)

    @jax.jit
    def block(state, keys):
        def step(s, k):
            s = kernel(k, s)
            return s, extract(s)

        return jax.lax.scan(step, state, keys)

    draws = []
    done = 0
    while done < num_iters:
        n = min(checkpoint_every, num_iters - done)
        key, sub = jax.random.split(key)
        state, block_draws = block(state, jax.random.split(sub, n))
        jax.block_until_ready(state)
        done += n
        save_checkpoint(path, state, key=key,
                        meta={"iterations_done": done})
        if draw_log is not None:
            draw_log.append_batch(block_draws, n)
        draws.append(block_draws)
    stacked = jax.tree_util.tree_map(
        lambda *a: jnp.concatenate(a, axis=0), *draws)
    return state, stacked


def resume_run(path: str, example_state, kernel, num_iters: int,
               checkpoint_every: int, **kw):
    """Continue a checkpointed run from its last saved state."""
    state, key, meta = load_checkpoint(path, example_state)
    remaining = num_iters - meta.get("iterations_done", 0)
    if remaining <= 0:
        return state, None
    return checkpointed_run(key, kernel, state, remaining,
                            checkpoint_every, path, **kw)
