"""Functional RNG key discipline.

The reference threads a stateful mt19937_64 ``RNG&`` through every sampler
(reference distributions/rng.hpp:28, GlobalRng singleton at :58). The
TPU-native equivalent threads explicit ``jax.random`` keys: every kernel takes
a key, splits what it needs, and returns nothing stateful. Thousands of vmapped
chains each get an independent key via ``split``/``fold_in``.
"""

from __future__ import annotations

import jax


def key(seed: int) -> jax.Array:
    """Make a root PRNG key from an integer seed (seed_rng_from_R analog)."""
    return jax.random.key(seed)


split = jax.random.split
fold_in = jax.random.fold_in


def split_like(k: jax.Array, tree):
    """Split ``k`` into one key per leaf of ``tree`` (same treedef)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    keys = jax.random.split(k, len(leaves))
    return jax.tree_util.tree_unflatten(treedef, list(keys))


def chain_keys(k: jax.Array, num_chains: int) -> jax.Array:
    """One independent key per chain, suitable for ``vmap``."""
    return jax.random.split(k, num_chains)
