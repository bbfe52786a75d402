"""Design-matrix encoders and a light data-frame container.

Reference: stats/Encoders.hpp:35 (DataEncoder, MainEffectEncoder,
EffectsEncoder:133, IdentityEncoder, InteractionEncoder,
DatasetEncoder), stats/Design.hpp (design-matrix machinery), and
stats/DataTable.hpp:407 (the R-data-frame analog used by every
interface).

TPU form: encoders are pure functions from integer-coded categorical
columns / numeric columns to dense design blocks; a DataTable is a dict
of named numpy/JAX columns with dtype tags, and `build_design` maps a
formula-lite spec (list of terms) to the stacked design matrix.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def dummy_encode(codes, num_levels: int, drop_first: bool = True):
    """Treatment/dummy coding [n, L-1] (reference MainEffectEncoder with
    baseline omitted)."""
    onehot = jax.nn.one_hot(jnp.asarray(codes), num_levels)
    return onehot[:, 1:] if drop_first else onehot


def effects_encode(codes, num_levels: int):
    """Sum-to-zero effects coding [n, L-1] (reference
    EffectsEncoder:133): level j -> e_j for j < L-1, last level -> -1."""
    codes = jnp.asarray(codes)
    onehot = jax.nn.one_hot(codes, num_levels)[:, :-1]
    is_last = (codes == num_levels - 1)[:, None]
    return jnp.where(is_last, -1.0, onehot)


def interaction_encode(block_a, block_b):
    """All pairwise products [n, pa*pb] (reference InteractionEncoder)."""
    return (block_a[:, :, None] * block_b[:, None, :]).reshape(
        block_a.shape[0], -1)


@dataclasses.dataclass
class DataTable:
    """Named columns: numeric (float arrays) or categorical (integer
    codes + level names). Reference stats/DataTable.hpp:407."""

    columns: dict
    levels: dict  # name -> tuple of level labels (categorical only)

    @staticmethod
    def from_dict(data):
        """data: {name: array-like}; object/str columns become
        categoricals (codes + levels), numerics become float columns."""
        columns, levels = {}, {}
        for name, col in data.items():
            arr = np.asarray(col)
            if arr.dtype.kind in "OUS" or arr.dtype == bool:
                labs, codes = np.unique(arr, return_inverse=True)
                columns[name] = jnp.asarray(codes, jnp.int32)
                levels[name] = tuple(labs.tolist())
            else:
                columns[name] = jnp.asarray(arr, jnp.result_type(float))
        return DataTable(columns=columns, levels=levels)

    def is_categorical(self, name):
        return name in self.levels

    def nlevels(self, name):
        return len(self.levels[name])

    @property
    def nrow(self):
        return jax.tree_util.tree_leaves(self.columns)[0].shape[0]


def build_design(table: DataTable, terms: Sequence, intercept: bool = True,
                 encoding: str = "dummy"):
    """Build a design matrix from terms (reference DatasetEncoder /
    Design.hpp; the formula-parsing analog of parse_model_formula).

    terms: list of column names or tuples of names (interactions),
    e.g. ["x1", "group", ("x1", "group")].
    Returns (matrix [n, p], column names)."""
    enc = {"dummy": dummy_encode, "effects": effects_encode}[encoding]

    def block(name):
        col = table.columns[name]
        if table.is_categorical(name):
            if encoding == "dummy":
                b = dummy_encode(col, table.nlevels(name))
                names = [f"{name}={lv}" for lv in
                         table.levels[name][1:]]
            else:
                b = effects_encode(col, table.nlevels(name))
                names = [f"{name}.eff{j}" for j in
                         range(table.nlevels(name) - 1)]
            return b, names
        return col[:, None], [name]

    blocks, names = [], []
    if intercept:
        blocks.append(jnp.ones((table.nrow, 1)))
        names.append("(Intercept)")
    for term in terms:
        if isinstance(term, tuple):
            b1, n1 = block(term[0])
            b2, n2 = block(term[1])
            blocks.append(interaction_encode(b1, b2))
            names.extend(f"{a}:{b}" for a in n1 for b in n2)
        else:
            b, n = block(term)
            blocks.append(b)
            names.extend(n)
    return jnp.concatenate(blocks, axis=1), names
