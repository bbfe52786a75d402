"""Cross-device TIME-axis sharding of the Kalman filter/smoother.

SURVEY §2.8's sequence-parallelism row: for very long series, the time
axis itself is sharded over the mesh. The single-chip associative-scan
filter (statespace/parallel_kalman.py, Särkkä & García-Fernández 2020)
already expresses the recursion as an associative combine; here the scan
becomes the classic three-phase BLOCK scan over devices:

  1. each device builds its local elements and runs a LOCAL
     associative scan over its T/n_block slice (no communication);
  2. the per-block totals (one element each, [d, d]-sized) are
     all-gathered — the only data that crosses the ICI;
  3. each device combines the exclusive prefix of the earlier blocks'
     totals into its local scanned elements.

Communication is O(n_blocks * d^2) regardless of T, so a series too
long for one device's HBM filters at full speed. The smoother runs the
same pattern in reverse (suffix scan). Both reproduce the single-device
results to float tolerance (tests/test_time_sharded.py).

Reference: BOOM's Kalman filter (Models/StateSpace/Filters/) is a
strictly sequential C++ loop; there is no multi-device analog to cite.
Time-invariant Z/H/Q (the bsts steady case) is assumed here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from boom_tpu.parallel.mesh import shard_map
from boom_tpu.statespace.kalman import SsmParams
from boom_tpu.statespace.parallel_kalman import (
    FilterElement,
    SmoothElement,
    _combine_filter,
    _combine_smooth,
    _first_element,
    _generic_filter_elements,
    _hp,
    _smooth_elements,
)


def _identity_filter_element(d, dtype):
    """Neutral element of _combine_filter: (A=I, b=0, C=0, eta=0, J=0)."""
    return FilterElement(
        a=jnp.eye(d, dtype=dtype), b=jnp.zeros((d,), dtype),
        c=jnp.zeros((d, d), dtype), eta=jnp.zeros((d,), dtype),
        j=jnp.zeros((d, d), dtype))


def _exclusive_prefix(combine, totals, identity):
    """Sequential exclusive prefix over the tiny [n_blocks] axis of
    gathered block totals (n_blocks = device count, so this loop is
    negligible): out[i] = combine(totals[0], ..., totals[i-1])."""

    def body(carry, elem):
        new = combine(carry, elem)
        return new, carry

    _, prefixes = jax.lax.scan(body, identity, totals)
    return prefixes


@_hp
def sharded_filter_moments(params: SsmParams, y, observed, mesh: Mesh,
                           time_axis: str = "time"):
    """Filtered means/covs with y sharded over ``mesh[time_axis]``.

    y, observed: [T] with T divisible by the mesh axis size. Returns
    (m [T, d], P [T, d, d]) sharded the same way — exactly equal to
    parallel_filter_moments on one device."""
    y = jnp.asarray(y)
    if observed is None:
        observed = jnp.ones(y.shape, bool)
    d = params.z.shape[0]
    dtype = params.z.dtype

    def local(y_blk, obs_blk):
        idx = jax.lax.axis_index(time_axis)
        elems = _generic_filter_elements(params, y_blk, obs_blk)
        first = _first_element(params, y_blk[0], obs_blk[0])
        # only the globally-first block conditions on the prior
        is0 = idx == 0
        elems = FilterElement(*(
            arr.at[0].set(jnp.where(is0, f, arr[0]))
            for arr, f in zip(elems, first)))
        scanned = jax.lax.associative_scan(_combine_filter, elems)
        total = jax.tree_util.tree_map(lambda x: x[-1], scanned)
        gathered = jax.tree_util.tree_map(
            lambda x: jax.lax.all_gather(x, time_axis), total)
        prefixes = _exclusive_prefix(
            _combine_filter, gathered,
            _identity_filter_element(d, dtype))
        mine = jax.tree_util.tree_map(lambda x: x[idx], prefixes)
        mine_b = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, scanned[0].shape[:1]
                                       + x.shape), mine)
        out = _combine_filter(mine_b, scanned)
        return out.b, out.c

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(time_axis), P(time_axis)),
                   out_specs=(P(time_axis), P(time_axis)),
                   check_rep=False)
    return jax.jit(fn)(y, observed)


@_hp
def sharded_smooth_states(params: SsmParams, y, observed, mesh: Mesh,
                          time_axis: str = "time"):
    """Smoothed means E[alpha_t | y_{1:T}] with the time axis sharded:
    sharded filter followed by the suffix block-scan of RTS elements."""
    y = jnp.asarray(y)
    if observed is None:
        observed = jnp.ones(y.shape, bool)
    fm, fp = sharded_filter_moments(params, y, observed, mesh,
                                    time_axis)
    d = params.z.shape[0]
    dtype = params.z.dtype
    n_blocks = mesh.shape[time_axis]

    def local(fm_blk, fp_blk):
        idx = jax.lax.axis_index(time_axis)
        # RTS gain elements need (fm[k], fp[k]) for k < T-1 and the
        # identity-on-filtered-mean element at k = T-1. _smooth_elements
        # builds exactly that from a block; for non-last blocks the
        # "last element" it fabricates is wrong — replace it with the
        # true gain element computed from this block's last moment.
        e_all, g_all = _smooth_elements(params, fm_blk, fp_blk)
        f_mat, q = params.t_mat, params.rqr
        pred = f_mat @ fp_blk[-1] @ f_mat.T + q
        eps = 1e-12 if dtype == jnp.float64 else 1e-6
        pred = pred + eps * jnp.eye(d, dtype=dtype)
        g_mat = jnp.linalg.solve(pred, f_mat @ fp_blk[-1]).T
        e_last = g_mat
        g_last = fm_blk[-1] - g_mat @ (f_mat @ fm_blk[-1])
        is_last = idx == n_blocks - 1
        e_all = e_all.at[-1].set(jnp.where(is_last, e_all[-1], e_last))
        g_all = g_all.at[-1].set(jnp.where(is_last, g_all[-1], g_last))
        elems = SmoothElement(e=e_all, g=g_all)
        scanned = jax.lax.associative_scan(_combine_smooth, elems,
                                           reverse=True)
        # block total = suffix over the whole block = scanned[0]
        total = jax.tree_util.tree_map(lambda x: x[0], scanned)
        gathered = jax.tree_util.tree_map(
            lambda x: jax.lax.all_gather(x, time_axis), total)
        # exclusive SUFFIX of later blocks: reverse, prefix, un-reverse.
        # neutral element of _combine_smooth is (E=I, g=0)
        identity = SmoothElement(e=jnp.eye(d, dtype=dtype),
                                 g=jnp.zeros((d,), dtype))
        rev = jax.tree_util.tree_map(lambda x: x[::-1], gathered)

        def body(carry, elem):
            new = _combine_smooth(carry, elem)
            return new, carry

        _, suffixes_rev = jax.lax.scan(body, identity, rev)
        suffixes = jax.tree_util.tree_map(lambda x: x[::-1],
                                          suffixes_rev)
        mine = jax.tree_util.tree_map(lambda x: x[idx], suffixes)
        mine_b = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, scanned[0].shape[:1]
                                       + x.shape), mine)
        out = _combine_smooth(mine_b, scanned)
        return out.g

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(time_axis), P(time_axis)),
                   out_specs=P(time_axis), check_rep=False)
    return jax.jit(fn)(fm, fp)
