"""SWEEP-operator fast path for the SSVS indicator sweep.

The naive indicator sweep costs one masked Cholesky (O(p^3), and
latency-heavy on TPU) per flip. This module maintains the swept form of the
augmented matrix

    S = sweep_g( [[Omega + XtX, Omega b + Xty],
                  [(Omega b + Xty)',  prior_ss + yty]] )

so that for the current inclusion set g:
    S[p, p]            = prior_ss + yty - pm_g' A_g^{-1} pm_g
    SS(g)              = S[p, p] + b_g' Omega_g b_g   (q-term kept as a
                         running scalar; zero for the default b = 0 prior)
    logdet A_g         = running sum of sweep pivots
and a parallel swept copy of Omega provides logdet Omega_g. A single flip
then needs only scalar reads to evaluate the Gibbs odds and — if taken —
two O(p^2) rank-1 sweeps, fully vectorized on the VPU. This is the
reference's own SWEEP idea (LinAlg/SWEEP.hpp; BregVsSampler recomputes
subset Cholesky factors instead, BregVsSampler.cpp:216) promoted to the
TPU hot path.

Exactness: identical target as regression.log_model_prob (tested against
the Cholesky path); numerical error accumulates over flips but the state
is rebuilt from scratch at every kernel sweep, bounding drift to one
sweep's worth of rank-1 updates.

Validity condition: the static border column uses the FULL Omega @ b, but
the slab prior conditions on the subset (pm_g must be Omega_{g,g} b_g +
Xty_g). The two agree iff every coordinate with a nonzero prior mean b_j
is always included (inclusion probability 1 — the standard forced-in
intercept case) or b = 0 (the default). ``valid_for_prior`` checks this;
SpikeSlabRegression falls back to the Cholesky path otherwise.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from boom_tpu.linalg.sweep import gated_flip_sweep as _gated_flip
from boom_tpu.models.glm.regression import RegSuf, SpikeSlabPrior

# Unroll factor for the coordinate scans (build / flip / mode-jump walk).
# MEASURED ON TPU (r5): unroll=4 REGRESSED the 1024-chain bench sweep
# 6.6 s -> 10.0 s — each unrolled iteration keeps another live copy of
# the [chains, p+1, p+1] sweep state (~10.6 MB at bench config), so
# unrolling trades loop overhead for HBM pressure and loses. Unlike the
# kalman time-axis scan (tiny [d, d] carry, unroll=8 wins), these
# scans carry the big matrix: keep unroll=1.
_SCAN_UNROLL = 1


def valid_for_prior(prior: SpikeSlabPrior) -> bool:
    """True if the SWEEP fast path is exact for this prior (see module
    docstring). Called at trace/build time on concrete prior arrays."""
    import numpy as np

    mean = np.asarray(prior.mean)
    forced = np.asarray(prior.log_inclusion_odds) >= 30.0  # pi ~= 1
    return bool(((mean == 0.0) | forced).all())


class SweepState(NamedTuple):
    s: jax.Array  # [p+1, p+1] augmented swept matrix
    o: jax.Array  # [p, p] swept prior precision
    logdet_a: jax.Array  # logdet (Omega+XtX)_g
    logdet_o: jax.Array  # logdet Omega_g
    q: jax.Array  # b_g' Omega_g b_g
    spike: jax.Array  # log spike prior of g
    mask: jax.Array  # [p] bool


def _augmented(suf: RegSuf, prior: SpikeSlabPrior):
    a = prior.unscaled_precision + suf.xtx
    pm = prior.unscaled_precision @ prior.mean + suf.xty
    c = prior.prior_ss + suf.yty
    top = jnp.concatenate([a, pm[:, None]], axis=1)
    bottom = jnp.concatenate([pm, jnp.asarray(c)[None]])[None, :]
    return jnp.concatenate([top, bottom], axis=0)


def build_sweep_state(suf: RegSuf, prior: SpikeSlabPrior, mask) -> SweepState:
    """Construct the swept state for an arbitrary mask by scanning sweeps
    (p sequential rank-1 updates, O(p^3) total — once per kernel sweep)."""
    p = mask.shape[-1]
    s0 = _augmented(suf, prior)
    o0 = prior.unscaled_precision
    dtype = s0.dtype

    def body(carry, j):
        s, o, ld_a, ld_o = carry
        incl = mask[j]
        piv_a = s[j, j]
        piv_o = o[j, j]
        # gate folded into the rank-1 pass (no post-hoc full-matrix
        # select; see linalg.gated_flip_sweep)
        s = _gated_flip(s, j, False, incl)
        o = _gated_flip(o, j, False, incl)
        ld_a = ld_a + jnp.where(incl, jnp.log(piv_a), 0.0)
        ld_o = ld_o + jnp.where(incl, jnp.log(piv_o), 0.0)
        return (s, o, ld_a, ld_o), None

    (s, o, ld_a, ld_o), _ = jax.lax.scan(
        body, (s0, o0, jnp.zeros((), dtype), jnp.zeros((), dtype)),
        jnp.arange(p), unroll=_SCAN_UNROLL)
    m = jnp.asarray(mask, dtype)
    bm = prior.mean * m
    q = bm @ (prior.unscaled_precision @ bm)
    return SweepState(s=s, o=o, logdet_a=ld_a, logdet_o=ld_o, q=q,
                      spike=prior.spike_logp(mask), mask=mask)


def _log_model_prob(st: SweepState, df):
    p = st.mask.shape[-1]
    ss = st.s[p, p] + st.q
    return st.spike + 0.5 * (st.logdet_o - st.logdet_a) \
        - (0.5 * df - 1.0) * jnp.log(ss)


def _flip_deltas(st: SweepState, prior: SpikeSlabPrior, j):
    """Scalars describing the state after flipping j (no matrix work)."""
    p = st.mask.shape[-1]
    incl = st.mask[j]  # currently included -> flipping excludes
    sjj = st.s[j, j]
    ojj = st.o[j, j]
    # logdet deltas: including j adds log(pivot S[j,j] > 0); excluding a
    # swept j (S[j,j] = -1/d < 0) removes log(d) = -log(-S[j,j])
    d_ld_a = jnp.where(incl,
                       -jnp.log(jnp.maximum(-1.0 / sjj, 1e-300)),
                       jnp.log(jnp.maximum(sjj, 1e-300)))
    d_ld_o = jnp.where(incl,
                       -jnp.log(jnp.maximum(-1.0 / ojj, 1e-300)),
                       jnp.log(jnp.maximum(ojj, 1e-300)))
    # corner (residual SS component) after the rank-1 sweep at j
    corner = st.s[p, p] - st.s[p, j] * st.s[j, p] / sjj
    # q delta: b_g' Omega_g b_g gains/loses the j terms
    m = jnp.asarray(st.mask, st.s.dtype)
    bj = prior.mean[j]
    cross = bj * (prior.unscaled_precision[j] @ (prior.mean * m))
    own = bj * bj * prior.unscaled_precision[j, j]
    # if j currently included, m includes j so cross contains own once
    dq = jnp.where(incl, -(2.0 * cross - own), 2.0 * cross + own)
    d_spike = jnp.where(incl, -prior.log_inclusion_odds[j],
                        prior.log_inclusion_odds[j])
    return corner, dq, d_ld_a, d_ld_o, d_spike


def _gated_apply_flip(st: SweepState, prior: SpikeSlabPrior, j, take,
                      dq, d_ld_a, d_ld_o, d_spike):
    """Apply the flip at j when `take` is True, no-op when False — the
    gate rides inside the rank-1 matrix pass (gated_flip_sweep) and the
    scalar updates are cheap selects. Replaces the lax.cond form, which
    lowers to a full-matrix select under the chain vmap."""
    incl = st.mask[j]
    return SweepState(
        s=_gated_flip(st.s, j, incl, take),
        o=_gated_flip(st.o, j, incl, take),
        logdet_a=st.logdet_a + jnp.where(take, d_ld_a, 0.0),
        logdet_o=st.logdet_o + jnp.where(take, d_ld_o, 0.0),
        q=st.q + jnp.where(take, dq, 0.0),
        spike=st.spike + jnp.where(take, d_spike, 0.0),
        mask=st.mask.at[j].set(jnp.where(take, ~incl, incl)),
    )


# Hamming budget for the incremental mode-jump move: proposals that
# differ from the current mask in more than this many coordinates are
# deterministically rejected. The bound is symmetric in (current,
# proposed) — it depends only on their Hamming distance — so the
# truncated independence-MH kernel stays reversible. 16 covers the
# null-basin escape case (expected proposal size ~ expected model size)
# while costing 16 sequential rank-1 sweeps ~ 1/3 of the p=50 flip scan.
MODE_JUMP_BUDGET = 16


def _mode_jump_swept(key, st: SweepState, logp_cur, prior: SpikeSlabPrior,
                     df, qprobs):
    """Independence-MH between-mode move evaluated INCREMENTALLY on the
    SWEEP state: propose g' ~ prod Bernoulli(qprobs), walk from g to g'
    one flip at a time re-using _flip_deltas/_gated_apply_flip (O(p^2) per
    differing coordinate, at most MODE_JUMP_BUDGET of them), and accept
    with the exact collapsed posterior odds. The cheap form of
    regression.mode_jump_move for the hot path: the Cholesky-path
    evaluation measured 2x the whole sweep's wall at bench scale and
    faults the device at 4096 chains; this one costs ~1/3 of the flip
    scan. Same target, same acceptance rule, plus the symmetric
    Hamming-budget truncation."""
    p = st.mask.shape[-1]
    k_prop, k_acc = jax.random.split(key)
    prop = jax.random.uniform(k_prop, (p,), qprobs.dtype) < qprobs
    diff = prop != st.mask
    n_diff = jnp.sum(diff)
    # the (up to BUDGET) differing coordinates, via top_k on the diff
    # mask — measurably cheaper than a full argsort in the hot loop;
    # non-differing pad slots are gated off by `steps < n_diff`
    budget = min(MODE_JUMP_BUDGET, p)
    _, order = jax.lax.top_k(diff.astype(jnp.int32), budget)

    def walk(carry, j):
        st_c, logp_c, steps = carry
        corner, dq, d_ld_a, d_ld_o, d_spike = _flip_deltas(st_c, prior, j)
        ss_flip = corner + st_c.q + dq
        logp_flip = jnp.where(
            ss_flip > 0,
            st_c.spike + d_spike
            + 0.5 * ((st_c.logdet_o + d_ld_o) - (st_c.logdet_a + d_ld_a))
            - (0.5 * df - 1.0) * jnp.log(jnp.maximum(ss_flip, 1e-300)),
            -jnp.inf)
        do = steps < n_diff
        new_st = _gated_apply_flip(st_c, prior, j, do, dq, d_ld_a,
                                   d_ld_o, d_spike)
        new_logp = jnp.where(do, logp_flip, logp_c)
        return (new_st, new_logp, steps + 1), None

    (st_prop, logp_prop, _), _ = jax.lax.scan(
        walk, (st, logp_cur, jnp.zeros((), jnp.int32)),
        order, unroll=_SCAN_UNROLL)

    logq = jnp.log(qprobs)
    log1mq = jnp.log1p(-qprobs)

    def lq(m):
        mf = jnp.asarray(m, qprobs.dtype)
        return jnp.sum(mf * logq + (1.0 - mf) * log1mq, -1)

    log_ratio = (logp_prop - logp_cur + lq(st.mask) - lq(prop))
    take = jnp.logical_and(
        n_diff <= budget,
        jnp.logical_and(
            n_diff > 0,
            jnp.log(jax.random.uniform(k_acc, (), logp_cur.dtype))
            < log_ratio))
    out_st = jax.tree_util.tree_map(
        lambda a, b: jnp.where(take, a, b), st_prop, st)
    out_logp = jnp.where(take, logp_prop, logp_cur)
    return out_st, out_logp


def draw_indicators_swept(key, suf: RegSuf, prior: SpikeSlabPrior, mask,
                          max_flips: int | None = None, qprobs=None):
    """Random-order Gibbs sweep over indicators using incremental SWEEP
    updates. Distributionally identical to
    regression.draw_indicators_sweep; O(p^2) per flip instead of O(p^3).
    With `qprobs` the sweep is preceded by the incremental independence
    mode-jump move (see _mode_jump_swept)."""
    p = mask.shape[-1]
    df = suf.n + prior.sigma_df
    k_jump, k_perm, k_scan = jax.random.split(key, 3)
    order = jax.random.permutation(k_perm, p)
    if max_flips is not None:
        order = order[:max_flips]
    elif qprobs is not None:
        # The mode jump REPLACES its budget's worth of single flips, so
        # the sweep's serial length (the binding cost at bench scale) is
        # unchanged: a random-subset Gibbs sweep composed with an exact
        # MH move is still invariant for the same target, every
        # coordinate keeps positive per-sweep visit probability, and the
        # jump's global refresh more than makes up the removed flips'
        # mixing (measured: identical wall, R-hat clean at 4096 chains
        # where the flip-only kernel sat at 1.8).
        order = order[:max(p - MODE_JUMP_BUDGET, 1)]
    st = build_sweep_state(suf, prior, mask)
    logp_cur = _log_model_prob(st, df)
    if qprobs is not None:
        st, logp_cur = _mode_jump_swept(k_jump, st, logp_cur, prior, df,
                                        qprobs)

    def flip_one(carry, inp):
        st, logp_cur = carry
        j, k = inp
        corner, dq, d_ld_a, d_ld_o, d_spike = _flip_deltas(st, prior, j)
        ss_flip = corner + st.q + dq
        logp_flip = jnp.where(
            ss_flip > 0,
            st.spike + d_spike
            + 0.5 * ((st.logdet_o + d_ld_o) - (st.logdet_a + d_ld_a))
            - (0.5 * df - 1.0) * jnp.log(jnp.maximum(ss_flip, 1e-300)),
            -jnp.inf)
        take = jnp.log(jax.random.uniform(k, (), logp_cur.dtype)) < (
            jax.nn.log_sigmoid(logp_flip - logp_cur))
        new_st = _gated_apply_flip(st, prior, j, take, dq, d_ld_a,
                                   d_ld_o, d_spike)
        new_logp = jnp.where(take, logp_flip, logp_cur)
        return (new_st, new_logp), None

    keys = jax.random.split(k_scan, order.shape[0])
    (st, _), _ = jax.lax.scan(flip_one, (st, logp_cur), (order, keys),
                              unroll=_SCAN_UNROLL)
    return st.mask
