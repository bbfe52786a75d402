"""Collapsed-Gibbs DP-MVN + split-merge + assignment relabeling.

Reference: Models/Mixtures/PosteriorSamplers/
DirichletProcessMvnCollapsedGibbsSampler.hpp:35, SplitMerge.hpp,
identify_permutation.hpp:39, numopt/LinearAssignment.hpp.
"""

import jax
import jax.numpy as jnp
import numpy as np

from boom_tpu.inference import run_mcmc
from boom_tpu.models.dirichlet_process import DpMvnCollapsed
from boom_tpu.models.mixtures import (
    GaussianMixtureModel,
    identify_permutation,
    relabel_by_permutation,
    relabel_sorted,
)
from boom_tpu.numopt import linear_assignment


def test_linear_assignment_known():
    c = np.asarray([[4.0, 1.0, 3.0], [2.0, 0.0, 5.0], [3.0, 2.0, 2.0]])
    # optimal: 0->1, 1->0, 2->2 (cost 1+2+2=5)
    assign = linear_assignment(c)
    assert c[np.arange(3), assign].sum() == 5.0


def _three_blob_data(key, n=360):
    ks = jax.random.split(key, 4)
    mus = jnp.asarray([[0.0, 0.0], [4.0, 4.0], [-4.0, 4.0]])
    z = jax.random.randint(ks[0], (n,), 0, 3)
    y = mus[z] + 0.6 * jax.random.normal(ks[1], (n, 2))
    return y, z, mus


def test_collapsed_gibbs_recovers_clusters(rng_key):
    y, z_true, mus = _three_blob_data(rng_key)
    model = DpMvnCollapsed(y=y, max_components=12, alpha=1.0)
    res = run_mcmc(jax.random.key(1), model.kernel(), model.init_state,
                   num_draws=120, num_chains=1, burn=120)
    nclust = jax.vmap(model.num_clusters)(
        jax.tree_util.tree_map(lambda a: a[0], res.draws))
    # posterior concentrates on ~3 clusters
    mode = int(np.bincount(np.asarray(nclust, np.int64)).argmax())
    assert mode == 3, (mode, np.bincount(np.asarray(nclust, np.int64)))
    # co-clustering accuracy: pairs in the same true cluster should be
    # together most of the time
    final_z = np.asarray(res.final_state["z"][0])
    zt = np.asarray(z_true)
    same_true = zt[:, None] == zt[None, :]
    same_fit = final_z[:, None] == final_z[None, :]
    agree = (same_true == same_fit).mean()
    assert agree > 0.95, agree


def test_split_merge_escapes_merged_mode(rng_key):
    """Start from everything in ONE cluster; split-merge moves should
    find the 3-cluster structure quickly."""
    y, _, _ = _three_blob_data(rng_key, n=240)
    model = DpMvnCollapsed(y=y, max_components=10, alpha=1.0,
                           split_merge_moves=3)
    state = {"z": jnp.zeros((240,), jnp.int32)}
    kern = jax.jit(model.kernel())
    for it in range(30):
        state = kern(jax.random.fold_in(jax.random.key(2), it), state)
    assert int(model.num_clusters(state)) >= 3


def test_assignment_relabeler_beats_sort_by_mean(rng_key):
    """Two components with EQUAL means but different variances:
    sort-by-mean relabeling cannot separate them; assignment-based
    relabeling (Hungarian over co-clustering agreement) can."""
    k1, k2 = jax.random.split(rng_key)
    n = 500
    z_true = jax.random.randint(k1, (n,), 0, 2)
    sds = jnp.asarray([0.3, 3.0])
    y = sds[z_true] * jax.random.normal(k2, (n,))
    model = GaussianMixtureModel(y=y, num_components=2)
    res = run_mcmc(jax.random.key(3), model.kernel(), model.init_state,
                   num_draws=200, num_chains=4, burn=200)

    # per-draw hard assignments from responsibilities
    flat = res.stacked()
    draws = jax.tree_util.tree_leaves(flat)[0].shape[0]
    take = 120
    idx = jnp.linspace(0, draws - 1, take).astype(jnp.int32)
    sub = jax.tree_util.tree_map(lambda a: a[idx], flat)
    resp = jax.vmap(model.responsibilities)(sub)  # [take, n, 2]
    z_draws = jnp.argmax(resp, -1)
    sig_draws = jnp.sqrt(sub["sigsq"])  # [take, 2]

    # sort-by-MEAN relabeling leaves sigma draws mixed across labels:
    mu_sorted, sig_sorted = relabel_sorted(sub["mu"], sig_draws)
    spread_sorted = float(jnp.std(sig_sorted[:, 0]))

    perms = identify_permutation(np.asarray(z_draws), 2)
    (_, sig_fixed) = relabel_by_permutation(perms, np.asarray(z_draws),
                                            np.asarray(sig_draws))
    spread_fixed = float(np.std(sig_fixed[:, 0]))
    # after assignment relabeling each label has a coherent sigma
    sig_means = np.sort(sig_fixed.mean(0))
    assert sig_means[0] < 0.6 and sig_means[1] > 2.0, sig_means
    assert spread_fixed < 0.5 * max(spread_sorted, 0.3) or \
        spread_sorted > 1.0, (spread_fixed, spread_sorted)
