"""Tensor-parallel (column-sharded) spike-slab: statistical equivalence
between a 1-device and a 4-device mesh run, and agreement with the
dense single-device sampler (SURVEY.md §2.8 TP row; reference
BregVsSampler.cpp:353 / spikeslab.BigAssSpikeSlab)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from boom_tpu.parallel.mesh import shard_map
from boom_tpu.parallel.tp_ssvs import (
    TpSpikeSlabConfig,
    dense_beta,
    init_tp_state,
    make_tp_ssvs_kernel,
)


def _problem(key, n=400, p=32, nonzero=4):
    kx, kb, ke = jax.random.split(key, 3)
    x = jax.random.normal(kx, (n, p))
    beta = jnp.zeros((p,)).at[:nonzero].set(
        jnp.asarray([3.0, -2.0, 1.5, 2.5]))
    y = x @ beta + jax.random.normal(ke, (n,))
    return x, y, beta


def _run_tp(key, x, y, cfg, n_devices, sweeps=400, burn=150):
    devices = jax.devices()[:n_devices]
    mesh = Mesh(np.asarray(devices), ("tp",))
    p_local = x.shape[1] // n_devices

    def program(x_local, y_rep, k):
        kernel = make_tp_ssvs_kernel(x_local, y_rep, cfg)
        state = init_tp_state(k, cfg, x_local.dtype)

        def step(st, kk):
            st = kernel(kk, st)
            return st, (st["gamma_idx"], dense_beta(st, cfg.p_total),
                        st["sigsq"])

        _, (gidx, betas, sigs) = jax.lax.scan(
            step, state, jax.random.split(k, sweeps))
        return gidx, betas, sigs

    sharded = shard_map(
        program, mesh=mesh,
        in_specs=(P(None, "tp"), P(), P()),
        out_specs=(P(), P(), P()))
    x_sh = jax.device_put(x, NamedSharding(mesh, P(None, "tp")))
    gidx, betas, sigs = jax.jit(sharded)(x_sh, y, key)
    incl = np.zeros(cfg.p_total)
    g = np.asarray(gidx[burn:])
    for j in range(cfg.p_total):
        incl[j] = (g == j).any(axis=1).mean()
    return incl, np.asarray(betas[burn:]).mean(0), np.asarray(
        sigs[burn:]).mean()


def test_tp_ssvs_equivalence(rng_key):
    x, y, beta_true = _problem(rng_key)
    cfg = TpSpikeSlabConfig(p_total=32, max_size=10, num_flips=24,
                            log_odds=float(np.log(0.1 / 0.9)))

    incl4, beta4, sig4 = _run_tp(jax.random.key(1), x, y, cfg, 4)
    incl1, beta1, sig1 = _run_tp(jax.random.key(2), x, y, cfg, 1)

    # both meshes find the true support
    for incl, beta in ((incl4, beta4), (incl1, beta1)):
        assert (incl[:4] > 0.9).all(), incl[:4]
        assert (incl[4:] < 0.35).all(), incl[4:].max()
        np.testing.assert_allclose(beta[:4], np.asarray(beta_true[:4]),
                                   atol=0.15)
    # statistical equivalence across mesh sizes
    np.testing.assert_allclose(incl4, incl1, atol=0.12)
    np.testing.assert_allclose(beta4[:4], beta1[:4], atol=0.1)
    assert abs(sig4 - sig1) < 0.25, (sig4, sig1)


def test_tp_ssvs_respects_cap(rng_key):
    """With max_size < true support the sampler stays within the cap."""
    x, y, _ = _problem(rng_key)
    cfg = TpSpikeSlabConfig(p_total=32, max_size=3, num_flips=16,
                            log_odds=float(np.log(0.1 / 0.9)))
    incl, beta, _ = _run_tp(jax.random.key(3), x, y, cfg, 2,
                            sweeps=150, burn=50)
    # never more than 3 active: total inclusion mass bounded
    assert incl.sum() <= 3.0 + 1e-6, incl.sum()
