"""Multi-device sharding: sharded chains, data-parallel sufstats.

The multi-host test story SURVEY.md §4 calls for: everything runs on the
8-virtual-device CPU mesh from conftest, checking (a) sharded execution
works, (b) statistical results are equivalent to the unsharded path."""

import jax
import jax.numpy as jnp
import numpy as np

from boom_tpu.models.glm import RegSuf, SpikeSlabRegression
from boom_tpu.parallel.mesh import (
    data_parallel_suf,
    make_mesh,
    run_mcmc_sharded,
    shard_chains,
)


def test_make_mesh_default():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("chains",)


def test_sharded_mcmc_matches_unsharded_statistics(rng_key):
    """Sharded chains of the flagship spike-slab sampler: posterior means
    agree with the vmap path within MC error."""
    from boom_tpu.inference import run_mcmc

    x, y, beta = SpikeSlabRegression.simulate(rng_key, 300, 6, nonzero=2)
    model = SpikeSlabRegression.from_data(x, y, expected_model_size=2.0)
    mesh = make_mesh()
    n_chains = 16

    init = jax.vmap(model.init_state)(
        jax.random.split(jax.random.key(0), n_chains))
    res_sharded = run_mcmc_sharded(
        jax.random.key(1), model.kernel(), init,
        num_draws=200, mesh=mesh, burn=100)
    res_plain = run_mcmc(
        jax.random.key(2), model.kernel(), model.init_state,
        num_draws=200, num_chains=n_chains, burn=100)

    b_sh = np.asarray(jnp.mean(res_sharded.draws["beta"], (0, 1)))
    b_pl = np.asarray(jnp.mean(res_plain.draws["beta"], (0, 1)))
    np.testing.assert_allclose(b_sh, b_pl, atol=0.1)
    np.testing.assert_allclose(b_sh[:2], np.asarray(beta[:2]), atol=0.3)


def test_data_parallel_sufstats_match(rng_key):
    """psum of shard-local sufstats == global sufstats (the combine_data
    contract as an all-reduce)."""
    x, y, _ = SpikeSlabRegression.simulate(rng_key, 320, 5, nonzero=2)
    mesh = make_mesh({"data": 8})
    suf_dist = data_parallel_suf(
        lambda xs, ys: RegSuf.from_data(xs, ys), x, y, mesh,
        data_axis="data")
    suf_local = RegSuf.from_data(x, y)
    for a, b in zip(suf_dist, suf_local):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-10)


def test_shard_chains_placement(rng_key):
    mesh = make_mesh()
    states = {"x": jnp.zeros((16, 3))}
    sharded = shard_chains(states, mesh)
    assert len(sharded["x"].sharding.device_set) == 8
