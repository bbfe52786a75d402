"""Multi-device parallelism: chain and data sharding over a mesh.

BOOM's only parallelism is a std::thread pool with deepcloned models and
sufstat merge (reference cpputil/ThreadTools.hpp:169, HMM2.cpp:319-339
impute_latent_data_with_threads, Model::combine_data ModelTypes.hpp:89).
The TPU-native equivalents (SURVEY.md §2.8):

  chain parallelism : vmap over chains within a device, shard_map over the
                      'chains' mesh axis across devices.
  data parallelism  : shard observations over the 'data' axis; sufficient
                      statistics combine with psum — the exact
                      combine_data contract as an all-reduce.
  multi-host        : initialize_multihost joins a jax.distributed job so
                      jax.devices()/make_mesh span every process; sharded
                      init states and keys become cross-process global
                      arrays automatically (mesh.shard_chains).
"""

from boom_tpu.parallel.mesh import (
    data_parallel_suf,
    initialize_multihost,
    make_mesh,
    run_mcmc_sharded,
    shard_chains,
)

__all__ = ["make_mesh", "shard_chains", "run_mcmc_sharded",
           "data_parallel_suf", "initialize_multihost"]
