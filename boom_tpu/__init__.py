"""boom_tpu: a TPU-native Bayesian modeling & MCMC framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the BOOM C++
library (steve-the-bayesian/BOOM): conjugate Gibbs model zoo, spike-and-slab
GLMs, finite mixtures, HMMs, and bsts-style structural time series with
Kalman simulation smoothing — plus HMC/NUTS, SMC, and VI backends that the
reference lacks.

Design stance (see SURVEY.md §7): a model is a pytree of parameters plus pure
log-prob / sufficient-statistic functions; an MCMC kernel is a pure
``(key, state) -> state`` function; inference is ``lax.scan`` over kernel
composition, ``vmap`` over chains, and ``shard_map`` over a device mesh.
BOOM's stateful ``Model::sample_posterior()`` loop (Models/Policies/
PriorPolicy.cpp:25-29 in the reference) becomes a jitted scan body.
"""

__version__ = "0.1.0"

from boom_tpu import dists, linalg, priors, rng

__all__ = ["dists", "linalg", "priors", "rng", "__version__"]
