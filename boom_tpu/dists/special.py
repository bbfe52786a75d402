"""Special functions and small numeric utilities.

Reference: math/special_functions.hpp, math/lmultigamma.cpp, cpputil/lse.hpp
(log-sum-exp), cpputil/math_utils.hpp (safelog). Most special functions come
straight from jax.scipy.special; this module adds the reference-specific
helpers and re-exports the common set so model code has one import.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import (  # noqa: F401  (re-exports)
    betainc,
    betaln,
    digamma,
    erf,
    erfc,
    gammainc,
    gammaincc,
    gammaln,
    log_ndtr,
    logsumexp,
    ndtr,
    ndtri,
    polygamma,
    xlog1py,
    xlogy,
)

from boom_tpu.dists.multivariate import lmultigamma  # noqa: F401


def lse(x, axis=-1):
    """Log-sum-exp (reference cpputil/lse.hpp)."""
    return logsumexp(x, axis=axis)


def safelog(x):
    """log with -inf for non-positive input instead of nan
    (reference cpputil/math_utils.hpp safelog)."""
    return jnp.where(x > 0, jnp.log(jnp.where(x > 0, x, 1.0)), -jnp.inf)


def log1p_exp(x):
    """log(1 + exp(x)) — stable softplus (reference math binomial logit
    utilities)."""
    return jax.nn.softplus(x)


def logit(p):
    return jnp.log(p) - jnp.log1p(-p)


def logit_inv(x):
    return jax.nn.sigmoid(x)
