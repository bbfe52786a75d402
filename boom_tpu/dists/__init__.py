"""Distribution library: vectorized log-prob / CDF / quantile / sampling.

The TPU-native replacement for the reference's Bmath/ (libRmath port),
distributions/ (samplers), and math/ (special functions) layers. See
SURVEY.md §2.3.
"""

from boom_tpu.dists import _solve, noncentral, rmath, special
from boom_tpu.dists.noncentral import (
    bessel_k,
    log_bessel_k,
    nc_beta,
    nc_chisq,
    nc_f,
    nc_t,
    tukey,
)
from boom_tpu.dists.continuous import (
    beta,
    cauchy,
    chisq,
    exponential,
    f_dist,
    gamma,
    gig,
    gumbel,
    inverse_gamma,
    inverse_gaussian,
    laplace,
    logistic,
    lognormal,
    normal,
    scaled_inv_chisq,
    student_t,
    triangle,
    uniform,
    weibull,
)
from boom_tpu.dists.discrete import (
    bernoulli,
    beta_binomial,
    binomial,
    categorical,
    discrete_uniform,
    geometric,
    hypergeometric,
    multinomial,
    neg_binomial,
    poisson,
)
from boom_tpu.dists.multivariate import (
    dirichlet,
    inverse_wishart,
    lmultigamma,
    lkj,
    matrix_normal,
    mvn,
    mvt,
    wishart,
)
from boom_tpu.dists.truncated import (
    trun_exponential,
    trun_gamma,
    trun_logistic,
    trun_normal,
)

__all__ = [
    "rmath", "special", "_solve",
    # continuous
    "normal", "lognormal", "gamma", "inverse_gamma", "chisq",
    "scaled_inv_chisq", "exponential", "beta", "uniform", "student_t",
    "cauchy", "logistic", "weibull", "f_dist", "laplace", "gumbel",
    "inverse_gaussian", "triangle", "gig",
    "nc_beta", "nc_chisq", "nc_f", "nc_t", "tukey", "bessel_k",
    "log_bessel_k", "noncentral",
    # discrete
    "bernoulli", "binomial", "poisson", "neg_binomial", "geometric",
    "beta_binomial", "hypergeometric", "categorical", "discrete_uniform",
    "multinomial",
    # multivariate
    "mvn", "mvt", "dirichlet", "wishart", "inverse_wishart",
    "matrix_normal", "lmultigamma", "lkj",
    # truncated
    "trun_normal", "trun_exponential", "trun_gamma", "trun_logistic",
]
