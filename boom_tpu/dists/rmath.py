"""R/Bmath-style d/p/q/r function aliases.

The reference exposes R-convention free functions (dnorm, pnorm, qnorm,
rnorm, ... — reference Bmath/Bmath.hpp and distributions.hpp). This module
provides the same surface on top of the vectorized family namespaces so users
migrating from BOOM's Python/R interfaces find familiar names. `r*` functions
take a key first (functional RNG, no GlobalRng singleton).
"""

from __future__ import annotations

from boom_tpu.dists.continuous import (
    beta,
    cauchy,
    chisq,
    exponential,
    f_dist,
    gamma,
    gumbel,
    inverse_gamma,
    inverse_gaussian,
    laplace,
    logistic,
    lognormal,
    normal,
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
    geometric,
    multinomial,
    neg_binomial,
    poisson,
)
from boom_tpu.dists.multivariate import dirichlet, mvn, mvt, wishart
from boom_tpu.dists.truncated import trun_gamma, trun_logistic, trun_normal

# --- Normal ---
dnorm = normal.logpdf  # NOTE: log scale (BOOM's dnorm has a `log` flag; we
pnorm = normal.cdf  # always return log densities — exp() if needed)
qnorm = normal.quantile
rnorm = normal.sample

# --- Gamma (shape, rate) ---
dgamma = gamma.logpdf
pgamma = gamma.cdf
qgamma = gamma.quantile
rgamma = gamma.sample

# --- Beta ---
dbeta = beta.logpdf
pbeta = beta.cdf
qbeta = beta.quantile
rbeta = beta.sample

# --- Chi-square ---
dchisq = chisq.logpdf
pchisq = chisq.cdf
qchisq = chisq.quantile
rchisq = chisq.sample

# --- Exponential ---
dexp = exponential.logpdf
pexp = exponential.cdf
qexp = exponential.quantile
rexp = exponential.sample

# --- Uniform ---
dunif = uniform.logpdf
punif = uniform.cdf
qunif = uniform.quantile
runif = uniform.sample

# --- Student t ---
dt = student_t.logpdf
pt = student_t.cdf
qt = student_t.quantile
rt = student_t.sample

# --- Cauchy ---
dcauchy = cauchy.logpdf
pcauchy = cauchy.cdf
qcauchy = cauchy.quantile
rcauchy = cauchy.sample

# --- Logistic ---
dlogis = logistic.logpdf
plogis = logistic.cdf
qlogis = logistic.quantile
rlogis = logistic.sample

# --- Lognormal ---
dlnorm = lognormal.logpdf
plnorm = lognormal.cdf
qlnorm = lognormal.quantile
rlnorm = lognormal.sample

# --- Weibull ---
dweibull = weibull.logpdf
pweibull = weibull.cdf
qweibull = weibull.quantile
rweibull = weibull.sample

# --- F ---
df = f_dist.logpdf
pf = f_dist.cdf
qf = f_dist.quantile
rf = f_dist.sample

# --- Binomial ---
dbinom = binomial.logpmf
pbinom = binomial.cdf
qbinom = binomial.quantile
rbinom = binomial.sample

# --- Poisson ---
dpois = poisson.logpmf
ppois = poisson.cdf
qpois = poisson.quantile
rpois = poisson.sample

# --- Negative binomial ---
dnbinom = neg_binomial.logpmf
pnbinom = neg_binomial.cdf
qnbinom = neg_binomial.quantile
rnbinom = neg_binomial.sample

# --- Geometric ---
dgeom = geometric.logpmf
pgeom = geometric.cdf
qgeom = geometric.quantile
rgeom = geometric.sample

# --- Multivariate / misc samplers (BOOM distributions.hpp names) ---
rmvn = mvn.sample
rmvn_ivar = mvn.sample_prec
rmvn_suf = mvn.sample_suf
dmvn = mvn.logpdf
rmvt = mvt.sample
dmvt = mvt.logpdf
rdirichlet = dirichlet.sample
ddirichlet = dirichlet.logpdf
rwish = wishart.sample
dwish = wishart.logpdf
rmulti = categorical.sample
rmultinom = multinomial.sample
rtrun_norm = trun_normal.sample
rtrun_gamma = trun_gamma.sample
rtrun_logit = trun_logistic.sample
rig = inverse_gaussian.sample
rbern = bernoulli.sample
rbeta_binomial = beta_binomial.sample
dbeta_binomial = beta_binomial.logpmf

__all__ = [n for n in dir() if not n.startswith("_")]
