"""Vectorized discrete distributions (Bmath discrete families).

Reference: Bmath/dbinom.cpp, dpois.cpp, dnbinom.cpp, dgeom.cpp, dhyper.cpp,
dbeta_binomial via Models/BetaBinomialModel.hpp:73. Values are represented as
floats (counts) so everything broadcasts and differentiates cleanly w.r.t.
parameters; pmf support checks mask non-integer or out-of-range inputs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy import special as jsp

from boom_tpu.dists import _solve
from boom_tpu.dists.continuous import _bcast, _betaln, _float_dtype


def log_binom_coef(n, k):
    """log C(n, k) via lgamma (reference Bmath/choose.cpp)."""
    return jsp.gammaln(n + 1.0) - jsp.gammaln(k + 1.0) - jsp.gammaln(n - k + 1.0)


def _is_count(x):
    return (x >= 0) & (x == jnp.floor(x))


# ---------------------------------------------------------------------------
# Bernoulli
# ---------------------------------------------------------------------------
class bernoulli:
    @staticmethod
    def logpmf(x, prob):
        lp = jnp.where(x == 1, jnp.log(prob), jnp.log1p(-prob))
        return jnp.where((x == 0) | (x == 1), lp, -jnp.inf)

    @staticmethod
    def sample(key, prob, shape=None):
        fs, (prob_,) = _bcast(shape, prob)
        return jax.random.bernoulli(key, prob_, fs)


# ---------------------------------------------------------------------------
# Binomial
# ---------------------------------------------------------------------------
class binomial:
    """Reference: Bmath/dbinom.cpp, pbinom.cpp, qbinom.cpp, rbinom.cpp;
    Models/BinomialModel.hpp."""

    @staticmethod
    def logpmf(x, n, prob):
        ok = _is_count(x) & (x <= n)
        xs = jnp.where(ok, x, 0.0)
        p = jnp.clip(prob, 1e-300, 1.0)
        out = (
            log_binom_coef(n, xs)
            + jnp.where(xs > 0, xs * jnp.log(p), 0.0)
            + jnp.where(n - xs > 0, (n - xs) * jnp.log1p(-prob), 0.0)
        )
        return jnp.where(ok, out, -jnp.inf)

    @staticmethod
    def pmf(x, n, prob):
        return jnp.exp(binomial.logpmf(x, n, prob))

    @staticmethod
    def cdf(x, n, prob):
        """P(X <= x) = I_{1-p}(n-x, x+1) (regularized incomplete beta)."""
        xf = jnp.floor(x)
        inside = (xf >= 0) & (xf < n)
        xs = jnp.clip(xf, 0.0, n - 1.0)
        val = jsp.betainc(n - xs, xs + 1.0, 1.0 - prob)
        return jnp.where(xf < 0, 0.0, jnp.where(inside, val, 1.0))

    @staticmethod
    def quantile(p, n, prob):
        fs = jnp.broadcast_shapes(jnp.shape(p), jnp.shape(n), jnp.shape(prob))
        p_ = jnp.broadcast_to(jnp.asarray(p, _float_dtype(p, prob)), fs)
        n_ = jnp.broadcast_to(jnp.asarray(n, p_.dtype), fs)
        pr = jnp.broadcast_to(jnp.asarray(prob, p_.dtype), fs)
        q = _solve.discrete_quantile(lambda k: binomial.cdf(k, n_, pr), p_, n_)
        return jnp.minimum(q, n_)

    @staticmethod
    def sample(key, n, prob, shape=None, dtype=None):
        fs, (n_, prob_) = _bcast(shape, n, prob)
        dtype = dtype or _float_dtype(prob_)
        return jax.random.binomial(key, n_.astype(dtype), prob_.astype(dtype), fs)


# ---------------------------------------------------------------------------
# Poisson
# ---------------------------------------------------------------------------
class poisson:
    """Reference: Bmath/dpois.cpp family; Models/PoissonModel.hpp."""

    @staticmethod
    def logpmf(x, rate):
        ok = _is_count(x)
        xs = jnp.where(ok, x, 0.0)
        out = xs * jnp.log(rate) - rate - jsp.gammaln(xs + 1.0)
        return jnp.where(ok, out, -jnp.inf)

    @staticmethod
    def pmf(x, rate):
        return jnp.exp(poisson.logpmf(x, rate))

    @staticmethod
    def cdf(x, rate):
        """P(X <= x) = Q(floor(x)+1, rate) (upper regularized gamma)."""
        xf = jnp.floor(x)
        val = jsp.gammaincc(jnp.maximum(xf, 0.0) + 1.0, rate)
        return jnp.where(xf < 0, 0.0, val)

    @staticmethod
    def quantile(p, rate):
        fs = jnp.broadcast_shapes(jnp.shape(p), jnp.shape(rate))
        dtype = _float_dtype(p, rate)
        p_ = jnp.broadcast_to(jnp.asarray(p, dtype), fs)
        r_ = jnp.broadcast_to(jnp.asarray(rate, dtype), fs)
        return _solve.discrete_quantile(lambda k: poisson.cdf(k, r_), p_, r_)

    @staticmethod
    def sample(key, rate, shape=None, dtype=None):
        fs, (rate_,) = _bcast(shape, rate)
        out_dtype = dtype or _float_dtype(rate_)
        draws = jax.random.poisson(key, rate_.astype(
            _float_dtype(rate_)), fs)
        return draws.astype(out_dtype)


# ---------------------------------------------------------------------------
# Negative binomial (size r, prob p of success; counts failures like R)
# ---------------------------------------------------------------------------
class neg_binomial:
    """X = number of failures before the r-th success.
    Reference: Bmath/dnbinom.cpp family."""

    @staticmethod
    def logpmf(x, r, prob):
        ok = _is_count(x)
        xs = jnp.where(ok, x, 0.0)
        out = (
            jsp.gammaln(xs + r)
            - jsp.gammaln(r)
            - jsp.gammaln(xs + 1.0)
            + r * jnp.log(prob)
            + xs * jnp.log1p(-prob)
        )
        return jnp.where(ok, out, -jnp.inf)

    @staticmethod
    def cdf(x, r, prob):
        xf = jnp.floor(x)
        val = jsp.betainc(r, jnp.maximum(xf, 0.0) + 1.0, prob)
        return jnp.where(xf < 0, 0.0, val)

    @staticmethod
    def quantile(p, r, prob):
        fs = jnp.broadcast_shapes(jnp.shape(p), jnp.shape(r), jnp.shape(prob))
        dtype = _float_dtype(p, prob)
        p_ = jnp.broadcast_to(jnp.asarray(p, dtype), fs)
        r_ = jnp.broadcast_to(jnp.asarray(r, dtype), fs)
        pr = jnp.broadcast_to(jnp.asarray(prob, dtype), fs)
        mean = r_ * (1.0 - pr) / pr
        return _solve.discrete_quantile(
            lambda k: neg_binomial.cdf(k, r_, pr), p_, mean + 10.0)

    @staticmethod
    def sample(key, r, prob, shape=None):
        """Gamma-Poisson mixture: X | g ~ Poisson(g), g ~ Gamma(r, p/(1-p))."""
        from boom_tpu.dists.continuous import gamma as gamma_dist

        k1, k2 = jax.random.split(key)
        g = gamma_dist.sample(k1, r, prob / (1.0 - prob), shape)
        return poisson.sample(k2, g)


# ---------------------------------------------------------------------------
# Geometric (number of failures before first success, R convention)
# ---------------------------------------------------------------------------
class geometric:
    @staticmethod
    def logpmf(x, prob):
        ok = _is_count(x)
        xs = jnp.where(ok, x, 0.0)
        return jnp.where(ok, xs * jnp.log1p(-prob) + jnp.log(prob), -jnp.inf)

    @staticmethod
    def cdf(x, prob):
        xf = jnp.floor(x)
        return jnp.where(
            xf < 0, 0.0, -jnp.expm1((jnp.maximum(xf, 0.0) + 1.0) * jnp.log1p(-prob)))

    @staticmethod
    def quantile(p, prob):
        p = jnp.asarray(p)
        return jnp.maximum(jnp.ceil(
            jnp.log1p(-p) / jnp.log1p(-prob) - 1.0 - 1e-12), 0.0)

    @staticmethod
    def sample(key, prob, shape=None, dtype=None):
        fs, (prob_,) = _bcast(shape, prob)
        dtype = dtype or _float_dtype(prob_)
        u = jax.random.uniform(key, fs, dtype, minval=jnp.finfo(dtype).tiny)
        return jnp.floor(jnp.log(u) / jnp.log1p(-prob_.astype(dtype)))


# ---------------------------------------------------------------------------
# Beta-Binomial — reference Models/BetaBinomialModel.hpp:73
# ---------------------------------------------------------------------------
class beta_binomial:
    @staticmethod
    def logpmf(x, n, a, b):
        ok = _is_count(x) & (x <= n)
        xs = jnp.where(ok, x, 0.0)
        out = (
            log_binom_coef(n, xs)
            + _betaln(xs + a, n - xs + b)
            - _betaln(a, b)
        )
        return jnp.where(ok, out, -jnp.inf)

    @staticmethod
    def pmf(x, n, a, b):
        return jnp.exp(beta_binomial.logpmf(x, n, a, b))

    @staticmethod
    def sample(key, n, a, b, shape=None):
        from boom_tpu.dists.continuous import beta as beta_dist

        k1, k2 = jax.random.split(key)
        # broadcast against n too so each trial group gets its own p
        fs, (n_, a_, b_) = _bcast(shape, n, a, b)
        p = beta_dist.sample(k1, a_, b_)
        return binomial.sample(k2, n_, p)


# ---------------------------------------------------------------------------
# Hypergeometric — reference Bmath/dhyper.cpp
# ---------------------------------------------------------------------------
class hypergeometric:
    """x successes in k draws from pop with m successes, n failures."""

    @staticmethod
    def logpmf(x, m, n, k):
        lo = jnp.maximum(0.0, k - n)
        hi = jnp.minimum(k, m)
        ok = _is_count(x) & (x >= lo) & (x <= hi)
        xs = jnp.where(ok, x, lo)
        out = (
            log_binom_coef(m, xs)
            + log_binom_coef(n, k - xs)
            - log_binom_coef(m + n, k)
        )
        return jnp.where(ok, out, -jnp.inf)


# ---------------------------------------------------------------------------
# Categorical / discrete uniform / multinomial
# ---------------------------------------------------------------------------
class categorical:
    """Categorical over {0..K-1} given (possibly unnormalized) log-probs.
    Reference: distributions/rmulti.cpp (rmulti_mt)."""

    @staticmethod
    def logpmf(x, logits):
        logp = jax.nn.log_softmax(logits, axis=-1)
        x = jnp.asarray(x, jnp.int32)
        batch = jnp.broadcast_shapes(x.shape, logp.shape[:-1])
        logp = jnp.broadcast_to(logp, batch + logp.shape[-1:])
        x = jnp.broadcast_to(x, batch)
        return jnp.take_along_axis(logp, x[..., None], axis=-1)[..., 0]

    @staticmethod
    def sample(key, logits, shape=None):
        if shape is None:
            return jax.random.categorical(key, logits, axis=-1)
        return jax.random.categorical(
            key, logits, axis=-1, shape=tuple(shape) + jnp.shape(logits)[:-1])


class discrete_uniform:
    """Reference: Models/DiscreteUniformModel.hpp."""

    @staticmethod
    def logpmf(x, lo, hi):
        ok = _is_count(x - lo) & (x <= hi)
        return jnp.where(ok, -jnp.log(hi - lo + 1.0), -jnp.inf)

    @staticmethod
    def sample(key, lo, hi, shape=None):
        fs, (lo_, hi_) = _bcast(shape, lo, hi)
        u = jax.random.uniform(key, fs)
        return lo_ + jnp.floor(u * (hi_ - lo_ + 1.0))


class multinomial:
    """Counts over K cells. Reference: distributions/rmultinom.cpp."""

    @staticmethod
    def logpmf(x, n, probs):
        lp = jnp.where(x > 0, x * jnp.log(probs), 0.0)
        return (
            jsp.gammaln(n + 1.0)
            - jnp.sum(jsp.gammaln(x + 1.0), axis=-1)
            + jnp.sum(lp, axis=-1)
        )

    @staticmethod
    def sample(key, n, probs, shape=None):
        """One-hot sum formulation: n categorical draws summed — exact and
        vectorizes; for large n use binomial chain (future optimization)."""
        probs = jnp.asarray(probs)
        k = probs.shape[-1]
        n = int(n)
        draws = jax.random.categorical(
            key, jnp.log(probs), axis=-1,
            shape=(n,) + (tuple(shape or ()) + probs.shape[:-1]))
        onehot = jax.nn.one_hot(draws, k, dtype=probs.dtype)
        return jnp.sum(onehot, axis=0)
