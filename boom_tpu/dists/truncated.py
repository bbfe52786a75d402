"""Truncated distributions with tail-robust vectorized samplers.

Reference: distributions/trun_norm.cpp (rtrun_norm_mt, rtrun_norm_2_mt),
trun_gamma.cpp, trun_exp.cpp, trun_logit.cpp. These drive the
data-augmentation samplers (probit latent utilities, logit slice bounds).
The reference uses serial accept/reject loops; here every path is either a
closed-form inverse CDF or a fixed-trip-count masked rejection loop, so one
call draws for thousands of chains at once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy import special as jsp

from boom_tpu.dists.continuous import _bcast, _float_dtype, logistic, normal

_TAIL = 4.0  # standardized bound beyond which we switch to tail rejection


def _std_trunc_normal_body(key, a, b):
    """Standard normal truncated to [a, b], a <= b, assuming a <= _TAIL.
    Inverse-CDF on the ndtr scale (accurate when the interval is not deep in
    a tail)."""
    pa = jsp.ndtr(a)
    pb = jsp.ndtr(b)
    u = jax.random.uniform(key, a.shape, a.dtype,
                           minval=jnp.finfo(a.dtype).tiny)
    p = pa + u * (pb - pa)
    x = jsp.ndtri(jnp.clip(p, jnp.finfo(a.dtype).tiny, 1.0 - 1e-7))
    return jnp.clip(x, a, b)


def _tail_rejection(key, a, b, nrej: int = 32):
    """Robert (1995) exponential-proposal rejection for the upper tail
    [a, b] with a >= _TAIL, fixed trip count with masked acceptance."""
    alpha = 0.5 * (a + jnp.sqrt(a * a + 4.0))

    def body(carry, k):
        x, acc = carry
        k1, k2 = jax.random.split(k)
        u1 = jax.random.uniform(k1, a.shape, a.dtype,
                                minval=jnp.finfo(a.dtype).tiny)
        # exponential(alpha) truncated to [0, b-a] via inverse CDF
        cap = -jnp.expm1(-alpha * (b - a))
        e = -jnp.log1p(-u1 * cap) / alpha
        prop = a + e
        log_acc = -0.5 * (prop - alpha) ** 2
        u2 = jax.random.uniform(k2, a.shape, a.dtype,
                                minval=jnp.finfo(a.dtype).tiny)
        take = (~acc) & (jnp.log(u2) < log_acc)
        return (jnp.where(take, prop, x), acc | take), None

    keys = jax.random.split(key, nrej)
    (x, acc), _ = jax.lax.scan(body, (a, jnp.zeros(a.shape, bool)), keys)
    return jnp.where(acc, x, a)  # fall back to the bound (prob ~ 0)


class trun_normal:
    """Normal truncated to [lo, hi] (either side may be +-inf).
    Reference: distributions/trun_norm.cpp."""

    @staticmethod
    def logpdf(x, mean=0.0, sd=1.0, lo=-jnp.inf, hi=jnp.inf):
        inside = (x >= lo) & (x <= hi)
        logz = _log_normal_interval_mass((lo - mean) / sd, (hi - mean) / sd)
        return jnp.where(inside, normal.logpdf(x, mean, sd) - logz, -jnp.inf)

    @staticmethod
    def sample(key, mean=0.0, sd=1.0, lo=-jnp.inf, hi=jnp.inf, shape=None):
        fs, (mean_, sd_, lo_, hi_) = _bcast(shape, mean, sd, lo, hi)
        dtype = _float_dtype(mean_, sd_)
        mean_, sd_ = mean_.astype(dtype), sd_.astype(dtype)
        a = jnp.clip((lo_.astype(dtype) - mean_) / sd_, -1e30, 1e30)
        b = jnp.clip((hi_.astype(dtype) - mean_) / sd_, -1e30, 1e30)
        # flip so the interval's "hard" side is the upper tail: if b < -_TAIL
        # (deep lower tail) mirror to upper tail
        flip = b < 0.0
        a2 = jnp.where(flip, -b, a)
        b2 = jnp.where(flip, -a, b)
        k1, k2 = jax.random.split(key)
        x_mid = _std_trunc_normal_body(k1, a2, b2)
        x_tail = _tail_rejection(k2, jnp.maximum(a2, _TAIL), b2)
        x = jnp.where(a2 >= _TAIL, x_tail, x_mid)
        x = jnp.where(flip, -x, x)
        return mean_ + sd_ * x

    @staticmethod
    def mean_sd(mean, sd, lo=-jnp.inf, hi=jnp.inf):
        """Posterior moments of the truncated normal (used by EM paths)."""
        a = (lo - mean) / sd
        b = (hi - mean) / sd
        logz = _log_normal_interval_mass(a, b)
        pa = jnp.where(jnp.isfinite(a), jnp.exp(normal.logpdf(a) - logz), 0.0)
        pb = jnp.where(jnp.isfinite(b), jnp.exp(normal.logpdf(b) - logz), 0.0)
        m = pa - pb
        safe_a = jnp.where(jnp.isfinite(a), a, 0.0)
        safe_b = jnp.where(jnp.isfinite(b), b, 0.0)
        v = 1.0 + safe_a * pa - safe_b * pb - m * m
        return mean + sd * m, sd * jnp.sqrt(jnp.maximum(v, 1e-30))


def _log_normal_interval_mass(a, b):
    """log(Phi(b) - Phi(a)) computed stably in either tail."""
    # Work on the side where both arguments are negative: flip if a > 0.
    flip = a > 0.0
    a2 = jnp.where(flip, -b, a)
    b2 = jnp.where(flip, -a, b)
    la = jnp.where(a2 > -jnp.inf, jsp.log_ndtr(a2), -jnp.inf)
    lb = jsp.log_ndtr(b2)
    # log(exp(lb) - exp(la)) = lb + log1p(-exp(la - lb))
    diff = jnp.clip(la - lb, -jnp.inf, -1e-20)
    return lb + jnp.log(-jnp.expm1(diff))


class trun_exponential:
    """Exponential(rate) truncated to [lo, hi] (reference trun_exp.cpp)."""

    @staticmethod
    def sample(key, rate, lo=0.0, hi=jnp.inf, shape=None):
        fs, (rate_, lo_, hi_) = _bcast(shape, rate, lo, hi)
        dtype = _float_dtype(rate_)
        rate_ = rate_.astype(dtype)
        u = jax.random.uniform(key, fs, dtype, minval=jnp.finfo(dtype).tiny)
        # memoryless: x = lo + Exp(rate) truncated to <= hi - lo
        span_mass = jnp.where(
            jnp.isfinite(hi_), -jnp.expm1(-rate_ * (hi_ - lo_)), 1.0)
        return lo_ - jnp.log1p(-u * span_mass) / rate_


class trun_gamma:
    """Gamma(a, rate b) truncated to [lo, hi] (reference trun_gamma.cpp,
    rtrun_gamma_mt). Strategy: inverse-CDF when interval mass is
    representable; shifted-exponential tail rejection when lo is deep in the
    upper tail (lo*b >> a)."""

    @staticmethod
    def sample(key, a, b, lo=0.0, hi=jnp.inf, shape=None, nrej: int = 32):
        from boom_tpu.dists.continuous import gamma as gamma_dist

        fs, (a_, b_, lo_, hi_) = _bcast(shape, a, b, lo, hi)
        dtype = _float_dtype(a_, b_)
        a_, b_ = a_.astype(dtype), b_.astype(dtype)
        lo_ = jnp.maximum(lo_.astype(dtype), 0.0)
        hi_ = hi_.astype(dtype)
        k1, k2, k3 = jax.random.split(key, 3)

        # Path 1: inverse CDF between F(lo), F(hi)
        pa = gamma_dist.cdf(lo_, a_, b_)
        pb = jnp.where(jnp.isfinite(hi_), gamma_dist.cdf(hi_, a_, b_), 1.0)
        u = jax.random.uniform(k1, fs, dtype, minval=jnp.finfo(dtype).tiny)
        p = jnp.clip(pa + u * (pb - pa), 1e-30, 1.0 - 1e-7)
        x_icdf = gamma_dist.quantile(p, a_, b_)

        # Path 2: upper-tail rejection with Exp envelope (valid when lo is
        # past the mode so the density is decreasing: envelope rate
        # lambda = b - (a-1)/lo <= density's local decay rate).
        lam = jnp.maximum(b_ - (a_ - 1.0) / jnp.maximum(lo_, 1e-30), 0.1 * b_)

        def body(carry, k):
            x, acc = carry
            kk1, kk2 = jax.random.split(k)
            e = trun_exponential.sample(kk1, lam, lo_, hi_)
            log_ratio = (
                (a_ - 1.0) * (jnp.log(e) - jnp.log(lo_))
                - b_ * (e - lo_)
                + lam * (e - lo_)
            )
            uu = jax.random.uniform(kk2, fs, dtype,
                                    minval=jnp.finfo(dtype).tiny)
            take = (~acc) & (jnp.log(uu) < log_ratio)
            return (jnp.where(take, e, x), acc | take), None

        keys = jax.random.split(k2, nrej)
        (x_tail, acc), _ = jax.lax.scan(
            body, (lo_, jnp.zeros(fs, bool)), keys)
        x_tail = jnp.where(acc, x_tail, lo_)

        use_tail = (pa > 1.0 - 1e-6) & (lo_ * b_ > a_)
        x = jnp.where(use_tail, x_tail, x_icdf)
        return jnp.clip(x, lo_, hi_)


class trun_logistic:
    """Logistic(loc, scale) truncated to [lo, hi] via exact inverse CDF in
    log-space (reference distributions/trun_logit.cpp — used by the
    multinomial-logit auxiliary-variable samplers)."""

    @staticmethod
    def sample(key, loc=0.0, scale=1.0, lo=-jnp.inf, hi=jnp.inf, shape=None):
        fs, (loc_, scale_, lo_, hi_) = _bcast(shape, loc, scale, lo, hi)
        dtype = _float_dtype(loc_, scale_)
        loc_, scale_ = loc_.astype(dtype), scale_.astype(dtype)
        a = (lo_.astype(dtype) - loc_) / scale_
        b = (hi_.astype(dtype) - loc_) / scale_
        # CDF sigma(z); work with log CDF for stability
        la = jnp.where(a > -jnp.inf, logistic.logcdf(a), -jnp.inf)
        lb = jnp.where(b < jnp.inf, logistic.logcdf(b), 0.0)
        u = jax.random.uniform(key, fs, dtype, minval=jnp.finfo(dtype).tiny)
        # log p = log( exp(la) + u (exp(lb) - exp(la)) )
        #       = lb + log1p( (1-u) expm1(la - lb) )
        # expm1/log1p keep full precision when la ~ lb ~ 0 (deep upper tail).
        lp = lb + jnp.log1p(
            (1.0 - u) * jnp.expm1(jnp.clip(la - lb, -745.0, 0.0)))
        lp = jnp.minimum(lp, -jnp.finfo(dtype).tiny)
        # logistic quantile from log p: z = lp - log(1 - exp(lp))
        z = lp - jnp.log(-jnp.expm1(lp))
        z = jnp.clip(z, a, b)
        return loc_ + scale_ * z


def trun_gamma_lower_fast(key, a, b, lo, newton_iters: int = 6):
    """Gamma(a, rate b) truncated to [lo, inf) by inverse CDF with a
    Wilson-Hilferty start + log-space Newton polish.

    Fast path for the posterior variance draws of SdPrior (shape a =
    df/2 with df = prior_ss + n, so a is moderate-to-large where
    Wilson-Hilferty is accurate and Newton converges in a few steps) —
    the generic trun_gamma.sample runs a ~90-step bisection quantile
    plus a 32-trip rejection scan, which dominated the bsts sweep
    (reference rtrun_gamma_mt has the same role, trun_gamma.cpp)."""
    import jax.scipy.special as jsp

    from boom_tpu.dists.continuous import gamma as gamma_dist

    a = jnp.asarray(a)
    dtype = jnp.result_type(a, jnp.asarray(b), jnp.asarray(lo),
                            jnp.result_type(float))
    a = a.astype(dtype)
    b = jnp.asarray(b, dtype)
    lo = jnp.asarray(lo, dtype)
    shape = jnp.broadcast_shapes(a.shape, b.shape, lo.shape)
    tiny = jnp.finfo(dtype).tiny

    p_lo = gamma_dist.cdf(lo, a, b)
    u = jax.random.uniform(key, shape, dtype, minval=tiny)
    # dtype-aware upper clip: a fixed 1 - 1e-7 rounds to exactly 1.0 in
    # float32 and ndtri(1.0) = inf
    p_hi = 1.0 - jnp.finfo(dtype).epsneg
    p = jnp.clip(p_lo + u * (1.0 - p_lo), tiny, p_hi)

    # Wilson-Hilferty initial value (for the unit-rate gamma)
    z = jsp.ndtri(p)
    c = 1.0 / (9.0 * jnp.maximum(a, 0.5))
    x = jnp.maximum(a * (1.0 - c + z * jnp.sqrt(c)) ** 3, 0.1 * a)
    t = jnp.log(jnp.maximum(x / b, tiny))  # log-space iterate

    # Newton on F(e^t) - p = 0: dt = -(F - p) / (f(x) * x)
    for _ in range(newton_iters):
        x = jnp.exp(t)
        fx = gamma_dist.cdf(x, a, b)
        log_dens_x = gamma_dist.logpdf(x, a, b) + t  # log(f(x) * x)
        step = (fx - p) * jnp.exp(-jnp.clip(log_dens_x, -80.0, 80.0))
        t = t - jnp.clip(step, -2.0, 2.0)

    return jnp.maximum(jnp.exp(t), lo)
