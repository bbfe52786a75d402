"""Sequential Monte Carlo: resampling + bootstrap & Liu-West filters.

Reference: stats/Resampler.hpp:41 (weighted resampling used by SMC),
Samplers/ImportanceResampler.hpp:31, and
Models/HMM/PosteriorSamplers/LiuWestParticleFilter.hpp:32 — the one SMC
component in BOOM (joint state+parameter filtering with kernel-shrinkage
parameter evolution).

TPU-native form: systematic resampling is a single sorted-search over the
cumulative weights (fixed shape, no rejection loops); the filters are
`lax.scan`s over time with the particle axis vectorized, so the device
sees [N, ...] batched ops per step; vmap over chains/replicates on top.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp


def normalize_log_weights(log_w):
    lse = jax.scipy.special.logsumexp(log_w, axis=-1, keepdims=True)
    return log_w - lse


def ess_of_log_weights(log_w):
    """Effective sample size of normalized importance weights."""
    lw = normalize_log_weights(log_w)
    return jnp.exp(-jax.scipy.special.logsumexp(2.0 * lw, axis=-1))


def multinomial_resample(key, log_w, n=None):
    """Indices ~ Categorical(w), iid (reference Resampler's default)."""
    n = n or log_w.shape[-1]
    return jax.random.categorical(key, log_w, shape=(n,))


def systematic_resample(key, log_w, n=None):
    """Systematic (stratified single-uniform) resampling: lower variance
    than multinomial; one uniform, one cumsum, one searchsorted."""
    n = n or log_w.shape[-1]
    w = jnp.exp(normalize_log_weights(log_w))
    cum = jnp.cumsum(w, -1)
    u = (jax.random.uniform(key, ()) + jnp.arange(n)) / n
    return jnp.clip(jnp.searchsorted(cum, u), 0, log_w.shape[-1] - 1)


def residual_resample(key, log_w, n=None):
    """Residual resampling: deterministic floor(n w) copies + multinomial
    on the residuals. Fixed-shape construction via repeat-by-sort."""
    n = n or log_w.shape[-1]
    w = jnp.exp(normalize_log_weights(log_w))
    counts = jnp.floor(n * w).astype(jnp.int32)
    resid = n * w - counts
    n_det = jnp.sum(counts)
    # deterministic part: index i repeated counts[i] times, packed left
    idx_det = jnp.repeat(jnp.arange(w.shape[-1]), counts,
                         total_repeat_length=n)
    k_extra = jax.random.categorical(
        key, jnp.log(jnp.clip(resid, 1e-300, None)), shape=(n,))
    pos = jnp.arange(n)
    return jnp.where(pos < n_det, idx_det, k_extra)


def resample_state(key, particles, log_w, method="systematic"):
    """Resample a pytree of particles along the leading axis."""
    fn = {"systematic": systematic_resample,
          "multinomial": multinomial_resample,
          "residual": residual_resample}[method]
    idx = fn(key, log_w)
    return jax.tree_util.tree_map(lambda a: a[idx], particles), idx


def bootstrap_filter(
    key: jax.Array,
    ys: jax.Array,
    init_particles: Any,
    transition: Callable[[jax.Array, Any], Any],
    log_obs: Callable[[jax.Array, Any], jax.Array],
    ess_threshold: float = 0.5,
):
    """Bootstrap particle filter with adaptive systematic resampling.

    transition(key, particles) -> particles (vectorized over N)
    log_obs(y_t, particles) -> [N] observation log densities
    Returns (final_particles, loglik, ess_path)."""
    n = jax.tree_util.tree_leaves(init_particles)[0].shape[0]

    def step(carry, inp):
        particles, log_w, ll = carry
        y_t, k = inp
        k_res, k_trans = jax.random.split(k)
        # adaptive resample
        ess = ess_of_log_weights(log_w)

        def do_resample(args):
            p, lw = args
            p2, _ = resample_state(k_res, p, lw)
            return p2, jnp.zeros_like(lw)

        particles, log_w = jax.lax.cond(
            ess < ess_threshold * n, do_resample, lambda a: a,
            (particles, log_w))
        particles = transition(k_trans, particles)
        lo = log_obs(y_t, particles)
        log_w_new = log_w + lo
        # incremental likelihood: lse(w + lo) - lse(w)
        ll = ll + (jax.scipy.special.logsumexp(log_w_new)
                   - jax.scipy.special.logsumexp(log_w))
        return (particles, log_w_new, ll), ess

    keys = jax.random.split(key, ys.shape[0])
    (particles, log_w, ll), ess_path = jax.lax.scan(
        step, (init_particles, jnp.zeros((n,)), jnp.asarray(0.0)),
        (ys, keys))
    return particles, log_w, ll, ess_path


@dataclasses.dataclass(frozen=True)
class LiuWestFilter:
    """Liu-West (2001) auxiliary particle filter for joint state+parameter
    learning (reference LiuWestParticleFilter.hpp:32; used for GeneralHmm
    online inference).

    Particles carry (state [N, ds], theta [N, dp]); parameters evolve by
    kernel shrinkage: m_i = a theta_i + (1-a) theta_bar, theta* ~
    N(m_i, h^2 V) with a^2 + h^2 = 1 (discount parameterization).

    User supplies:
      predict_state(state, theta) -> point prediction of next state [N, ds]
      transition(key, state, theta) -> next state draw
      log_obs(y, state, theta) -> [N]
    """

    predict_state: Callable
    transition: Callable
    log_obs: Callable
    discount: float = 0.98  # 'a' in Liu-West; h^2 = 1 - a^2

    def step(self, key, y_t, state, theta, log_w):
        a = self.discount
        h2 = 1.0 - a * a
        k1, k2, k3 = jax.random.split(key, 3)
        # parameter shrinkage moments (weighted)
        w = jnp.exp(normalize_log_weights(log_w))
        theta_bar = jnp.einsum("n,np->p", w, theta)
        centered = theta - theta_bar
        v = jnp.einsum("n,np,nq->pq", w, centered, centered)
        m = a * theta + (1.0 - a) * theta_bar
        # first-stage (auxiliary) weights at point predictions
        mu = self.predict_state(state, theta)
        g = log_w + self.log_obs(y_t, mu, m)
        idx = systematic_resample(k1, g)
        # refresh parameters and propagate states
        chol = jnp.linalg.cholesky(
            h2 * v + 1e-10 * jnp.eye(theta.shape[1]))
        eps = jax.random.normal(k2, theta.shape, theta.dtype)
        theta_new = m[idx] + eps @ chol.T
        state_new = self.transition(k3, state[idx], theta_new)
        # second-stage weights
        log_w_new = (self.log_obs(y_t, state_new, theta_new)
                     - self.log_obs(y_t, mu[idx], m[idx]))
        return state_new, theta_new, log_w_new

    def run(self, key, ys, init_state, init_theta):
        n = init_state.shape[0]

        def body(carry, inp):
            state, theta, log_w = carry
            y_t, k = inp
            state, theta, log_w = self.step(k, y_t, state, theta, log_w)
            w = jnp.exp(normalize_log_weights(log_w))
            theta_mean = jnp.einsum("n,np->p", w, theta)
            return (state, theta, log_w), theta_mean

        keys = jax.random.split(key, ys.shape[0])
        (state, theta, log_w), theta_path = jax.lax.scan(
            body, (init_state, init_theta, jnp.zeros((n,))), (ys, keys))
        return state, theta, log_w, theta_path
