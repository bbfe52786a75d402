"""Point-process models: homogeneous / weekly-cycle Poisson, MMPP.

Reference: Models/PointProcess — HomogeneousPoissonProcess.hpp,
WeeklyCyclePoissonProcess.hpp (day-of-week x hour-of-day rate profile),
MarkovModulatedPoissonProcess.hpp (+ data-augmentation samplers),
PoissonClusterProcess.

TPU form: piecewise-constant rates make binned counts sufficient, so
every conjugate draw is a fixed reduction; the MMPP runs on a regular
time grid through the same log-space forward-filter/backward-sample
machinery as the HMM module (the reference's continuous-time thinning
augmentation is replaced by a discretization whose bin width the caller
controls — error is O(width), and the filter is exactly the HMM FFBS)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from boom_tpu import dists
from boom_tpu.models.hmm import backward_sample, forward_filter
from boom_tpu.models.markov import markov_transition_draw, transition_counts


@dataclasses.dataclass(frozen=True)
class HomogeneousPoissonProcess:
    """Events on [0, T_total]: rate ~ Gamma(a + N, b + T_total)
    (reference HomogeneousPoissonProcess.hpp + conjugate sampler)."""

    num_events: jax.Array | int
    total_time: jax.Array | float
    a: float = 1.0
    b: float = 1.0

    def draw_rate(self, key):
        return dists.gamma.sample(
            key, self.a + self.num_events, self.b + self.total_time)

    def loglik(self, rate):
        return (self.num_events * jnp.log(rate)
                - rate * self.total_time)

    @staticmethod
    def simulate(key, rate, total_time):
        n = jax.random.poisson(key, rate * total_time)
        return n


@dataclasses.dataclass(frozen=True)
class WeeklyCyclePoissonProcess:
    """Rate(t) = lam0 * day_effect[d(t)] * hour_effect[h(t)], effects
    averaging one (reference WeeklyCyclePoissonProcess.hpp). Sufficient
    statistics: event counts and exposure per (day, hour) cell. Gibbs:
    conjugate Gamma draws for lam0 and for the (rescaled) day/hour
    profiles.

    State: lam0, day [7], hour [24] (day/hour normalized to mean 1)."""

    counts: jax.Array  # [7, 24] event counts per cell
    exposure: jax.Array  # [7, 24] observed time in each cell
    a: float = 1.0
    b: float = 1.0
    profile_a: float = 1.0

    def init_state(self, key):
        total = jnp.sum(self.counts) / jnp.maximum(
            jnp.sum(self.exposure), 1e-12)
        return {"lam0": jnp.maximum(total, 1e-6),
                "day": jnp.ones((7,)), "hour": jnp.ones((24,))}

    def kernel(self):
        def sweep(key, state):
            k0, kd, kh = jax.random.split(key, 3)
            day, hour = state["day"], state["hour"]
            # lam0 | profiles
            expo = jnp.sum(self.exposure * day[:, None] * hour[None, :])
            lam0 = dists.gamma.sample(
                k0, self.a + jnp.sum(self.counts), self.b + expo)
            # day effects | rest (conjugate gamma, then renormalize to
            # mean one, folding the scale into lam0 — the reference's
            # identification constraint)
            day_expo = lam0 * jnp.sum(
                self.exposure * hour[None, :], axis=1)
            day = dists.gamma.sample(
                kd, self.profile_a + jnp.sum(self.counts, 1),
                self.profile_a + day_expo)
            scale_d = jnp.mean(day)
            day, lam0 = day / scale_d, lam0 * scale_d
            # hour effects | rest
            hour_expo = lam0 * jnp.sum(
                self.exposure * day[:, None], axis=0)
            hour = dists.gamma.sample(
                kh, self.profile_a + jnp.sum(self.counts, 0),
                self.profile_a + hour_expo)
            scale_h = jnp.mean(hour)
            hour, lam0 = hour / scale_h, lam0 * scale_h
            return {"lam0": lam0, "day": day, "hour": hour}

        return sweep

    @staticmethod
    def simulate(key, lam0, day, hour, weeks=4.0):
        exposure = jnp.full((7, 24), weeks)
        rate = lam0 * day[:, None] * hour[None, :]
        counts = jax.random.poisson(key, rate * exposure)
        return counts, exposure


@dataclasses.dataclass(frozen=True)
class MarkovModulatedPoissonProcess:
    """MMPP on a regular grid: counts[t] ~ Poisson(rate[s_t] * dt) with
    s_t a hidden Markov chain (reference
    MarkovModulatedPoissonProcess.hpp; discretized — the FFBS is the
    same HMM machinery, reference HmmFilter.cpp:84/:130).

    State: rates [S], trans [S, S]."""

    counts: jax.Array  # [T] counts per bin
    dt: float
    num_states: int
    rate_a: float = 1.0
    rate_b: float = 1.0
    trans_prior: float = 1.0

    def init_state(self, key):
        s = self.num_states
        mean_rate = jnp.mean(self.counts) / self.dt
        qs = jnp.linspace(0.5, 1.5, s)
        trans = (jnp.full((s, s), 0.1 / jnp.maximum(s - 1.0, 1.0))
                 + (0.9 - 0.1 / jnp.maximum(s - 1.0, 1.0)) * jnp.eye(s))
        return {"rates": mean_rate * qs, "trans": trans}

    def kernel(self):
        s = self.num_states
        y = self.counts

        def sweep(key, state):
            kz, kr, kt = jax.random.split(key, 3)
            rates = state["rates"]
            log_lik = (y[:, None] * jnp.log(rates * self.dt)[None, :]
                       - (rates * self.dt)[None, :]
                       - jax.scipy.special.gammaln(y + 1.0)[:, None])
            log_trans = jnp.log(jnp.clip(state["trans"], 1e-300, None))
            log_init = jnp.full((s,), -jnp.log(float(s)))
            log_alpha, _ = forward_filter(log_lik, log_trans, log_init)
            z = backward_sample(kz, log_alpha, log_trans)
            onehot = jax.nn.one_hot(z, s, dtype=y.dtype)
            counts_s = onehot.T @ y
            time_s = onehot.sum(0) * self.dt
            rates = dists.gamma.sample(
                kr, self.rate_a + counts_s, self.rate_b + time_s)
            rates = jnp.sort(rates)  # identifiability: ordered rates
            trans = markov_transition_draw(
                kt, jnp.full((s, s), self.trans_prior),
                transition_counts(z, s))
            return {"rates": rates, "trans": trans}

        return sweep

    @staticmethod
    def simulate(key, t_len, dt, rates, trans):
        from boom_tpu.models.markov import MarkovModel

        rates = jnp.asarray(rates)
        s = rates.shape[0]
        k1, k2 = jax.random.split(key)
        z = MarkovModel.simulate(k1, t_len, trans, jnp.full((s,), 1.0 / s))
        counts = jax.random.poisson(k2, rates[z] * dt)
        return counts, z
