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
from boom_tpu.inference.kernels.slice import slice_step
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


@dataclasses.dataclass(frozen=True)
class CosinePoissonProcess:
    """Inhomogeneous Poisson process with rate
        lambda(t) = lam * (1 + cos(freq * t))
    (reference Models/PointProcess/CosinePoissonProcess.hpp:33 — "mainly
    useful for testing code involving inhomogeneous processes").
    event_rate / expected_number_of_events mirror the reference API;
    `simulate` is Lewis-Shedler thinning against the bound 2*lam (the
    reference's PoissonProcessSimulator path); `loglik` + `kernel` add a
    slice posterior over (log lam, freq), which the reference leaves to
    its generic samplers."""

    events: jax.Array | None = None  # [n] event times on [0, t_end]
    t_end: float = 1.0

    @staticmethod
    def event_rate(t, lam, freq):
        return lam * (1.0 + jnp.cos(freq * t))

    @staticmethod
    def expected_number_of_events(t0, t1, lam, freq):
        """Integral of the rate: lam ((t1-t0) + (sin f t1 - sin f t0)/f)."""
        return lam * ((t1 - t0) + (jnp.sin(freq * t1)
                                   - jnp.sin(freq * t0)) / freq)

    def loglik(self, lam, freq):
        lp = jnp.sum(jnp.log(self.event_rate(self.events, lam, freq)))
        return lp - self.expected_number_of_events(
            0.0, self.t_end, lam, freq)

    def init_state(self, key, freq_grid=None):
        """The frequency likelihood is a comb of narrow harmonics, so
        slice moves alone rarely find the right tooth: initialize at the
        best frequency on a coarse grid (one vectorized loglik sweep —
        the point-process periodogram), jittered per chain."""
        n = self.events.shape[0]
        lam0 = n / self.t_end + 1e-9
        if freq_grid is None:
            freq_grid = jnp.linspace(0.05, 20.0, 512)
        lls = jax.vmap(lambda f: self.loglik(lam0, f))(freq_grid)
        best = freq_grid[jnp.argmax(lls)]
        jitter = 0.01 * jax.random.normal(key, ())
        return {"log_lam": jnp.log(lam0),
                "freq": jnp.maximum(best + jitter, 1e-3)}

    def kernel(self, freq_lo=1e-3, freq_hi=100.0):
        def sweep(key, state):
            k1, k2 = jax.random.split(key)
            log_lam = slice_step(
                k1, state["log_lam"],
                lambda v: self.loglik(jnp.exp(v), state["freq"]),
                width=0.5)
            freq = slice_step(
                k2, state["freq"],
                lambda v: self.loglik(jnp.exp(log_lam), v),
                width=0.2, lower=freq_lo, upper=freq_hi)
            return {"log_lam": log_lam, "freq": freq}

        return sweep

    @staticmethod
    def simulate(key, lam, freq, t_end, max_events=None):
        """Thinning: candidates ~ PP(2 lam), keep with prob
        lambda(t)/(2 lam). Fixed shape: max_events candidates + validity
        mask. Returns (times [max_events], mask)."""
        bound = 2.0 * lam
        if max_events is None:
            max_events = int(bound * t_end + 6.0 * (bound * t_end) ** 0.5)
        k1, k2 = jax.random.split(key)
        gaps = jax.random.exponential(k1, (max_events,)) / bound
        times = jnp.cumsum(gaps)
        keep = (jax.random.uniform(k2, (max_events,)) * bound
                < CosinePoissonProcess.event_rate(times, lam, freq))
        valid = keep & (times < t_end)
        return times, valid


@dataclasses.dataclass(frozen=True)
class PoissonClusterProcess:
    """Poisson cluster process — "a type of Markov modulated Poisson
    process" (reference Models/PointProcess/PoissonClusterProcess.hpp:51):
    a background process sweeps up stray events; a primary process is
    born/dies at exponential rates and emits top-level events; while the
    primary is active it can ignite a secondary process that emits
    follow-on events until it dies.

    TPU form: the latent activity state s = (primary, secondary) in
    {0,1}^2 runs on a regular grid (bin width `dt`), so the imputation
    step (reference impute_latent_data, hpp:115) is the exact HMM FFBS of
    the discretized chain, and sample_client_posterior (hpp:120) becomes
    conjugate gamma draws: counts are multinomially thinned to the active
    component processes and each rate sees its own (count, exposure)
    sufficient statistics. The six component processes of
    PoissonClusterComponentProcesses (hpp:30-37) map to: background /
    primary / secondary traffic rates + primary birth/death and
    secondary birth/death rates.

    State: rates [3] (background, primary, secondary traffic),
    birth [2] (primary birth, secondary ignition while primary active),
    death [2] (primary death, secondary death)."""

    counts: jax.Array  # [T] counts per bin
    dt: float
    rate_a: float = 1.0
    rate_b: float = 1.0
    hazard_a: float = 1.0
    hazard_b: float = 1.0

    # states: 0 = neither, 1 = primary, 2 = secondary, 3 = both
    _PRIMARY = jnp.asarray([0.0, 1.0, 0.0, 1.0])
    _SECONDARY = jnp.asarray([0.0, 0.0, 1.0, 1.0])

    def _log_trans(self, birth, death):
        """4x4 transition matrix of the two-flag chain over one bin."""
        pb = 1.0 - jnp.exp(-birth[0] * self.dt)   # primary turns on
        pd = 1.0 - jnp.exp(-death[0] * self.dt)   # primary turns off
        sb = 1.0 - jnp.exp(-birth[1] * self.dt)   # secondary ignites
        sd = 1.0 - jnp.exp(-death[1] * self.dt)   # secondary dies
        # primary flag: on->on 1-pd, off->on pb; secondary ignition only
        # while primary is on (the cluster coupling, hpp:40-44)
        p_on = self._PRIMARY
        p_next_on = jnp.stack(
            [jnp.where(p_on > 0, 1.0 - pd, pb),
             jnp.where(p_on > 0, pd, 1.0 - pb)], axis=1)  # [4, {on,off}]
        s_on = self._SECONDARY
        ignite = jnp.where(p_on > 0, sb, 0.0)
        s_next_on = jnp.stack(
            [jnp.where(s_on > 0, 1.0 - sd, ignite),
             jnp.where(s_on > 0, sd, 1.0 - ignite)], axis=1)
        trans = jnp.zeros((4, 4))
        for s_to in range(4):
            p_to = 1 if s_to in (1, 3) else 0
            c_to = 1 if s_to in (2, 3) else 0
            trans = trans.at[:, s_to].set(
                p_next_on[:, 1 - p_to] * s_next_on[:, 1 - c_to])
        tiny = jnp.finfo(trans.dtype).tiny
        return jnp.log(jnp.clip(trans, tiny, None))

    def _state_rates(self, rates):
        return (rates[0] + rates[1] * self._PRIMARY
                + rates[2] * self._SECONDARY)

    def init_state(self, key):
        mean_rate = jnp.mean(self.counts) / self.dt
        return {"rates": mean_rate * jnp.asarray([0.5, 1.0, 2.0]),
                "birth": jnp.asarray([0.1, 0.5]),
                "death": jnp.asarray([0.1, 0.5])}

    @staticmethod
    def _binomial(key, n, p, max_n):
        """Exact Binomial(n, p) as a sum of max_n Bernoullis per lane
        (jax.random.binomial's BTRS path NaNs on f32 TPU for edge (n, p);
        bin counts here are small and bounded by the concrete data max,
        so the Bernoulli sum is both exact and cheap)."""
        u = jax.random.uniform(key, (max_n,) + n.shape)
        idx = jnp.arange(max_n, dtype=n.dtype)[:, None]
        return jnp.sum((u < p[None, :]) & (idx < n[None, :]), axis=0
                       ).astype(n.dtype)

    def kernel(self):
        y = self.counts
        max_n = int(jnp.max(y)) + 1

        def sweep(key, state):
            kz, ksrc, kr, kb, kd = jax.random.split(key, 5)
            lam_s = self._state_rates(state["rates"]) * self.dt
            log_lik = (y[:, None] * jnp.log(lam_s)[None, :]
                       - lam_s[None, :]
                       - jax.scipy.special.gammaln(y + 1.0)[:, None])
            log_trans = self._log_trans(state["birth"], state["death"])
            log_init = jnp.full((4,), -jnp.log(4.0))
            log_alpha, _ = forward_filter(log_lik, log_trans, log_init)
            z = backward_sample(kz, log_alpha, log_trans)

            # source attribution: thin each bin's count to the active
            # processes proportional to their rates (the discrete analog
            # of conditional_event_loglikelihood source imputation)
            p_act = self._PRIMARY[z]
            s_act = self._SECONDARY[z]
            r_bg = state["rates"][0] * jnp.ones_like(p_act)
            r_pr = state["rates"][1] * p_act
            r_se = state["rates"][2] * s_act
            tot = r_bg + r_pr + r_se
            probs = jnp.stack([r_bg, r_pr, r_se], 1) / tot[:, None]
            # multinomial thinning via two binomial splits; in the
            # background-only state probs[:, 0] == 1 exactly, so guard
            # the 0/0 in the conditional primary share (NaN on f32 TPU)
            k1, k2 = jax.random.split(ksrc)
            n_bg = self._binomial(k1, y, probs[:, 0], max_n)
            rem = y - n_bg
            denom = 1.0 - probs[:, 0]
            p_pr = jnp.where(denom > 1e-7,
                             probs[:, 1] / jnp.maximum(denom, 1e-7), 0.0)
            n_pr = self._binomial(k2, rem, jnp.clip(p_pr, 0.0, 1.0), max_n)
            n_se = rem - n_pr
            counts3 = jnp.stack(
                [jnp.sum(n_bg), jnp.sum(n_pr), jnp.sum(n_se)])
            expo3 = jnp.stack(
                [y.shape[0] * self.dt, jnp.sum(p_act) * self.dt,
                 jnp.sum(s_act) * self.dt])
            rates = dists.gamma.sample(
                kr, self.rate_a + counts3, self.rate_b + expo3)
            # keep primary rate above background for identifiability
            rates = rates.at[1].set(jnp.maximum(rates[1], rates[0]))

            # birth/death hazards from dwell exposures + transition counts
            p_act_prev, p_act_next = p_act[:-1], p_act[1:]
            s_act_prev, s_act_next = s_act[:-1], s_act[1:]
            n_pb = jnp.sum((1 - p_act_prev) * p_act_next)
            e_pb = jnp.sum(1 - p_act_prev) * self.dt
            n_pd = jnp.sum(p_act_prev * (1 - p_act_next))
            e_pd = jnp.sum(p_act_prev) * self.dt
            n_sb = jnp.sum((1 - s_act_prev) * s_act_next * p_act_prev)
            e_sb = jnp.sum((1 - s_act_prev) * p_act_prev) * self.dt
            n_sd = jnp.sum(s_act_prev * (1 - s_act_next))
            e_sd = jnp.sum(s_act_prev) * self.dt
            birth = dists.gamma.sample(
                kb, self.hazard_a + jnp.stack([n_pb, n_sb]),
                self.hazard_b + jnp.stack([e_pb, e_sb]))
            death = dists.gamma.sample(
                kd, self.hazard_a + jnp.stack([n_pd, n_sd]),
                self.hazard_b + jnp.stack([e_pd, e_sd]))
            return {"rates": rates, "birth": birth, "death": death}

        return sweep

    def simulate(self, key, t_len, rates, birth, death):
        """Simulate (counts, states) on the grid."""
        rates = jnp.asarray(rates)
        log_trans = self._log_trans(jnp.asarray(birth), jnp.asarray(death))
        trans = jnp.exp(log_trans)
        k1, k2 = jax.random.split(key)

        def step(s, k):
            s_next = jax.random.categorical(k, log_trans[s])
            return s_next, s_next

        _, z = jax.lax.scan(step, 0, jax.random.split(k1, t_len))
        lam = self._state_rates(rates)[z] * self.dt
        counts = jax.random.poisson(k2, lam)
        return counts, z
