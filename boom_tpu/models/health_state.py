"""Health-state HMM with treatment-dependent transitions.

Reference: Models/HMM/HealthStateModel.hpp:80 — a hidden Markov model
for panels of subjects where each time period's transition matrix is
chosen by the subject's TREATMENT group (one MarkovModel per treatment,
`mark(int treatment)`), emissions come from per-state mixture
components, and a period in which the subject switched treatment uses a
fraction-weighted mixture of the two treatments' transition matrices
(HealthStateData::split_treatment; `sample_treatment` attributes each
realized transition to one of the two regimes for the Markov sufstats).

TPU form: subjects vmap; the forward pass is a lax.scan with a
TIME-VARYING log-transition tensor gathered from the per-treatment
stack; transition attribution and all conjugate draws are batched
one-hot reductions (no per-subject loops).

State: z [N, T] latent health states; trans [K, S, S] per-treatment
transition matrices; pi0 [S]; mu [S], sigsq [S] Gaussian emissions.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from boom_tpu import dists


def forward_filter_tv(log_lik, log_trans_t, log_init):
    """Forward pass with per-step transition matrices.

    log_lik: [T, S]; log_trans_t: [T-1, S, S] (row = from);
    log_init: [S]. Returns (log_alpha [T, S] normalized, loglike)."""

    def step(carry, inp):
        log_alpha, total = carry
        ll_t, lt = inp
        pred = jax.scipy.special.logsumexp(
            log_alpha[:, None] + lt, axis=0)
        la = pred + ll_t
        norm = jax.scipy.special.logsumexp(la)
        return (la - norm, total + norm), la - norm

    la0 = log_init + log_lik[0]
    n0 = jax.scipy.special.logsumexp(la0)
    (_, loglike), log_alphas = jax.lax.scan(
        step, (la0 - n0, n0), (log_lik[1:], log_trans_t))
    log_alphas = jnp.concatenate([(la0 - n0)[None], log_alphas],
                                 axis=0)
    return log_alphas, loglike


def backward_sample_tv(key, log_alphas, log_trans_t):
    """FFBS backward draw with per-step transitions."""
    t_len = log_alphas.shape[0]
    k_last, k_scan = jax.random.split(key)
    z_last = jax.random.categorical(k_last, log_alphas[-1])

    def step(z_next, inp):
        la_t, lt, k = inp
        logits = la_t + lt[:, z_next]
        z_t = jax.random.categorical(k, logits)
        return z_t, z_t

    keys = jax.random.split(k_scan, t_len - 1)
    _, zs = jax.lax.scan(step, z_last,
                         (log_alphas[:-1], log_trans_t, keys),
                         reverse=True)
    return jnp.concatenate([zs, z_last[None]])


@dataclasses.dataclass(frozen=True)
class HealthStateModel:
    """Gaussian-emission health-state HMM over a subject panel.

    y: [N, T] observations; treatment: [N, T] int in [0, K) — the
    treatment group at the END of each period; the transition INTO
    period t is governed by treatment[:, t].  initial_treatment /
    final_fraction implement HealthStateData::split_treatment: the
    transition matrix for a split period is the fraction-weighted
    mixture (1-f) * P[initial] + f * P[final], and the latent
    attribution is sampled per transition (reference
    HealthStateModel::sample_treatment)."""

    y: jax.Array  # [N, T]
    treatment: jax.Array  # [N, T] int
    num_states: int
    num_treatments: int
    initial_treatment: jax.Array | None = None  # [N, T] int
    final_fraction: jax.Array | None = None  # [N, T] in (0, 1]
    trans_prior: float = 1.0
    pi0_prior: float = 1.0
    mean_guess: float = 0.0
    mean_nobs: float = 0.01
    sigma_df: float = 1.0
    sigma_guess: float = 1.0

    def _fractions(self):
        init_t = (self.treatment if self.initial_treatment is None
                  else self.initial_treatment)
        frac = (jnp.ones_like(self.y)
                if self.final_fraction is None else self.final_fraction)
        return init_t, frac

    def init_state(self, key):
        s, k = self.num_states, self.num_treatments
        kq, kz = jax.random.split(key)
        # overdispersed: states from data quantile bins
        qs = jnp.quantile(self.y, jnp.linspace(0.0, 1.0, s + 1))
        z0 = jnp.clip(jnp.searchsorted(qs[1:-1], self.y), 0, s - 1)
        mu = jnp.quantile(self.y, (jnp.arange(s) + 0.5) / s)
        return {
            "z": z0.astype(jnp.int32),
            "trans": jnp.full((k, s, s), 1.0 / s, self.y.dtype),
            "pi0": jnp.full((s,), 1.0 / s, self.y.dtype),
            "mu": mu,
            "sigsq": jnp.full((s,), jnp.var(self.y) / s),
        }

    def _log_trans_t(self, trans):
        """[N, T-1, S, S] per-subject per-period log transition mix."""
        init_t, frac = self._fractions()
        p_final = trans[self.treatment[:, 1:]]  # [N, T-1, S, S]
        p_init = trans[init_t[:, 1:]]
        f = frac[:, 1:, None, None]
        return jnp.log(jnp.clip((1.0 - f) * p_init + f * p_final,
                                1e-300, None))

    def kernel(self):
        s, k = self.num_states, self.num_treatments
        n, t_len = self.y.shape

        def sweep(key, state):
            kz, ka, kt, kp, km = jax.random.split(key, 5)
            # 1. FFBS per subject with the treatment-mixed transitions
            log_lik = dists.normal.logpdf(
                self.y[..., None], state["mu"],
                jnp.sqrt(state["sigsq"]))  # [N, T, S]
            ltt = self._log_trans_t(state["trans"])
            log_init = jnp.log(jnp.clip(state["pi0"], 1e-300, None))

            def one(kk, ll, lt):
                la, _ = forward_filter_tv(ll, lt, log_init)
                return backward_sample_tv(kk, la, lt)

            z = jax.vmap(one)(jax.random.split(kz, n), log_lik, ltt)

            # 2. attribute each transition to a regime, then conjugate
            # Dirichlet rows per treatment (sample_treatment analog)
            init_t, frac = self._fractions()
            z_from, z_to = z[:, :-1], z[:, 1:]
            p_fin = state["trans"][self.treatment[:, 1:], z_from, z_to]
            p_ini = state["trans"][init_t[:, 1:], z_from, z_to]
            f = frac[:, 1:]
            w_fin = f * p_fin
            w_ini = (1.0 - f) * p_ini
            pick_final = jax.random.uniform(ka, w_fin.shape) * (
                w_fin + w_ini) < w_fin
            regime = jnp.where(pick_final, self.treatment[:, 1:],
                               init_t[:, 1:])
            # [K, S, S] counts via one scatter-add on flat indices
            flat = ((regime * s + z_from) * s + z_to).reshape(-1)
            counts = jnp.zeros((k * s * s,), self.y.dtype).at[flat].add(
                1.0).reshape(k, s, s)
            trans = dists.dirichlet.sample(
                kt, self.trans_prior + counts)  # rows batched

            # 3. initial distribution
            init_counts = jnp.zeros((s,), self.y.dtype).at[z[:, 0]].add(
                1.0)
            pi0 = dists.dirichlet.sample(kp, self.pi0_prior + init_counts)

            # 4. Gaussian emissions (batched conjugate)
            from boom_tpu.models.conjugate import (
                GaussianSuf, gaussian_mean_var_draw,
            )

            onehot = jax.nn.one_hot(z.reshape(-1), s, dtype=self.y.dtype)
            yf = self.y.reshape(-1)
            suf = GaussianSuf(n=onehot.sum(0), sum=onehot.T @ yf,
                              sumsq=onehot.T @ (yf * yf))
            mu, sigsq = gaussian_mean_var_draw(
                km, suf, self.mean_guess, self.mean_nobs,
                self.sigma_df, self.sigma_guess**2)
            return {"z": z.astype(jnp.int32), "trans": trans,
                    "pi0": pi0, "mu": mu, "sigsq": sigsq}

        return sweep

    @staticmethod
    def simulate(key, n, t_len, trans, means, sds, treatment):
        """Simulate a panel given [K, S, S] trans and [N, T] treatment."""
        trans = jnp.asarray(trans)
        means = jnp.asarray(means)
        sds = jnp.asarray(sds)
        s = means.shape[0]
        kz, ky = jax.random.split(key)

        def one(kk, treat_row):
            k0, ks = jax.random.split(kk)
            z0 = jax.random.randint(k0, (), 0, s)

            def step(z, inp):
                tr, k_ = inp
                z_new = jax.random.categorical(
                    k_, jnp.log(jnp.clip(trans[tr, z], 1e-300, None)))
                return z_new, z_new

            _, zs = jax.lax.scan(
                step, z0, (treat_row[1:], jax.random.split(ks,
                                                           t_len - 1)))
            return jnp.concatenate([z0[None], zs])

        z = jax.vmap(one)(jax.random.split(kz, n), treatment)
        y = means[z] + sds[z] * jax.random.normal(ky, (n, t_len))
        return z, y
