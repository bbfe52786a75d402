"""Hidden Markov models: vectorized forward-backward and FFBS Gibbs.

Reference: Models/HMM/HMM2.hpp:43 (HiddenMarkovModel), HmmFilter.cpp:84
(fwd — the O(T S^2) forward pass) and :130 (bkwd_sampling_mt — stochastic
backward pass), HmmPosteriorSampler.cpp:35 (draw = impute latent states,
then component draws, then Markov conjugate draw). BASELINE config #4.

TPU-native form: the forward recursion is a `lax.scan` whose body is a
[S] x [S, S] matvec (batched over chains via vmap, so the device sees
[chains, S] x [S, S] matmuls); backward sampling is a reverse scan of
categorical draws. The reference parallelizes over *sequences* with a
thread pool and merges sufstats (HMM2.cpp:319-339 `combine_data`); here
multiple sequences are just a leading vmap axis and the merge is a sum —
or a psum when sequences shard across devices. A parallel-prefix
(associative-scan) filter for temporal parallelism lives in
`boom_tpu.statespace` (shared with the Kalman filter).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from boom_tpu import dists
from boom_tpu.models.conjugate import GaussianSuf, gaussian_mean_var_draw


def forward_filter(log_lik, log_trans, log_init):
    """Normalized forward pass.

    log_lik: [T, S] per-time emission log likelihoods
    log_trans: [S, S] (row = from, col = to) log transition matrix
    log_init: [S]
    Returns (log_alpha [T, S] normalized per t, loglike scalar).
    """

    def step(carry, ll_t):
        log_alpha, total = carry
        # predict: logsumexp over previous state
        pred = jax.scipy.special.logsumexp(
            log_alpha[:, None] + log_trans, axis=0)
        la = pred + ll_t
        norm = jax.scipy.special.logsumexp(la)
        return (la - norm, total + norm), la - norm

    la0 = log_init + log_lik[0]
    n0 = jax.scipy.special.logsumexp(la0)
    (_, loglike), log_alphas = jax.lax.scan(
        step, (la0 - n0, n0), log_lik[1:])
    log_alphas = jnp.concatenate([(la0 - n0)[None], log_alphas], axis=0)
    return log_alphas, loglike


def backward_sample(key, log_alphas, log_trans):
    """Stochastic backward pass (FFBS): draw z_{1:T} | y
    (reference HmmFilter::bkwd_sampling_mt, HmmFilter.cpp:130)."""
    t_len = log_alphas.shape[0]
    k_last, k_scan = jax.random.split(key)
    z_last = jax.random.categorical(k_last, log_alphas[-1])

    def step(z_next, inp):
        la_t, k = inp
        logits = la_t + log_trans[:, z_next]
        z_t = jax.random.categorical(k, logits)
        return z_t, z_t

    keys = jax.random.split(k_scan, t_len - 1)
    _, zs = jax.lax.scan(step, z_last,
                         (log_alphas[:-1], keys), reverse=True)
    return jnp.concatenate([zs, z_last[None]])


def smoothed_marginals(log_lik, log_trans, log_init):
    """Forward-backward smoothing: P(z_t = s | y_{1:T}) — the HmmEmFilter
    analog (reference HmmFilter.hpp:116) for EM and posterior summaries."""
    log_alphas, loglike = forward_filter(log_lik, log_trans, log_init)

    def step(log_beta, ll_next):
        lb = jax.scipy.special.logsumexp(
            log_trans + (ll_next + log_beta)[None, :], axis=1)
        return lb, lb

    s = log_lik.shape[1]
    init_beta = jnp.zeros(s, log_lik.dtype)
    _, log_betas = jax.lax.scan(step, init_beta, log_lik[1:],
                                reverse=True)
    log_betas = jnp.concatenate([log_betas, init_beta[None]], axis=0)
    post = log_alphas + log_betas
    post = post - jax.scipy.special.logsumexp(post, axis=1, keepdims=True)
    return jnp.exp(post), loglike


def transition_counts(z, num_states):
    """[S, S] transition count matrix from a state path (one-hot matmul —
    the MarkovSuf analog, reference Models/MarkovModel.hpp)."""
    onehot = jax.nn.one_hot(z, num_states)
    return onehot[:-1].T @ onehot[1:]


@dataclasses.dataclass(frozen=True)
class GaussianHmm:
    """HMM with Gaussian emissions and conjugate priors.

    transition rows ~ Dirichlet(trans_prior)
    initial dist ~ Dirichlet(init_prior) (sampled with the path's first
    state as a single multinomial observation)
    (mu_s, sigsq_s) ~ Normal-Inverse-ChiSq.
    """

    y: jax.Array  # [T]
    num_states: int
    trans_prior: float = 1.0
    init_prior: float = 1.0
    mean_guess: float = 0.0
    mean_nobs: float = 0.01
    sigma_df: float = 1.0
    sigma_guess: float = 1.0

    def init_state(self, key):
        s = self.num_states
        k1, k2, k3 = jax.random.split(key, 3)
        qs = jax.random.uniform(k1, (s,), self.y.dtype, 0.05, 0.95)
        mu = jnp.quantile(self.y, qs)
        sigsq = jnp.full((s,), jnp.var(self.y) / s)
        trans = dists.dirichlet.sample(k2, jnp.full((s, s), 5.0))
        init = jnp.full((s,), 1.0 / s)
        return {"mu": mu, "sigsq": sigsq, "trans": trans, "init": init}

    def emission_loglik(self, state):
        """[T, S]."""
        return dists.normal.logpdf(
            self.y[:, None], state["mu"][None, :],
            jnp.sqrt(state["sigsq"])[None, :])

    def log_lik(self, state):
        _, ll = forward_filter(self.emission_loglik(state),
                               jnp.log(state["trans"]),
                               jnp.log(state["init"]))
        return ll

    def kernel(self):
        s = self.num_states

        def sweep(key, state):
            kz, kc, kt, ki = jax.random.split(key, 4)
            # 1. impute the hidden path (HmmPosteriorSampler::draw step 1)
            log_alphas, _ = forward_filter(
                self.emission_loglik(state), jnp.log(state["trans"]),
                jnp.log(state["init"]))
            z = backward_sample(kz, log_alphas, jnp.log(state["trans"]))
            onehot = jax.nn.one_hot(z, s, dtype=self.y.dtype)
            # 2. emission conjugate draws
            suf = GaussianSuf(
                n=onehot.sum(0),
                sum=onehot.T @ self.y,
                sumsq=onehot.T @ (self.y * self.y))
            mu, sigsq = gaussian_mean_var_draw(
                kc, suf, self.mean_guess, self.mean_nobs,
                self.sigma_df, self.sigma_guess**2)
            # 3. Markov conjugate draws (MarkovConjSampler analog)
            counts = onehot[:-1].T @ onehot[1:]
            trans = dists.dirichlet.sample(
                kt, jnp.asarray(self.trans_prior, self.y.dtype) + counts)
            init = dists.dirichlet.sample(
                ki, jnp.asarray(self.init_prior, self.y.dtype) + onehot[0])
            return {"mu": mu, "sigsq": sigsq, "trans": trans, "init": init}

        return sweep

    @staticmethod
    def simulate(key, t_len, trans, means, sds, init=None):
        trans = jnp.asarray(trans)
        s = trans.shape[0]
        init = jnp.full((s,), 1.0 / s) if init is None else jnp.asarray(init)
        kz0, kz, ky = jax.random.split(key, 3)
        z0 = jax.random.categorical(kz0, jnp.log(init))

        def step(z, k):
            z_next = jax.random.categorical(k, jnp.log(trans)[z])
            return z_next, z_next

        _, zs = jax.lax.scan(step, z0, jax.random.split(kz, t_len - 1))
        z = jnp.concatenate([z0[None], zs])
        y = (jnp.asarray(means)[z]
             + jnp.asarray(sds)[z] * jax.random.normal(ky, (t_len,)))
        return y, z


@dataclasses.dataclass(frozen=True)
class CategoricalHmm:
    """HMM with categorical emissions (reference HMM2.hpp with
    multinomial mixture components): FFBS Gibbs with conjugate Dirichlet
    draws for both the transition matrix and the emission rows.

    State: trans [S, S], emit [S, V], init [S]."""

    y: jax.Array  # [T] ints in [0, V)
    num_states: int
    num_symbols: int
    trans_prior: float = 1.0
    emit_prior: float = 1.0

    def init_state(self, key):
        s, v = self.num_states, self.num_symbols
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "trans": dists.dirichlet.sample(
                k1, jnp.full((s, s), 1.0) + 3.0 * jnp.eye(s)),
            "emit": dists.dirichlet.sample(k2, jnp.full((s, v), 1.0)),
            "init": dists.dirichlet.sample(k3, jnp.full((s,), 1.0)),
        }

    def kernel(self):
        s, v = self.num_states, self.num_symbols
        onehot_y = jax.nn.one_hot(self.y, v)

        def sweep(key, state):
            kz, kt, ke, ki = jax.random.split(key, 4)
            log_emit = jnp.log(jnp.clip(state["emit"], 1e-300, None))
            log_lik = onehot_y @ log_emit.T  # [T, S]
            log_trans = jnp.log(jnp.clip(state["trans"], 1e-300, None))
            log_init = jnp.log(jnp.clip(state["init"], 1e-300, None))
            log_alpha, _ = forward_filter(log_lik, log_trans, log_init)
            z = backward_sample(kz, log_alpha, log_trans)
            zoh = jax.nn.one_hot(z, s)
            trans = dists.dirichlet.sample(
                kt, self.trans_prior + zoh[:-1].T @ zoh[1:])
            emit = dists.dirichlet.sample(
                ke, self.emit_prior + zoh.T @ onehot_y)
            init = dists.dirichlet.sample(ki, 1.0 + zoh[0])
            return {"trans": trans, "emit": emit, "init": init}

        return sweep

    @staticmethod
    def simulate(key, t_len, trans, emit, init):
        from boom_tpu.models.markov import MarkovModel

        k1, k2 = jax.random.split(key)
        z = MarkovModel.simulate(k1, t_len, jnp.asarray(trans),
                                 jnp.asarray(init))
        logits = jnp.log(jnp.clip(jnp.asarray(emit)[z], 1e-300, None))
        y = jax.random.categorical(k2, logits, axis=-1)
        return y, z
