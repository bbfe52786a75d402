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
or a psum when sequences shard across devices. The parallel-prefix
(associative-scan) forward filter / forward-backward for temporal
parallelism lives in `boom_tpu.models.hmm_parallel` (the HMM analog of
statespace.parallel_kalman; use it in the few-chains long-series
regime).
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
    # O(log T)-depth associative-scan forward filter (hmm_parallel.py)
    # for the few-chains long-series regime; the sequential scan wins
    # once a large chain vmap already fills the machine
    parallel_filter: bool = False

    def _forward(self, log_lik, log_trans, log_init):
        if self.parallel_filter:
            from boom_tpu.models.hmm_parallel import (
                parallel_forward_filter,
            )

            return parallel_forward_filter(log_lik, log_trans, log_init)
        return forward_filter(log_lik, log_trans, log_init)

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
        _, ll = self._forward(self.emission_loglik(state),
                              jnp.log(state["trans"]),
                              jnp.log(state["init"]))
        return ll

    def kernel(self):
        s = self.num_states

        def sweep(key, state):
            kz, kc, kt, ki = jax.random.split(key, 4)
            # 1. impute the hidden path (HmmPosteriorSampler::draw step 1)
            log_alphas, _ = self._forward(
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


# ---------------------------------------------------------------------------
# EM (Baum-Welch) — reference HmmEmFilter (HmmFilter.hpp:116) and the
# MLE_Model mixin path (ModelTypes.hpp:138)
# ---------------------------------------------------------------------------
def pairwise_smoothed(log_lik, log_trans, log_init):
    """xi[t, i, j] = P(z_t = i, z_{t+1} = j | y_{1:T}) plus the singleton
    marginals gamma[t, s] — the HmmEmFilter E-step quantities."""
    log_alpha, loglik = forward_filter(log_lik, log_trans, log_init)

    def bstep(log_beta, ll_next):
        lb = jax.scipy.special.logsumexp(
            log_trans + (ll_next + log_beta)[None, :], axis=1)
        return lb, lb

    t_len = log_lik.shape[0]
    zero = jnp.zeros(log_lik.shape[-1:], log_lik.dtype)
    _, log_betas = jax.lax.scan(bstep, zero, log_lik[1:], reverse=True)
    log_betas = jnp.concatenate([log_betas, zero[None]], axis=0)

    lg = log_alpha + log_betas
    gamma = jax.nn.softmax(lg, axis=-1)
    # xi_t ∝ alpha_t(i) A_ij lik_{t+1}(j) beta_{t+1}(j)
    lx = (log_alpha[:-1, :, None] + log_trans[None]
          + (log_lik[1:] + log_betas[1:])[:, None, :])
    lx = lx - jax.scipy.special.logsumexp(lx, axis=(1, 2),
                                          keepdims=True)
    return gamma, jnp.exp(lx), loglik


def hmm_em_gaussian(y, num_states, iters=100, key=None, tol=1e-8):
    """Baum-Welch MLE for a Gaussian-emission HMM (reference
    HmmEmFilter + EmMixtureComponent path): returns (trans, means, sds,
    init, loglik_path). Fixed-iteration lax scan (jit-friendly)."""
    y = jnp.asarray(y)
    s = num_states
    if key is None:
        key = jax.random.key(0)
    qs = jnp.linspace(0.1, 0.9, s)
    means0 = jnp.quantile(y, qs)
    sds0 = jnp.full((s,), jnp.std(y) / s)
    trans0 = jnp.full((s, s), 0.1 / (s - 1) if s > 1 else 1.0)
    trans0 = trans0.at[jnp.arange(s), jnp.arange(s)].set(
        0.9 if s > 1 else 1.0)
    init0 = jnp.full((s,), 1.0 / s)

    def em_step(carry, _):
        trans, means, sds, init = carry
        ll = dists.normal.logpdf(y[:, None], means[None, :],
                                 sds[None, :])
        gamma, xi, loglik = pairwise_smoothed(
            ll, jnp.log(trans), jnp.log(init))
        # M-step
        w = gamma.sum(0)
        means_n = (gamma * y[:, None]).sum(0) / w
        var_n = (gamma * (y[:, None] - means_n[None, :]) ** 2).sum(0) / w
        trans_n = xi.sum(0)
        trans_n = trans_n / trans_n.sum(1, keepdims=True)
        init_n = gamma[0]
        return (trans_n, means_n, jnp.sqrt(jnp.maximum(var_n, 1e-12)),
                init_n), loglik

    (trans, means, sds, init), lls = jax.lax.scan(
        em_step, (trans0, means0, sds0, init0), None, length=iters)
    return trans, means, sds, init, lls


# ---------------------------------------------------------------------------
# GeneralHmm — reference Models/HMM/GeneralHmm.hpp: an HMM whose
# emissions are supplied as an arbitrary per-state log-likelihood
# function of user parameters; FFBS + user-supplied parameter kernels.
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class GeneralHmm:
    """HMM with pluggable emissions.

    emission_loglik(params, y) -> [T, S] log likelihoods
    draw_emission_params(key, params, y, z) -> params (one Gibbs update
      of the emission parameters given imputed states)
    init_emission_params(key) -> params pytree
    """

    y: jax.Array
    num_states: int
    emission_loglik: callable
    draw_emission_params: callable
    init_emission_params: callable
    trans_prior: float = 1.0

    def init_state(self, key):
        k1, k2 = jax.random.split(key)
        s = self.num_states
        trans = jnp.full((s, s), 1.0 / s)
        return {"emission": self.init_emission_params(k1),
                "trans": trans,
                "z": jax.random.randint(k2, (self.y.shape[0],), 0, s)}

    def kernel(self):
        s = self.num_states

        def sweep(key, state):
            kz, ke, kt = jax.random.split(key, 3)
            ll = self.emission_loglik(state["emission"], self.y)
            log_init = jnp.full((s,), -jnp.log(float(s)))
            log_alpha, _ = forward_filter(ll, jnp.log(state["trans"]),
                                          log_init)
            z = backward_sample(kz, log_alpha, jnp.log(state["trans"]))
            emission = self.draw_emission_params(
                ke, state["emission"], self.y, z)
            counts = transition_counts(z, s)
            g = jax.random.gamma(kt, counts + self.trans_prior)
            trans = g / g.sum(-1, keepdims=True)
            return {"emission": emission, "trans": trans, "z": z}

        return sweep

    def log_lik(self, state):
        ll = self.emission_loglik(state["emission"], self.y)
        log_init = jnp.full((self.num_states,),
                            -jnp.log(float(self.num_states)))
        return forward_filter(ll, jnp.log(state["trans"]), log_init)[1]


# ---------------------------------------------------------------------------
# Nested (Clickstream) HMM — reference Models/HMM/Clickstream/:
# sessions within users: a COARSE chain over session types, and within
# each session a FINE chain over page-request types whose transition
# matrix depends on the session type.
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class NestedHmm:
    """Two-level nested HMM (Clickstream's NestedHmm):

    * events y[t] in {0..V-1} arrive in sessions; session boundaries are
      marked by `new_session` [T] bool (True = t starts a new session).
    * a coarse chain H over S_coarse session types moves only at session
      boundaries; within a session, a fine chain L over S_fine states
      evolves with transition matrix A[h] and emits y via B[h, l, v].

    Gibbs: exact FFBS on the JOINT chain (h, l) — a flattened HMM over
    S_coarse * S_fine states whose transition matrix is block-structured
    (h held fixed within a session, redrawn at boundaries via the
    coarse transition), then conjugate Dirichlet draws of all tables.
    """

    y: jax.Array  # [T] int events
    new_session: jax.Array  # [T] bool
    num_coarse: int
    num_fine: int
    num_symbols: int
    prior_count: float = 0.5

    @property
    def _joint(self):
        return self.num_coarse * self.num_fine

    def _joint_trans(self, coarse_trans, fine_trans, fine_init,
                     boundary):
        """[J, J] log transition for t -> t+1 given whether t+1 starts a
        new session. Within a session: h fixed, l ~ A[h]. At a
        boundary: h ~ coarse_trans[h], l ~ fine_init[h']."""
        sc, sf = self.num_coarse, self.num_fine
        within = jnp.full((sc, sf, sc, sf), -jnp.inf)
        hh = jnp.arange(sc)
        within = within.at[hh[:, None, None], jnp.arange(sf)[None, :, None],
                           hh[:, None, None],
                           jnp.arange(sf)[None, None, :]].set(
            jnp.log(jnp.maximum(fine_trans, 1e-30)).transpose(0, 1, 2))
        across = (jnp.log(jnp.maximum(coarse_trans, 1e-30))
                  [:, None, :, None]
                  + jnp.log(jnp.maximum(fine_init, 1e-30))
                  [None, None, :, :])
        across = jnp.broadcast_to(across, (sc, sf, sc, sf))
        out = jnp.where(boundary, across, within)
        return out.reshape(self._joint, self._joint)

    def init_state(self, key):
        ks = jax.random.split(key, 5)
        sc, sf, v = self.num_coarse, self.num_fine, self.num_symbols
        t_len = self.y.shape[0]
        g1 = jax.random.gamma(ks[0], jnp.ones((sc, sc)) * 2)
        g2 = jax.random.gamma(ks[1], jnp.ones((sc, sf, sf)) * 2)
        g3 = jax.random.gamma(ks[2], jnp.ones((sc, sf)) * 2)
        g4 = jax.random.gamma(ks[3], jnp.ones((sc, sf, v)) * 2)
        return {
            "coarse_trans": g1 / g1.sum(-1, keepdims=True),
            "fine_trans": g2 / g2.sum(-1, keepdims=True),
            "fine_init": g3 / g3.sum(-1, keepdims=True),
            "emit": g4 / g4.sum(-1, keepdims=True),
            "h": jnp.zeros((t_len,), jnp.int32),
            "l": jnp.zeros((t_len,), jnp.int32),
        }

    def kernel(self):
        sc, sf, v = self.num_coarse, self.num_fine, self.num_symbols
        t_len = self.y.shape[0]
        j = self._joint

        def sweep(key, state):
            kz, k1, k2, k3, k4 = jax.random.split(key, 5)
            # emission loglik on the joint state axis
            ll_full = jnp.log(jnp.maximum(
                state["emit"][:, :, self.y], 1e-30))  # [sc, sf, T]
            ll = ll_full.reshape(j, t_len).T  # [T, J]
            # time-varying joint transition: depends on boundary at t+1
            lt_within = self._joint_trans(
                state["coarse_trans"], state["fine_trans"],
                state["fine_init"], False)
            lt_across = self._joint_trans(
                state["coarse_trans"], state["fine_trans"],
                state["fine_init"], True)

            # forward pass with per-step transition choice
            log_init = (jnp.log(jnp.full((sc,), 1.0 / sc))[:, None]
                        + jnp.log(jnp.maximum(state["fine_init"],
                                              1e-30))).reshape(j)

            def fstep(carry, inp):
                la, _ = carry
                ll_t, is_boundary = inp
                lt = jnp.where(is_boundary, lt_across, lt_within)
                nxt = jax.scipy.special.logsumexp(
                    la[:, None] + lt, axis=0) + ll_t
                norm = jax.scipy.special.logsumexp(nxt)
                return (nxt - norm, norm), (nxt - norm)

            first = log_init + ll[0]
            first = first - jax.scipy.special.logsumexp(first)
            (_, _), las = jax.lax.scan(
                fstep, (first, 0.0),
                (ll[1:], self.new_session[1:]))
            log_alphas = jnp.concatenate([first[None], las], axis=0)

            # backward sampling with the matching per-step transition
            def bstep(z_next, inp):
                la_t, is_boundary, k = inp
                lt = jnp.where(is_boundary, lt_across, lt_within)
                logits = la_t + lt[:, z_next]
                z = jax.random.categorical(k, logits)
                return z, z

            kz1, kz2 = jax.random.split(kz)
            z_last = jax.random.categorical(kz1, log_alphas[-1])
            keys_b = jax.random.split(kz2, t_len - 1)
            _, zs_rev = jax.lax.scan(
                bstep, z_last,
                (log_alphas[:-1], self.new_session[1:], keys_b),
                reverse=True)
            z = jnp.concatenate([zs_rev, z_last[None]])
            h = jnp.asarray(z // sf, jnp.int32)
            l = jnp.asarray(z % sf, jnp.int32)

            # conjugate table draws
            pc = self.prior_count
            bnd = self.new_session
            # coarse transitions at boundaries (h_prev -> h)
            cc = jnp.zeros((sc, sc))
            cc = cc.at[h[:-1], h[1:]].add(
                jnp.asarray(bnd[1:], cc.dtype))
            g = jax.random.gamma(k1, cc + pc)
            coarse_trans = g / g.sum(-1, keepdims=True)
            # fine transitions within sessions (per h)
            cf = jnp.zeros((sc, sf, sf))
            cf = cf.at[h[1:], l[:-1], l[1:]].add(
                jnp.asarray(~bnd[1:], cf.dtype))
            g = jax.random.gamma(k2, cf + pc)
            fine_trans = g / g.sum(-1, keepdims=True)
            # fine initials at boundaries (incl t = 0)
            ci = jnp.zeros((sc, sf))
            ci = ci.at[h, l].add(jnp.asarray(bnd, ci.dtype))
            g = jax.random.gamma(k3, ci + pc)
            fine_init = g / g.sum(-1, keepdims=True)
            # emissions
            ce = jnp.zeros((sc, sf, v))
            ce = ce.at[h, l, self.y].add(1.0)
            g = jax.random.gamma(k4, ce + pc)
            emit = g / g.sum(-1, keepdims=True)
            return {"coarse_trans": coarse_trans,
                    "fine_trans": fine_trans, "fine_init": fine_init,
                    "emit": emit, "h": h, "l": l}

        return sweep
