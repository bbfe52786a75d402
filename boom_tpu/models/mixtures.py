"""Finite mixture models via data-augmentation Gibbs.

Reference: Models/FiniteMixtureModel.hpp:32 and
Models/Mixtures/PosteriorSamplers/FiniteMixturePosteriorSampler — draw:
impute latent component indicators, then each component's conjugate draw,
then mixing weights from a Dirichlet (BASELINE config #3).

TPU-native form: responsibilities for all n observations x K components in
one batched logpdf; indicator draws as one vectorized categorical; the
per-component sufficient statistics as one-hot matmuls (MXU-friendly —
this is the reference's per-observation `mix_[z]->add_data(y)` loop
collapsed into a [n,K]^T [n,d] product). Label switching is handled at
analysis time (sorted relabeling), as in the reference's tests.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from boom_tpu import dists
from boom_tpu.models.conjugate import GaussianSuf, gaussian_mean_var_draw


@dataclasses.dataclass(frozen=True)
class GaussianMixtureModel:
    """K-component univariate Gaussian mixture with conjugate priors.

    weights ~ Dirichlet(weight_prior)
    (mu_k, sigsq_k) ~ Normal-Inverse-ChiSq(mean_guess, mean_nobs,
                                           sigma_df, sigma_guess^2)
    """

    y: jax.Array  # [n]
    num_components: int
    weight_prior: jax.Array | float = 1.0
    mean_guess: float = 0.0
    mean_nobs: float = 0.01
    sigma_df: float = 1.0
    sigma_guess: float = 1.0

    def _weight_prior_vec(self):
        return jnp.broadcast_to(jnp.asarray(self.weight_prior,
                                            self.y.dtype),
                                (self.num_components,))

    def init_state(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        k = self.num_components
        # overdispersed starts: means at random data quantiles
        qs = jax.random.uniform(k1, (k,), self.y.dtype, 0.05, 0.95)
        mu = jnp.quantile(self.y, qs)
        sigsq = jnp.full((k,), jnp.var(self.y) / k)
        weights = dists.dirichlet.sample(k2, jnp.ones(k))
        return {"mu": mu, "sigsq": sigsq, "weights": weights}

    def responsibilities(self, state):
        """log responsibilities [n, K]."""
        logp = dists.normal.logpdf(
            self.y[:, None], state["mu"][None, :],
            jnp.sqrt(state["sigsq"])[None, :])
        return logp + jnp.log(state["weights"])[None, :]

    def log_lik(self, state):
        return jax.scipy.special.logsumexp(
            self.responsibilities(state), axis=1).sum()

    def kernel(self):
        k = self.num_components

        def sweep(key, state):
            kz, kc, kw = jax.random.split(key, 3)
            # 1. impute indicators (impute_latent_data analog)
            logits = self.responsibilities(state)
            z = jax.random.categorical(kz, logits, axis=-1)  # [n]
            onehot = jax.nn.one_hot(z, k, dtype=self.y.dtype)  # [n, K]
            # 2. per-component sufstats as matmuls
            counts = onehot.sum(0)
            sums = onehot.T @ self.y
            sumsqs = onehot.T @ (self.y * self.y)
            suf = GaussianSuf(n=counts, sum=sums, sumsq=sumsqs)
            # 3. conjugate component draws, batched over K
            mu, sigsq = gaussian_mean_var_draw(
                kc, suf, self.mean_guess, self.mean_nobs,
                self.sigma_df, self.sigma_guess**2)
            # 4. mixing weights
            weights = dists.dirichlet.sample(
                kw, self._weight_prior_vec() + counts)
            return {"mu": mu, "sigsq": sigsq, "weights": weights}

        return sweep

    @staticmethod
    def simulate(key, n, weights, means, sds):
        kz, ky = jax.random.split(key)
        weights = jnp.asarray(weights)
        z = jax.random.categorical(kz, jnp.log(weights), shape=(n,))
        mu = jnp.asarray(means)[z]
        sd = jnp.asarray(sds)[z]
        return mu + sd * jax.random.normal(ky, (n,)), z


def relabel_sorted(draws_mu, *other_draws):
    """Resolve label switching by sorting components by mu per draw
    (the analysis-time analog of the reference's identify_permutation,
    Models/Mixtures/identify_permutation.cpp)."""
    order = jnp.argsort(draws_mu, axis=-1)
    take = lambda a: jnp.take_along_axis(a, order, axis=-1)  # noqa: E731
    return (take(draws_mu),) + tuple(take(o) for o in other_draws)


@dataclasses.dataclass(frozen=True)
class BetaBinomialMixture:
    """Finite mixture of beta-binomials (reference
    Models/Mixtures/BetaBinomialMixture.hpp): data are (trials, successes)
    pairs; component k has Beta(a_k, b_k) success probabilities.

    Gibbs: indicators from the exact beta-binomial marginals, then
    slice updates of each component's (log mean-odds, log concentration),
    then Dirichlet weights. State: log_odds [K], log_conc [K],
    weights [K]."""

    trials: jax.Array  # [n]
    successes: jax.Array  # [n]
    num_components: int
    weight_prior: float = 1.0
    prior_rate: float = 0.01  # weak exponential priors on odd/conc scale

    def _ab(self, log_odds, log_conc):
        conc = jnp.exp(log_conc)
        mean = jax.nn.sigmoid(log_odds)
        return mean * conc, (1.0 - mean) * conc

    def _loglik_matrix(self, log_odds, log_conc):
        a, b = self._ab(log_odds, log_conc)  # [K]
        return dists.beta_binomial.logpmf(
            self.successes[:, None], self.trials[:, None],
            a[None, :], b[None, :])

    def init_state(self, key):
        k = self.num_components
        rate = (self.successes + 0.5) / (self.trials + 1.0)
        qs = jnp.quantile(rate, jnp.linspace(0.2, 0.8, k))
        qs = jnp.clip(qs, 0.02, 0.98)
        return {"log_odds": jnp.log(qs / (1.0 - qs)),
                "log_conc": jnp.full((k,), jnp.log(10.0)),
                "weights": jnp.full((k,), 1.0 / k)}

    def kernel(self):
        from boom_tpu.inference.kernels.slice import slice_step

        k = self.num_components

        def sweep(key, state):
            kz, ko, kc, kw = jax.random.split(key, 4)
            logits = (self._loglik_matrix(state["log_odds"],
                                          state["log_conc"])
                      + jnp.log(state["weights"])[None, :])
            z = jax.random.categorical(kz, logits, axis=-1)
            onehot = jax.nn.one_hot(z, k)  # [n, K]

            def comp_loglik(log_odds, log_conc):
                ll = self._loglik_matrix(log_odds, log_conc)
                return jnp.sum(onehot * ll, axis=0)  # [K]

            log_odds = slice_step(
                ko, state["log_odds"],
                lambda v: (comp_loglik(v, state["log_conc"])
                           - self.prior_rate * jnp.abs(v)),
                width=1.0)
            log_conc = slice_step(
                kc, state["log_conc"],
                lambda v: (comp_loglik(log_odds, v)
                           - self.prior_rate * jnp.exp(
                               jnp.clip(v, None, 20.0))),
                width=1.0, lower=-3.0, upper=12.0)
            weights = dists.dirichlet.sample(
                kw, self.weight_prior + onehot.sum(0))
            return {"log_odds": log_odds, "log_conc": log_conc,
                    "weights": weights}

        return sweep


@dataclasses.dataclass(frozen=True)
class RegressionMixture:
    """Conditional finite mixture: mixture of K linear regressions
    (reference Models/Mixtures/ConditionalFiniteMixtureModel.hpp):
    y_i | z_i = k ~ N(x_i' beta_k, sigsq_k), z ~ Categorical(weights).

    Gibbs: indicators from per-component Gaussian likelihoods, then one
    BATCHED conjugate regression draw over components (weighted one-hot
    sufstats as matmuls), then Dirichlet weights."""

    x: jax.Array  # [n, p]
    y: jax.Array  # [n]
    num_components: int
    weight_prior: float = 1.0
    beta_prior_nobs: float = 0.1
    sigma_df: float = 1.0
    sigma_guess: float = 1.0

    def init_state(self, key):
        k = self.num_components
        p = self.x.shape[1]
        kb, kw = jax.random.split(key)
        beta = 0.5 * jax.random.normal(kb, (k, p))
        return {"beta": beta,
                "sigsq": jnp.full((k,), jnp.var(self.y)),
                "weights": jnp.full((k,), 1.0 / k)}

    def kernel(self):
        k = self.num_components
        p = self.x.shape[1]
        prior_prec = self.beta_prior_nobs * (
            self.x.T @ self.x) / self.x.shape[0]

        def sweep(key, state):
            kz, kb, ks, kw = jax.random.split(key, 4)
            eta = self.x @ state["beta"].T  # [n, K]
            logp = dists.normal.logpdf(
                self.y[:, None], eta, jnp.sqrt(state["sigsq"])[None, :])
            logits = logp + jnp.log(state["weights"])[None, :]
            z = jax.random.categorical(kz, logits, axis=-1)
            onehot = jax.nn.one_hot(z, k, dtype=self.y.dtype)  # [n, K]

            # batched per-component weighted sufstats (one-hot masks)
            xtx_k = jnp.einsum("nk,np,nq->kpq", onehot, self.x, self.x)
            xty_k = jnp.einsum("nk,np,n->kp", onehot, self.x, self.y)
            counts = onehot.sum(0)

            def draw_comp(kk, xtx, xty, sigsq):
                prec = prior_prec + xtx / sigsq
                return dists.mvn.sample_suf(kk, xty / sigsq, prec)

            beta = jax.vmap(draw_comp)(
                jax.random.split(kb, k), xtx_k, xty_k, state["sigsq"])
            # per-component residual SS via one-hot masking
            resid_all = self.y[:, None] - self.x @ beta.T  # [n, K]
            resid_sq = jnp.sum(onehot * resid_all**2, axis=0)
            df = self.sigma_df + counts
            ss = self.sigma_df * self.sigma_guess**2 + resid_sq
            sigsq = dists.scaled_inv_chisq.sample(ks, df, ss / df)
            weights = dists.dirichlet.sample(
                kw, self.weight_prior + counts)
            return {"beta": beta, "sigsq": sigsq, "weights": weights}

        return sweep


def identify_permutation(assignments, num_components, num_rounds: int = 3):
    """Resolve label switching from cluster-assignment draws by solving
    an assignment problem per draw (reference
    Models/Mixtures/identify_permutation.hpp:39 /
    identify_permutation.cpp): iterate (1) estimate the co-clustering
    probabilities pbar[i, k] from the current labeling, (2) for each
    draw find the label permutation maximizing agreement with pbar
    (Hungarian on cost = -sum_i pbar[i, perm(k)] 1[z_i = k]).

    Unlike sort-by-mean relabeling this works for multivariate and
    equal-mean components. Host-side numpy (analysis-time).

    assignments: [draws, n] int cluster labels.
    Returns perms [draws, K]: new_label = perms[d, old_label]."""
    import numpy as np

    from boom_tpu.numopt import linear_assignment

    z = np.asarray(assignments)
    d, n = z.shape
    k = int(num_components)
    perms = np.tile(np.arange(k), (d, 1))
    onehot = np.eye(k)[z]  # [draws, n, K]
    for _ in range(num_rounds):
        relab = np.take_along_axis(perms[:, None, :], z[..., None],
                                   axis=2)[..., 0]  # [draws, n]
        pbar = np.eye(k)[relab].mean(0)  # [n, K]
        changed = False
        for di in range(d):
            # cost[j, l]: assign old label j to new label l
            agree = onehot[di].T @ pbar  # [K, K]
            new_perm = np.arange(k)[linear_assignment(-agree)]
            if not np.array_equal(new_perm, perms[di]):
                changed = True
            perms[di] = linear_assignment(-agree)
        if not changed:
            break
    return perms


def relabel_by_permutation(perms, assignments=None, *component_draws):
    """Apply identify_permutation's output: relabeled assignments and
    component-parameter draws whose LAST axis is the component axis
    ([draws, ..., K])."""
    import numpy as np

    perms = np.asarray(perms)
    d, k = perms.shape
    out = []
    if assignments is not None:
        z = np.asarray(assignments)
        out.append(np.take_along_axis(perms[:, None, :], z[..., None],
                                      axis=2)[..., 0])
    # for params indexed by OLD label j, the value of NEW label l comes
    # from old label inv_perm[l]
    inv = np.argsort(perms, axis=1)  # [draws, K]
    for arr in component_draws:
        a = np.asarray(arr)
        idx = inv.reshape((d,) + (1,) * (a.ndim - 2) + (k,))
        out.append(np.take_along_axis(a, np.broadcast_to(
            idx, a.shape[:-1] + (k,)), axis=-1))
    return tuple(out)
