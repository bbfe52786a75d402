"""Hierarchical (multi-group) models with conjugate group draws.

Reference: Models/Hierarchical — HierarchicalGaussianRegressionModel,
HierarchicalPoissonModel, HierarchicalGammaModel, HierarchicalDirichlet
(+ HierarchicalPosteriorSampler: per-group conjugate draws followed by
hyperparameter draws given the group-level parameters).

TPU form: the per-group draws are ONE batched conjugate draw over the
group axis (the reference loops groups serially); hyperparameter draws
consume group-level sufstats via fixed reductions. Groups of unequal
size use segment sums into fixed [G] shapes.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from boom_tpu import dists
from boom_tpu.inference.kernels.slice import slice_step


def group_sufstats(y, group, num_groups):
    """Per-group (n, sum, sumsq) via segment sums (fixed shape [G])."""
    ones = jnp.ones_like(y)
    n = jax.ops.segment_sum(ones, group, num_groups)
    s = jax.ops.segment_sum(y, group, num_groups)
    ss = jax.ops.segment_sum(y * y, group, num_groups)
    return n, s, ss


@dataclasses.dataclass(frozen=True)
class HierarchicalGaussian:
    """y_ij ~ N(mu_j, sigsq); mu_j ~ N(mu0, tausq); flat-ish conjugate
    hyperpriors (reference HierarchicalGaussianRegressionModel's
    intercept-only core; the eight-schools structure). State: mu [G],
    mu0, tausq, sigsq."""

    y: jax.Array  # [n]
    group: jax.Array  # [n] ints in [0, G)
    num_groups: int
    mu0_mean: float = 0.0
    mu0_nobs: float = 1e-3
    tau_df: float = 1.0
    tau_guess: float = 1.0
    sigma_df: float = 1.0
    sigma_guess: float = 1.0

    def init_state(self, key):
        n, s, _ = group_sufstats(self.y, self.group, self.num_groups)
        mu = s / jnp.maximum(n, 1.0)
        return {"mu": mu, "mu0": jnp.mean(self.y),
                "tausq": jnp.var(self.y) / 2.0 + 1e-3,
                "sigsq": jnp.var(self.y) / 2.0 + 1e-3}

    def kernel(self):
        g = self.num_groups
        n, s, ss = group_sufstats(self.y, self.group, g)
        n_total = self.y.shape[0]

        def sweep(key, state):
            km, k0, kt, ks = jax.random.split(key, 4)
            sigsq, tausq = state["sigsq"], state["tausq"]
            # group means | rest (batched conjugate normal)
            prec = n / sigsq + 1.0 / tausq
            mean = (s / sigsq + state["mu0"] / tausq) / prec
            mu = mean + jax.random.normal(km, (g,), mean.dtype) / jnp.sqrt(
                prec)
            # hypermean | group means
            prec0 = g / tausq + self.mu0_nobs
            mean0 = (jnp.sum(mu) / tausq
                     + self.mu0_nobs * self.mu0_mean) / prec0
            mu0 = mean0 + jax.random.normal(k0, (), mean.dtype) / jnp.sqrt(
                prec0)
            # tausq | group means (scaled inv chisq)
            ss_tau = jnp.sum((mu - mu0) ** 2)
            df_t = self.tau_df + g
            tausq = dists.scaled_inv_chisq.sample(
                kt, df_t,
                (self.tau_df * self.tau_guess**2 + ss_tau) / df_t)
            # sigsq | mu (residual SS via group sufstats)
            ss_resid = jnp.sum(ss - 2.0 * mu * s + n * mu * mu)
            df_s = self.sigma_df + n_total
            sigsq = dists.scaled_inv_chisq.sample(
                ks, df_s,
                (self.sigma_df * self.sigma_guess**2 + ss_resid) / df_s)
            return {"mu": mu, "mu0": mu0, "tausq": tausq, "sigsq": sigsq}

        return sweep


@dataclasses.dataclass(frozen=True)
class HierarchicalPoisson:
    """events_j ~ Poisson(lam_j * exposure_j); lam_j ~ Gamma(a, b);
    hyper (a, b) sampled by slice on their log posterior (reference
    HierarchicalPoissonModel + PoissonGammaPosteriorSampler). State:
    lam [G], a, b."""

    events: jax.Array  # [G]
    exposure: jax.Array  # [G]
    a_prior_rate: float = 0.1
    b_prior_rate: float = 0.1

    @property
    def num_groups(self):
        return self.events.shape[0]

    def init_state(self, key):
        lam = (self.events + 0.5) / self.exposure
        m = jnp.mean(lam)
        v = jnp.var(lam) + 1e-6
        a0 = jnp.clip(m * m / v, 0.1, 1e3)
        return {"lam": lam, "a": a0, "b": a0 / m}

    def kernel(self):
        g = self.num_groups

        def sweep(key, state):
            kl, ka, kb = jax.random.split(key, 3)
            # group rates | hyper (batched conjugate gamma)
            lam = dists.gamma.sample(
                kl, state["a"] + self.events,
                state["b"] + self.exposure)
            sum_lam = jnp.sum(lam)
            sum_log = jnp.sum(jnp.log(lam))

            # b | a, lam conjugate gamma
            b = dists.gamma.sample(kb, 1.0 + g * state["a"],
                                   self.b_prior_rate + sum_lam)

            def a_logpost(a):
                return (g * (a * jnp.log(b)
                             - jax.scipy.special.gammaln(a))
                        + (a - 1.0) * sum_log - self.a_prior_rate * a)

            a = slice_step(ka, state["a"], a_logpost, width=1.0,
                           lower=1e-3, upper=1e4)
            return {"lam": lam, "a": a, "b": b}

        return sweep


@dataclasses.dataclass(frozen=True)
class HierarchicalGamma:
    """y_ij ~ Gamma(nu, nu / mu_j) (mean mu_j); mu_j ~ InverseGamma-ish
    via conjugate rate draws; shared shape nu slice-sampled (reference
    HierarchicalGammaModel). State: mu [G], nu."""

    y: jax.Array
    group: jax.Array
    num_groups: int
    mu_prior_shape: float = 1.0
    mu_prior_rate: float = 1.0
    nu_prior_rate: float = 0.1

    def init_state(self, key):
        n, s, _ = group_sufstats(self.y, self.group, self.num_groups)
        mu = (s + 1.0) / (n + 1.0)
        return {"mu": mu, "nu": jnp.asarray(2.0)}

    def kernel(self):
        g = self.num_groups
        n, s, _ = group_sufstats(self.y, self.group, g)
        sum_log_all = jnp.sum(jnp.log(jnp.maximum(self.y, 1e-300)))
        n_total = self.y.shape[0]

        def sweep(key, state):
            km, kn = jax.random.split(key)
            nu = state["nu"]
            # Gibbs on (theta, nu) with theta_j the Gamma rate: y_ij ~
            # Gamma(nu, theta_j), theta_j ~ Gamma(a0, b0) conjugate.
            theta = dists.gamma.sample(
                km, self.mu_prior_shape + n * nu,
                self.mu_prior_rate + s)

            # nu | theta, y: sum_j n_j nu log theta_j - n lgamma(nu)
            #   + (nu - 1) sum log y   (the -theta*s term is nu-free)
            def nu_logpost(v):
                return (jnp.sum(n * v * jnp.log(theta))
                        - n_total * jax.scipy.special.gammaln(v)
                        + (v - 1.0) * sum_log_all
                        - self.nu_prior_rate * v)

            nu = slice_step(kn, nu, nu_logpost, width=0.5,
                            lower=1e-2, upper=1e3)
            # report the group means mu_j = nu / theta_j
            return {"mu": nu / theta, "nu": nu}

        return sweep


@dataclasses.dataclass(frozen=True)
class HierarchicalDirichlet:
    """Groups of multinomial counts with a shared Dirichlet prior:
    pi_g ~ Dirichlet(nu) with nu = alpha * phi (reference
    Models/Hierarchical/HierarchicalDirichletModel.hpp:49; nu drawn by
    coordinate slice as in MultinomialDirichletSampler +
    DirichletPosteriorSampler).

    State: pi [G, K] group probabilities, nu [K] (alpha = sum nu,
    phi = nu / alpha)."""

    counts: jax.Array  # [G, K]
    nu_prior_rate: float = 0.1  # exponential prior on each nu_k

    @property
    def num_groups(self):
        return self.counts.shape[0]

    @property
    def dim(self):
        return self.counts.shape[1]

    def init_state(self, key):
        tot = jnp.sum(self.counts, 1, keepdims=True)
        pi = (self.counts + 1.0) / (tot + self.dim)
        nu = jnp.mean(pi, 0) * 2.0 * self.dim
        return {"pi": pi, "nu": nu}

    def kernel(self):
        g, k = self.counts.shape

        def sweep(key, state):
            kp, kn = jax.random.split(key)
            # 1. group probabilities | nu (batched conjugate Dirichlet)
            pi = dists.dirichlet.sample(kp, state["nu"] + self.counts)
            sum_log_pi = jnp.sum(jnp.log(jnp.maximum(pi, 1e-300)), 0)

            # 2. nu | pi: coordinate slice sweep (coords couple through
            # lgamma(sum nu), so one-at-a-time with a fixed-trip scan)
            def body(nu, inp):
                j, kj = inp
                ej = jax.nn.one_hot(j, k, dtype=nu.dtype)

                def target(v):
                    nu_j = nu * (1.0 - ej) + v * ej
                    tot = jnp.sum(nu_j)
                    return (g * (jax.scipy.special.gammaln(tot)
                                 - jax.scipy.special.gammaln(
                                     jnp.maximum(v, 1e-12)))
                            + (v - 1.0) * sum_log_pi[j]
                            - self.nu_prior_rate * v)

                v_new = slice_step(kj, nu[j], target, width=1.0,
                                   lower=1e-6, upper=1e6)
                return nu * (1.0 - ej) + v_new * ej, None

            keys = jax.random.split(kn, k)
            nu, _ = jax.lax.scan(body, state["nu"],
                                 (jnp.arange(k), keys))
            return {"pi": pi, "nu": nu}

        return sweep


@dataclasses.dataclass(frozen=True)
class HierarchicalGaussianRegression:
    """Per-group regressions with an MVN prior on coefficients:
    y[i,g] ~ N(x[i,g]' beta_g, sigsq), beta_g ~ MVN(mu, V)
    (reference Hierarchical/HierarchicalGaussianRegressionModel.hpp:37 +
    its posterior sampler: per-group conjugate beta draws, then
    (mu, V) from the MVN conjugate, then the shared sigsq).

    TPU form: group sufstats [G,p,p]/[G,p] are one einsum; the G
    per-group beta draws are ONE vmapped Cholesky solve. State:
    beta [G, p], mu [p], V [p, p], sigsq."""

    x: jax.Array  # [n, p]
    y: jax.Array  # [n]
    group: jax.Array  # [n] ints in [0, G)
    num_groups: int
    mu_nobs: float = 1e-3  # vague N(0, V / mu_nobs) hyperprior on mu
    v_df: float | None = None  # IW prior df (default p + 2)
    sigma_df: float = 1.0
    sigma_guess: float = 1.0

    def _sufstats(self):
        g = self.num_groups
        onehot = jax.nn.one_hot(self.group, g, dtype=self.x.dtype)
        xtx = jnp.einsum("ng,ni,nj->gij", onehot, self.x, self.x)
        xty = jnp.einsum("ng,ni,n->gi", onehot, self.x, self.y)
        yty = jax.ops.segment_sum(self.y * self.y, self.group, g)
        n = jnp.sum(onehot, 0)
        return xtx, xty, yty, n

    def init_state(self, key):
        p = self.x.shape[1]
        g = self.num_groups
        xtx, xty, _, _ = self._sufstats()
        ridge = jnp.eye(p, dtype=self.x.dtype)
        beta = jax.vmap(jnp.linalg.solve)(xtx + ridge, xty)
        return {"beta": beta, "mu": jnp.mean(beta, 0),
                "V": jnp.eye(p, dtype=self.x.dtype),
                "sigsq": jnp.var(self.y)}

    def kernel(self):
        p = self.x.shape[1]
        g = self.num_groups
        xtx, xty, yty, n = self._sufstats()
        n_total = self.x.shape[0]
        v_df0 = self.v_df if self.v_df is not None else p + 2.0
        v_ss0 = jnp.eye(p, dtype=self.x.dtype) * v_df0

        def sweep(key, state):
            kb, km, kv, ks = jax.random.split(key, 4)
            sigsq = state["sigsq"]
            vinv = jnp.linalg.inv(state["V"])
            vinv = 0.5 * (vinv + vinv.T)
            # 1. beta_g | rest (batched over G)
            prec = xtx / sigsq + vinv  # [G, p, p]
            rhs = xty / sigsq + vinv @ state["mu"]  # [G, p]
            chol = jnp.linalg.cholesky(prec)
            mean = jax.vmap(
                lambda c, r: jax.scipy.linalg.cho_solve((c, True), r))(
                    chol, rhs)
            beta = jax.vmap(
                lambda m, c, k_: dists.mvn.sample_prec(
                    k_, m, prec_chol=c))(
                mean, chol, jax.random.split(kb, g))
            # 2. mu | beta, V (conjugate MVN, vague mu_nobs prior)
            prec_mu = (g + self.mu_nobs) * vinv
            mean_mu = jnp.sum(beta, 0) / (g + self.mu_nobs)
            mu = dists.mvn.sample_prec(km, mean_mu, prec_mu)
            # 3. V | beta, mu (inverse Wishart)
            dev = beta - mu
            ss = v_ss0 + dev.T @ dev
            vinv_new = dists.wishart.sample(
                kv, v_df0 + g, jnp.linalg.inv(0.5 * (ss + ss.T)))
            v = jnp.linalg.inv(vinv_new)
            v = 0.5 * (v + v.T)
            # 4. sigsq | beta (shared residual variance)
            resid_ss = jnp.sum(
                yty - 2.0 * jnp.einsum("gi,gi->g", beta, xty)
                + jnp.einsum("gi,gij,gj->g", beta, xtx, beta))
            df = self.sigma_df + n_total
            sigsq = dists.scaled_inv_chisq.sample(
                ks, df, (self.sigma_df * self.sigma_guess**2
                         + jnp.maximum(resid_ss, 1e-12)) / df)
            return {"beta": beta, "mu": mu, "V": v, "sigsq": sigsq}

        return sweep


@dataclasses.dataclass(frozen=True)
class HierarchicalZeroInflatedGamma:
    """Zero-inflated gamma with group-level parameters (reference
    Hierarchical/HierarchicalZeroInflatedGammaModel.hpp: per group,
    y = 0 w.p. 1-p_g else Gamma(mean mu_g, shape a_g); hyperpriors
    p_g ~ Beta(pa, pb), mu_g ~ Gamma, a_g ~ Gamma).

    Data enters as per-group sufstats (n0, n1, sum, sumlog) — the
    HierarchicalZeroInflatedGammaData quartet. Group draws: p_g is
    conjugate Beta, (mu_g, a_g) are batched elementwise slice moves on
    the log scale (conditionals independent across groups given the
    hypers). Hypers by slice given the group-level draws.

    State: p [G], mu [G], a [G], hyper {pa, pb, mu_shape, mu_rate,
    a_shape, a_rate}."""

    n0: jax.Array  # [G] zero counts
    n1: jax.Array  # [G] positive counts
    sum: jax.Array  # [G] sum of positives
    sumlog: jax.Array  # [G] sum of log positives
    hyper_rate: float = 0.1  # exponential priors on the 6 hypers

    @property
    def num_groups(self):
        return self.n0.shape[0]

    @staticmethod
    def from_data(y, group, num_groups):
        """y: [n] with zeros; group: [n] ints."""
        pos = y > 0
        n1 = jax.ops.segment_sum(pos.astype(y.dtype), group, num_groups)
        n0 = jax.ops.segment_sum((~pos).astype(y.dtype), group,
                                 num_groups)
        s = jax.ops.segment_sum(jnp.where(pos, y, 0.0), group,
                                num_groups)
        sl = jax.ops.segment_sum(
            jnp.where(pos, jnp.log(jnp.maximum(y, 1e-300)), 0.0),
            group, num_groups)
        return HierarchicalZeroInflatedGamma(n0=n0, n1=n1, sum=s,
                                             sumlog=sl)

    def init_state(self, key):
        g = self.num_groups
        p = (self.n1 + 1.0) / (self.n0 + self.n1 + 2.0)
        mu = (self.sum + 1.0) / (self.n1 + 1.0)
        return {"p": p, "mu": mu, "a": jnp.ones((g,), p.dtype),
                "pa": jnp.asarray(1.0, p.dtype),
                "pb": jnp.asarray(1.0, p.dtype),
                "mu_shape": jnp.asarray(1.0, p.dtype),
                "mu_rate": jnp.asarray(1.0 / jnp.maximum(
                    jnp.mean(mu), 1e-6), p.dtype),
                "a_shape": jnp.asarray(1.0, p.dtype),
                "a_rate": jnp.asarray(1.0, p.dtype)}

    def _gamma_loglik(self, mu, a):
        """Per-group positive-part loglik with mean-shape params."""
        rate = a / mu
        return (self.n1 * (a * jnp.log(rate)
                           - jax.scipy.special.gammaln(a))
                + (a - 1.0) * self.sumlog - rate * self.sum)

    def kernel(self):
        g = self.num_groups
        lg = jax.scipy.special.gammaln

        def sweep(key, state):
            kp, kmu, ka, kh = jax.random.split(key, 4)
            # 1. p_g | data, hypers (batched conjugate Beta)
            p = dists.beta.sample(kp, state["pa"] + self.n1,
                                  state["pb"] + self.n0)
            # 2. mu_g | a_g, data, hypers (batched log-scale slice)
            a = state["a"]

            def mu_target(log_mu):
                m = jnp.exp(log_mu)
                return (self._gamma_loglik(m, a)
                        + dists.gamma.logpdf(m, state["mu_shape"],
                                             state["mu_rate"])
                        + log_mu)

            mu = jnp.exp(slice_step(kmu, jnp.log(state["mu"]),
                                    mu_target, width=0.5))

            # 3. a_g | mu_g, data, hypers (batched log-scale slice)
            def a_target(log_a):
                av = jnp.exp(log_a)
                return (self._gamma_loglik(mu, av)
                        + dists.gamma.logpdf(av, state["a_shape"],
                                             state["a_rate"])
                        + log_a)

            a = jnp.exp(slice_step(ka, jnp.log(a), a_target, width=0.5))

            # 4. hypers | group params: conjugate where possible, slice
            # for the shape-like ones
            k1, k2, k3, k4, k5, k6 = jax.random.split(kh, 6)
            slp = jnp.sum(jnp.log(jnp.maximum(p, 1e-12)))
            sl1mp = jnp.sum(jnp.log(jnp.maximum(1.0 - p, 1e-12)))

            def pa_target(v):
                return (g * (lg(v + state["pb"]) - lg(v))
                        + (v - 1.0) * slp - self.hyper_rate * v)

            pa = slice_step(k1, state["pa"], pa_target, width=1.0,
                            lower=1e-3, upper=1e4)

            def pb_target(v):
                return (g * (lg(pa + v) - lg(v))
                        + (v - 1.0) * sl1mp - self.hyper_rate * v)

            pb = slice_step(k2, state["pb"], pb_target, width=1.0,
                            lower=1e-3, upper=1e4)

            # mu_g ~ Gamma(mu_shape, mu_rate): rate conjugate, shape slice
            mu_rate = dists.gamma.sample(
                k3, 1.0 + g * state["mu_shape"],
                self.hyper_rate + jnp.sum(mu))
            sml = jnp.sum(jnp.log(jnp.maximum(mu, 1e-300)))

            def mu_shape_target(v):
                return (g * (v * jnp.log(mu_rate) - lg(v))
                        + (v - 1.0) * sml - self.hyper_rate * v)

            mu_shape = slice_step(k4, state["mu_shape"],
                                  mu_shape_target, width=0.5,
                                  lower=1e-3, upper=1e4)

            a_rate = dists.gamma.sample(
                k5, 1.0 + g * state["a_shape"],
                self.hyper_rate + jnp.sum(a))
            sal = jnp.sum(jnp.log(jnp.maximum(a, 1e-300)))

            def a_shape_target(v):
                return (g * (v * jnp.log(a_rate) - lg(v))
                        + (v - 1.0) * sal - self.hyper_rate * v)

            a_shape = slice_step(k6, state["a_shape"], a_shape_target,
                                 width=0.5, lower=1e-3, upper=1e4)

            return {"p": p, "mu": mu, "a": a, "pa": pa, "pb": pb,
                    "mu_shape": mu_shape, "mu_rate": mu_rate,
                    "a_shape": a_shape, "a_rate": a_rate}

        return sweep

    @staticmethod
    def simulate(key, group_sizes, p, mu, a):
        """Simulate raw (y, group) from per-group (p, mu, a)."""
        ys, gs = [], []
        for gi, (ng, pg, mg, ag) in enumerate(zip(group_sizes, p, mu,
                                                  a)):
            k1, k2 = jax.random.split(jax.random.fold_in(key, gi))
            pos = jax.random.uniform(k1, (ng,)) < pg
            val = dists.gamma.sample(k2, ag, ag / mg, shape=(ng,))
            ys.append(jnp.where(pos, val, 0.0))
            gs.append(jnp.full((ng,), gi, jnp.int32))
        return jnp.concatenate(ys), jnp.concatenate(gs)


@dataclasses.dataclass(frozen=True)
class HierarchicalPoissonRegression:
    """Per-group Poisson regressions with an MVN coefficient prior:

        y[i] ~ Poisson(exposure[i] * exp(x[i]' beta_{g(i)})),
        beta_g ~ MVN(mu, V),   mu ~ N(0, V / mu_nobs),  V ~ IW.

    Reference: Models/Glm/HierarchicalPoissonRegression.hpp:41-69 (the
    data-level models are PoissonRegressionModels and the prior is an
    MvnModel; PosteriorSamplers/HierarchicalPoissonRegressionSampler.hpp
    drives per-group draws then the prior draw) — distinct from the
    scalar HierarchicalPoisson above (gamma-Poisson rates, no
    regression structure).

    TPU form: the G per-group coefficient vectors update COORDINATE-WISE
    with a slice move whose [G]-vector conditional evaluates the exact
    Poisson log likelihood for every group simultaneously (groups are
    independent given the hypers, so the G one-dimensional conditionals
    are independent and batch into one slice lane set — the reference
    loops groups serially). (mu, V) are the standard MVN/IW conjugate
    draws, identical in shape to HierarchicalGaussianRegression."""

    x: jax.Array  # [n, p]
    y: jax.Array  # [n] counts
    group: jax.Array  # [n] ints in [0, G)
    num_groups: int
    exposure: jax.Array | None = None  # [n] positive
    mu_nobs: float = 1e-3
    v_df: float | None = None

    def _log_exposure(self):
        if self.exposure is None:
            return jnp.zeros_like(self.y, dtype=self.x.dtype)
        return jnp.log(self.exposure).astype(self.x.dtype)

    def init_state(self, key):
        p = self.x.shape[1]
        g = self.num_groups
        rate = jnp.log(jnp.maximum(jnp.mean(self.y), 0.1))
        beta = jnp.zeros((g, p), self.x.dtype).at[:, 0].set(rate)
        return {"beta": beta, "mu": jnp.mean(beta, 0),
                "V": jnp.eye(p, dtype=self.x.dtype)}

    def kernel(self):
        p = self.x.shape[1]
        g = self.num_groups
        log_e = self._log_exposure()
        yf = self.y.astype(self.x.dtype)
        v_df0 = self.v_df if self.v_df is not None else p + 2.0
        v_ss0 = jnp.eye(p, dtype=self.x.dtype) * v_df0

        def group_loglik(beta):
            """[G] exact Poisson log likelihood per group."""
            eta = (jnp.einsum("np,np->n", self.x, beta[self.group])
                   + log_e)
            ll_rows = yf * eta - jnp.exp(eta)
            return jax.ops.segment_sum(ll_rows, self.group, g)

        def sweep(key, state):
            beta, mu, v = state["beta"], state["mu"], state["V"]
            vinv = jnp.linalg.inv(v)
            vinv = 0.5 * (vinv + vinv.T)

            # 1. beta_g coordinates, all groups batched per coordinate
            for j in range(p):
                kj = jax.random.fold_in(key, j)

                def logp_j(bj, beta=beta, j=j):
                    bt = beta.at[:, j].set(bj)
                    dev = bt - mu
                    lp_prior = -0.5 * jnp.einsum(
                        "gi,ij,gj->g", dev, vinv, dev)
                    return group_loglik(bt) + lp_prior

                bj_new = slice_step(kj, beta[:, j], logp_j, width=0.5,
                                    expand_iters=5, shrink_iters=10)
                beta = beta.at[:, j].set(bj_new)

            # 2. mu | beta, V and 3. V | beta, mu (conjugate)
            km, kv = jax.random.split(jax.random.fold_in(key, p + 1))
            prec_mu = (g + self.mu_nobs) * vinv
            mean_mu = jnp.sum(beta, 0) / (g + self.mu_nobs)
            mu = dists.mvn.sample_prec(km, mean_mu, prec_mu)
            dev = beta - mu
            ss = v_ss0 + dev.T @ dev
            vinv_new = dists.wishart.sample(
                kv, v_df0 + g, jnp.linalg.inv(0.5 * (ss + ss.T)))
            v = jnp.linalg.inv(vinv_new)
            v = 0.5 * (v + v.T)
            return {"beta": beta, "mu": mu, "V": v}

        return sweep

    @staticmethod
    def simulate(key, group_sizes, mu, v_scale=0.1, exposure_range=None):
        """Simulate (x, y, group[, exposure]) from beta_g ~ N(mu, v I)."""
        mu = jnp.asarray(mu)
        p = mu.shape[0]
        xs, ys, gs, es = [], [], [], []
        for gi, ng in enumerate(group_sizes):
            k1, k2, k3, k4 = jax.random.split(
                jax.random.fold_in(key, gi), 4)
            beta_g = mu + v_scale * jax.random.normal(k1, (p,))
            x = jnp.concatenate(
                [jnp.ones((ng, 1)), jax.random.normal(k2, (ng, p - 1))],
                axis=1)
            log_e = jnp.zeros((ng,))
            if exposure_range is not None:
                lo, hi = exposure_range
                log_e = jnp.log(jax.random.uniform(
                    k4, (ng,), minval=lo, maxval=hi))
                es.append(jnp.exp(log_e))
            lam = jnp.exp(x @ beta_g + log_e)
            ys.append(jax.random.poisson(k3, lam))
            xs.append(x)
            gs.append(jnp.full((ng,), gi, jnp.int32))
        out = (jnp.concatenate(xs), jnp.concatenate(ys),
               jnp.concatenate(gs))
        if exposure_range is not None:
            out = out + (jnp.concatenate(es),)
        return out
