"""GLM family breadth: gamma regression, zero-inflated regressions,
binomial (trials > 1) logit DA, and log-linear contingency models.

Reference: Models/Glm/GammaRegressionModel.hpp:45,
ZeroInflatedLognormalRegression.hpp / ZeroInflatedGammaRegression.hpp /
zero-inflated Poisson pieces, BinomialLogitModel.hpp (+
BinomialLogitDataImputer for trials > 1), LoglinearModel.hpp:228.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from boom_tpu import dists
from boom_tpu.inference.kernels.slice import slice_step
from boom_tpu.models.glm import _mixture_tables as tables
from boom_tpu.models.glm.logit import LogitSpikeSlab
from boom_tpu.models.glm.regression import SpikeSlabPrior, SpikeSlabRegression
from boom_tpu.models.glm.regression import RegSuf
from boom_tpu.models.glm.ssvs import (
    WeightedRegSuf,
    kv_draw_beta,
    kv_draw_indicators,
    sample_mixture_indicator,
)


# ---------------------------------------------------------------------------
# Gamma regression — reference GammaRegressionModel.hpp:45
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class GammaRegression:
    """y_i ~ Gamma(alpha, rate = alpha / mu_i), log mu_i = x_i' beta
    (so E y = mu, CV = 1/sqrt(alpha); reference header comment).

    No conjugate augmentation exists, so beta gets univariate slice
    updates on the exact log posterior (the reference's default
    nonconjugate fallback) with a N(0, beta_prior_sd^2) prior; alpha
    gets a slice update with a Gamma(a, b) prior. State: beta [p],
    alpha scalar."""

    x: jax.Array
    y: jax.Array
    beta_prior_sd: float = 10.0
    alpha_prior_shape: float = 1.0
    alpha_prior_rate: float = 0.1
    # optional [n] per-row weights (0/1 masks a row out — the
    # zero-inflated composite below fits the positive rows this way
    # without dynamic shapes)
    weights: jax.Array | None = None

    def log_post(self, beta, alpha):
        eta = self.x @ beta
        log_mu = eta
        y_safe = jnp.maximum(self.y, 1e-300)
        rows = (alpha * (jnp.log(alpha) - log_mu)
                - jax.scipy.special.gammaln(alpha)
                + (alpha - 1.0) * jnp.log(y_safe)
                - alpha * y_safe / jnp.exp(log_mu))
        if self.weights is not None:
            rows = rows * self.weights
        ll = jnp.sum(rows)
        lp = (-0.5 * jnp.sum(beta * beta) / self.beta_prior_sd**2
              + (self.alpha_prior_shape - 1.0) * jnp.log(alpha)
              - self.alpha_prior_rate * alpha)
        return ll + lp

    def init_state(self, key):
        p = self.x.shape[1]
        if self.weights is None:
            ybar = jnp.mean(self.y)
        else:
            ybar = (jnp.sum(self.weights * self.y)
                    / jnp.maximum(jnp.sum(self.weights), 1.0))
        beta0 = jnp.zeros((p,), self.x.dtype).at[0].set(
            jnp.log(jnp.maximum(ybar, 1e-6)))
        return {"beta": beta0, "alpha": jnp.asarray(1.0, self.x.dtype)}

    def kernel(self):
        p = self.x.shape[1]

        def sweep(key, state):
            keys = jax.random.split(key, p + 1)
            beta, alpha = state["beta"], state["alpha"]
            for j in range(p):
                def logp_j(b_j, j=j, beta=beta):
                    return self.log_post(beta.at[j].set(b_j), alpha)
                beta = beta.at[j].set(
                    slice_step(keys[j], beta[j], logp_j, width=1.0))
            alpha = slice_step(
                keys[p], alpha, lambda a: self.log_post(beta, a),
                width=1.0, lower=1e-3, upper=1e4)
            return {"beta": beta, "alpha": alpha}

        return sweep

    @staticmethod
    def simulate(key, n, beta, alpha):
        kx, ky = jax.random.split(key)
        p = len(beta)
        x = jnp.concatenate(
            [jnp.ones((n, 1)), jax.random.normal(kx, (n, p - 1))], 1)
        mu = jnp.exp(x @ jnp.asarray(beta))
        y = dists.gamma.sample(ky, alpha, alpha / mu)
        return x, y


# ---------------------------------------------------------------------------
# Zero-inflated lognormal regression — reference
# ZeroInflatedLognormalRegression.hpp. Because the lognormal puts no
# mass at zero, the mixture indicator is OBSERVED (y > 0) and the model
# decouples exactly into a logistic regression on the nonzero indicator
# and a Gaussian regression on log y | y > 0 — two existing spike-slab
# composites run side by side.
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class ZeroInflatedLognormalRegression:
    x: jax.Array
    y: jax.Array
    expected_model_size: float = 1.0

    def _parts(self):
        nz = self.y > 0
        logit = LogitSpikeSlab.from_data(
            self.x, jnp.asarray(nz, jnp.int32),
            expected_model_size=self.expected_model_size)
        idx = jnp.nonzero(nz, size=self.y.shape[0], fill_value=0)[0]
        w = jnp.asarray(nz, self.x.dtype)
        # Gaussian part on log y over nonzero rows (weighted sufstats)
        logy = jnp.where(nz, jnp.log(jnp.maximum(self.y, 1e-300)), 0.0)
        xw = self.x * w[:, None]
        suf = RegSuf(xtx=xw.T @ self.x, xty=xw.T @ logy,
                     yty=jnp.sum(w * logy * logy), n=jnp.sum(w))
        prior = SpikeSlabPrior.from_data(
            self.x, logy, expected_model_size=self.expected_model_size)
        reg = SpikeSlabRegression(suf=suf, prior=prior)
        return logit, reg

    def init_state(self, key):
        k1, k2 = jax.random.split(key)
        logit, reg = self._parts()
        return {"logit": logit.init_state(k1), "reg": reg.init_state(k2)}

    def kernel(self):
        logit, reg = self._parts()
        k_logit, k_reg = logit.kernel(), reg.kernel()

        def sweep(key, state):
            k1, k2 = jax.random.split(key)
            return {"logit": k_logit(k1, state["logit"]),
                    "reg": k_reg(k2, state["reg"])}

        return sweep

    def expected_value(self, state, x_new):
        """E[y | x] = P(y>0 | x) * exp(mu + sigma^2/2)."""
        p_nz = jax.nn.sigmoid(x_new @ state["logit"]["beta"])
        mu = x_new @ state["reg"]["beta"]
        return p_nz * jnp.exp(mu + 0.5 * state["reg"]["sigsq"])


# ---------------------------------------------------------------------------
# Zero-inflated gamma regression — reference
# ZeroInflatedGammaRegression.hpp:108 (probability model at :28-48:
# logit regression on nonzero status + gamma regression on the positive
# part). Like the lognormal variant the gamma puts no mass at zero, so
# the indicator is OBSERVED and the model decouples exactly: the logit
# spike-slab fits (y > 0) and the weighted gamma regression fits the
# positive rows (weights mask, fixed shapes).
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class ZeroInflatedGammaRegression:
    x: jax.Array
    y: jax.Array
    expected_model_size: float = 1.0

    def _parts(self):
        nz = self.y > 0
        logit = LogitSpikeSlab.from_data(
            self.x, jnp.asarray(nz, jnp.int32),
            expected_model_size=self.expected_model_size)
        gamma = GammaRegression(
            x=self.x, y=jnp.where(nz, self.y, 1.0),
            weights=jnp.asarray(nz, self.x.dtype))
        return logit, gamma

    def init_state(self, key):
        k1, k2 = jax.random.split(key)
        logit, gamma = self._parts()
        return {"logit": logit.init_state(k1),
                "gamma": gamma.init_state(k2)}

    def kernel(self):
        logit, gamma = self._parts()
        k_logit, k_gamma = logit.kernel(), gamma.kernel()

        def sweep(key, state):
            k1, k2 = jax.random.split(key)
            return {"logit": k_logit(k1, state["logit"]),
                    "gamma": k_gamma(k2, state["gamma"])}

        return sweep

    def expected_value(self, state, x_new):
        """E[y | x] = P(y>0 | x) * mu(x) (gamma mean is exp(x'beta))."""
        p_nz = jax.nn.sigmoid(x_new @ state["logit"]["beta"])
        return p_nz * jnp.exp(x_new @ state["gamma"]["beta"])

    @staticmethod
    def simulate(key, n, beta_logit, beta_gamma, alpha=2.0):
        kx, kz, kg = jax.random.split(key, 3)
        beta_logit = jnp.asarray(beta_logit)
        p = beta_logit.shape[0]
        x = jnp.concatenate(
            [jnp.ones((n, 1)), jax.random.normal(kx, (n, p - 1))], 1)
        pos = (jax.random.uniform(kz, (n,))
               < jax.nn.sigmoid(x @ beta_logit))
        mu = jnp.exp(x @ jnp.asarray(beta_gamma))
        val = dists.gamma.sample(kg, alpha, alpha / mu)
        return x, jnp.where(pos, val, 0.0)


# ---------------------------------------------------------------------------
# Zero-inflated Poisson regression — zeros are a MIXTURE (structural +
# sampling), so a latent indicator Gibbs layer sits on top of the logit
# and Poisson DA composites (reference ZeroInflatedPoissonModel +
# Glm zero-inflated samplers).
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class ZeroInflatedPoissonRegression:
    """y_i = 0 with prob 1-p_i (structural zero), else Poisson(mu_i);
    logit(p_i) = x_i' beta_logit ("at-risk" probability), log mu_i =
    x_i' beta_pois. State: the two coefficient blocks + at_risk [n]."""

    x: jax.Array
    y: jax.Array
    expected_model_size: float = 1.0

    def _parts(self):
        from boom_tpu.models.glm.poisson import PoissonSpikeSlab

        nz = jnp.asarray(self.y > 0, jnp.int32)
        logit = LogitSpikeSlab.from_data(
            self.x, nz, expected_model_size=self.expected_model_size)
        pois = PoissonSpikeSlab.from_data(
            self.x, self.y, expected_model_size=self.expected_model_size)
        return logit, pois

    def init_state(self, key):
        k1, k2 = jax.random.split(key)
        logit, pois = self._parts()
        st = {"logit": logit.init_state(k1), "pois": pois.init_state(k2)}
        st["at_risk"] = jnp.asarray(self.y > 0, bool)
        return st

    def kernel(self):
        logit, pois = self._parts()
        k_pois_impute = pois.kernel_weighted()  # weighted variant below
        k_logit_cls = logit

        def sweep(key, state):
            k_r, k_l, k_p = jax.random.split(key, 3)
            # 1. at-risk indicators for zero rows:
            #    P(at_risk | y=0) = p e^-mu / (p e^-mu + 1 - p)
            eta_l = self.x @ state["logit"]["beta"]
            mu = jnp.exp(self.x @ state["pois"]["beta"])
            p_risk = jax.nn.sigmoid(eta_l)
            post = (p_risk * jnp.exp(-mu)
                    / (p_risk * jnp.exp(-mu) + (1.0 - p_risk)))
            u = jax.random.uniform(k_r, self.y.shape)
            at_risk = jnp.where(self.y > 0, True, u < post)

            # 2. logistic regression on the at-risk indicator
            st_l = k_logit_cls.kernel_for_response(
                jnp.asarray(at_risk, jnp.int32))(k_l, state["logit"])

            # 3. Poisson regression on at-risk rows only (weights)
            st_p = k_pois_impute(k_p, state["pois"],
                                 jnp.asarray(at_risk, self.x.dtype))
            return {"logit": st_l, "pois": st_p, "at_risk": at_risk}

        return sweep


# ---------------------------------------------------------------------------
# Binomial (trials > 1) logit spike-slab — reference BinomialLogitModel
# + BinomialLogitDataImputer (the finite normal-mixture logistic DA
# applied per trial; NormalMixtureApproximation.hpp:38)
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class BinomialLogitSpikeSlab:
    """successes_i ~ Binomial(trials_i, logistic(x_i' beta)) with a
    spike-slab prior. The DA imputes per-trial latent logistic
    utilities: trial j of observation i is a success iff j < y_i
    (exchangeable, so any fixed assignment of successes to trial slots
    is valid), masked beyond trials_i. Static shape [n, max_trials];
    for very large trial counts prefer aggregating predictors."""

    x: jax.Array
    successes: jax.Array  # [n] int
    trials: jax.Array  # [n] int
    prior: SpikeSlabPrior
    max_trials: int = 0
    max_flips: int | None = None

    @staticmethod
    def from_data(x, successes, trials, expected_model_size=1.0,
                  prior_information_weight=0.01, **kw):
        successes = jnp.asarray(successes)
        trials = jnp.asarray(trials)
        phat = jnp.clip((successes + 0.5) / (trials + 1.0), 0.02, 0.98)
        prior = SpikeSlabPrior.from_data(
            x, jnp.log(phat / (1 - phat)),
            expected_model_size=expected_model_size,
            prior_information_weight=prior_information_weight, **kw)
        return BinomialLogitSpikeSlab(
            x=x, successes=successes, trials=trials, prior=prior,
            max_trials=int(jnp.max(trials)))

    def init_state(self, key):
        p = self.prior.mean.shape[0]
        pi = jax.nn.sigmoid(self.prior.log_inclusion_odds)
        gamma = jax.random.uniform(key, (p,)) < jnp.maximum(pi, 2.0 / p)
        return {"gamma": gamma, "beta": jnp.zeros(p, self.x.dtype)}

    def kernel(self):
        from boom_tpu.models.glm.logit import impute_logit_latent

        w_tab = jnp.asarray(tables.LOGISTIC_WEIGHTS)
        s_tab = jnp.asarray(tables.LOGISTIC_SDS)
        mu_tab = jnp.zeros_like(s_tab)
        n, m = self.x.shape[0], self.max_trials
        slot = jnp.arange(m)[None, :]
        valid = slot < self.trials[:, None]  # [n, m]
        is_succ = slot < self.successes[:, None]

        def sweep(key, state):
            kz, km, kg, kb = jax.random.split(key, 4)
            eta = self.x @ state["beta"]  # [n]
            eta_t = jnp.broadcast_to(eta[:, None], (n, m))
            z = impute_logit_latent(
                kz, eta_t, jnp.asarray(is_succ, jnp.int32))
            comp = sample_mixture_indicator(
                km, z - eta_t, w_tab, mu_tab, s_tab)
            w = jnp.where(valid, 1.0 / s_tab[comp] ** 2, 0.0)
            # per-observation collapse: precision-weighted mean latent
            prec = jnp.sum(w, 1)
            zbar = jnp.sum(w * z, 1) / jnp.maximum(prec, 1e-30)
            suf = WeightedRegSuf.from_data(self.x, zbar, prec)
            gamma = kv_draw_indicators(
                kg, suf, self.prior, state["gamma"], self.max_flips)
            beta = kv_draw_beta(kb, suf, self.prior, gamma)
            return {"gamma": gamma, "beta": beta}

        return sweep

    @staticmethod
    def simulate(key, n, p, nonzero, max_trials=20, beta_scale=1.0):
        kx, kb, kt, ky = jax.random.split(key, 4)
        x = jax.random.normal(kx, (n, p)).at[:, 0].set(1.0)
        beta = jnp.zeros(p).at[jnp.arange(nonzero)].set(
            beta_scale * jnp.where(
                jax.random.uniform(kb, (nonzero,)) < 0.5, -1.0, 1.0))
        trials = jax.random.randint(kt, (n,), 1, max_trials + 1)
        prob = jax.nn.sigmoid(x @ beta)
        y = jax.random.binomial(ky, trials.astype(jnp.float32),
                                prob).astype(jnp.int32)
        return x, y, trials, beta


# ---------------------------------------------------------------------------
# Log-linear contingency model — reference LoglinearModel.hpp:228.
# Cell counts of a cross-classified table follow a Poisson log-linear
# model over main effects (+ optional two-way interactions), which is
# exactly a Poisson regression on effects-coded dummies — the existing
# Poisson DA machinery does the sampling.
# ---------------------------------------------------------------------------
def loglinear_design(levels, interactions=()):
    """Full-factorial cell enumeration + effects coding.

    levels: per-factor level counts, e.g. (3, 2, 4).
    interactions: pairs of factor indices to include as two-way terms.
    Returns (cells [C, F] int, design [C, q])."""
    import numpy as np

    grids = np.meshgrid(*[np.arange(l) for l in levels], indexing="ij")
    cells = np.stack([g.ravel() for g in grids], 1)

    def effects(col, nl):
        # effects coding: level l -> e_l (drop last: last level = -1s)
        e = np.eye(nl)[:, : nl - 1]
        e[nl - 1] = -1.0
        return e[col]

    parts = [np.ones((cells.shape[0], 1))]
    for f, nl in enumerate(levels):
        parts.append(effects(cells[:, f], nl))
    for (a, b) in interactions:
        ea = effects(cells[:, a], levels[a])
        eb = effects(cells[:, b], levels[b])
        parts.append(np.einsum("ci,cj->cij", ea, eb).reshape(
            cells.shape[0], -1))
    return jnp.asarray(cells), jnp.asarray(np.concatenate(parts, 1))


@dataclasses.dataclass(frozen=True)
class LoglinearModel:
    """Poisson log-linear model on a contingency table."""

    counts: jax.Array  # [C] cell counts (full factorial order)
    design: jax.Array  # [C, q] effects-coded design
    expected_model_size: float | None = None  # None = dense Gaussian

    @staticmethod
    def from_table(table, interactions=()):
        """table: N-d array of counts."""
        table = jnp.asarray(table)
        cells, design = loglinear_design(table.shape, interactions)
        return LoglinearModel(counts=table.reshape(-1), design=design)

    def _pois(self):
        from boom_tpu.models.glm.poisson import PoissonSpikeSlab

        q = self.design.shape[1]
        ems = (self.expected_model_size if self.expected_model_size
               is not None else float(q))
        return PoissonSpikeSlab.from_data(
            self.design, self.counts, expected_model_size=ems)

    def init_state(self, key):
        return self._pois().init_state(key)

    def kernel(self):
        return self._pois().kernel()

    def fitted_log_means(self, state):
        return self.design @ state["beta"]


# ---------------------------------------------------------------------------
# Multilevel multinomial — reference Models/MultilevelMultinomialModel.hpp:51
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class MultilevelMultinomial:
    """Multinomial over a TAXONOMY: categories form a tree; each
    internal node carries a conditional multinomial over its children,
    and a leaf's probability is the product of conditionals along its
    path. Data may stop at internal nodes ("partial" observations count
    toward every conditional on their path only as far as observed).
    Conjugate: each node's conditional gets an independent Dirichlet
    posterior from its child-transition counts.

    parents: [M] int parent of each node (-1 for the root); node 0
      must be the root. Observations are node ids (leaf or internal).
    """

    parents: tuple  # length M, parent ids
    observations: jax.Array  # [n] node ids
    prior_count: float = 1.0

    @property
    def num_nodes(self):
        return len(self.parents)

    def _children(self):
        import numpy as np

        kids = [[] for _ in range(self.num_nodes)]
        for c, par in enumerate(self.parents):
            if par >= 0:
                kids[par].append(c)
        return kids

    def _path_counts(self):
        """counts[parent, child]: transitions along observation paths."""
        import numpy as np

        m = self.num_nodes
        counts = np.zeros((m, m))
        obs = np.asarray(self.observations)
        for node in obs:
            c = int(node)
            while self.parents[c] >= 0:
                counts[self.parents[c], c] += 1
                c = self.parents[c]
        return jnp.asarray(counts)

    def init_state(self, key):
        return self.kernel()(key, {})

    def kernel(self):
        counts = self._path_counts()
        kids = self._children()
        m = self.num_nodes
        # padded child lists for fixed shapes
        max_k = max((len(k) for k in kids), default=1) or 1
        import numpy as np

        child_idx = np.zeros((m, max_k), np.int32)
        child_mask = np.zeros((m, max_k), bool)
        for v, k in enumerate(kids):
            child_idx[v, :len(k)] = k
            child_mask[v, :len(k)] = True
        child_idx = jnp.asarray(child_idx)
        child_mask = jnp.asarray(child_mask)

        def sweep(key, state):
            c = jnp.take_along_axis(
                counts, child_idx, axis=1)  # [m, max_k]
            g = jax.random.gamma(key, c + self.prior_count)
            g = jnp.where(child_mask, g, 0.0)
            probs = g / jnp.maximum(g.sum(-1, keepdims=True), 1e-30)
            return {"cond_probs": probs}

        return sweep

    def leaf_log_probs(self, state):
        """Log probability of each node (= product of conditionals on
        its path)."""
        kids = self._children()
        probs = state["cond_probs"]
        m = self.num_nodes
        out = [0.0] * m
        order = sorted(range(m),
                       key=lambda v: 0 if self.parents[v] < 0 else 1)
        # topological: walk down from the root
        import numpy as np

        logp = np.zeros(m)
        stack = [v for v in range(m) if self.parents[v] < 0]
        probs_np = np.asarray(probs)
        while stack:
            v = stack.pop()
            for slot, c in enumerate(kids[v]):
                logp[c] = logp[v] + np.log(
                    max(probs_np[v, slot], 1e-300))
                stack.append(c)
        return jnp.asarray(logp)
