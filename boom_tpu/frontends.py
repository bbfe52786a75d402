"""User-facing front ends beyond spikeslab/bsts (see api.py for those).

Reference packages mirrored here, one class per reference user surface:
  * MlmSpike — Interfaces/python/spikeslab/BayesBoom/spikeslab/
    mlogit_spike.py (multinomial-logit spike-slab regression)
  * FiniteMixture — Interfaces/python/mixtures/BayesBoom/mixtures/
    finite_mixture.py:10 (FiniteMixtureModel)
  * DirichletProcessMvn — mixtures/dirichlet_process.py:8
  * MixedDataImputer — Interfaces/python/impute/BayesBoom/impute/
    impute.py:13
  * PoissonFactorModel / MultinomialFactorModel —
    Interfaces/python/factormodels/BayesBoom/factormodels/
  * BinomialBandit / LinearBandit — Interfaces/python/bandits/
  * NnetRegression — Interfaces/R/BoomSpikeSlab nnet.R
    (GaussianFeedForwardNeuralNetwork front end)

Every class follows the same ergonomics as api.py: numpy in / numpy
out, one jitted training program, fit() -> self, then summaries /
predictions. These wrap the functional models in boom_tpu.models.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from boom_tpu.inference.driver import McmcResult, run_mcmc
from boom_tpu.serialize import SavableFit


def _asfloat(a):
    return jnp.asarray(a, jnp.result_type(float))


@dataclasses.dataclass
class MlmSpike(SavableFit):
    """Multinomial logit regression with spike-and-slab priors
    (reference mlogit_spike.py; R BoomSpikeSlab mlm.spike)."""

    expected_model_size: float = 1.0
    _model: Any = None
    _result: McmcResult | None = None

    def fit(self, x, choice, num_classes=None, niter=500, num_chains=2,
            burn=200, seed=0, **kw):
        from boom_tpu.models.glm.mlogit import MultinomialLogitSpikeSlab

        x = _asfloat(x)
        choice = jnp.asarray(choice, jnp.int32)
        if num_classes is None:
            num_classes = int(choice.max()) + 1
        self._model = MultinomialLogitSpikeSlab.from_data(
            x, choice, num_classes,
            expected_model_size=self.expected_model_size, **kw)
        self._result = run_mcmc(
            jax.random.key(seed), self._model.kernel(),
            self._model.init_state, num_draws=niter,
            num_chains=num_chains, burn=burn)
        return self

    def coefficient_draws(self):
        """[draws, K-1, p]; class 0 is the baseline with zero betas."""
        return np.asarray(self._result.stacked()["beta"])

    def inclusion_probs(self):
        """[K-1, p] posterior inclusion probabilities."""
        return np.asarray(self._result.stacked()["gamma"]).mean(0)

    def predict_probs(self, x, max_draws=200):
        """Posterior-mean class probabilities [n, K]."""
        x = _asfloat(x)
        beta = self._result.stacked()["beta"]
        total = beta.shape[0]
        take = min(max_draws, total)
        idx = jnp.linspace(0, total - 1, take).astype(jnp.int32)

        def probs(b):
            eta = jnp.concatenate(
                [jnp.zeros((x.shape[0], 1)), x @ b.T], axis=1)
            return jax.nn.softmax(eta, axis=-1)

        return np.asarray(jnp.mean(jax.vmap(probs)(beta[idx]), 0))


@dataclasses.dataclass
class FiniteMixture(SavableFit):
    """Finite Gaussian mixture front end (reference
    FiniteMixtureModel, mixtures/finite_mixture.py:10)."""

    num_components: int = 2
    _model: Any = None
    _result: McmcResult | None = None

    def fit(self, y, niter=1000, num_chains=4, burn=300, seed=0, **kw):
        from boom_tpu.models.mixtures import GaussianMixtureModel

        self._model = GaussianMixtureModel(
            y=_asfloat(y), num_components=self.num_components, **kw)
        self._result = run_mcmc(
            jax.random.key(seed), self._model.kernel(),
            self._model.init_state, num_draws=niter,
            num_chains=num_chains, burn=burn)
        return self

    def components(self):
        """Label-switching-resolved posterior summaries per component."""
        from boom_tpu.models.mixtures import relabel_sorted

        d = self._result.draws
        mu, sigsq, w = relabel_sorted(d["mu"], d["sigsq"], d["weights"])
        k = self.num_components
        mu = np.asarray(mu).reshape(-1, k)
        sd = np.sqrt(np.asarray(sigsq).reshape(-1, k))
        w = np.asarray(w).reshape(-1, k)
        return [{"mean": float(mu[:, j].mean()),
                 "sd": float(sd[:, j].mean()),
                 "weight": float(w[:, j].mean())} for j in range(k)]

    def cluster_probs(self, y=None):
        """Posterior-mean responsibilities [n, K] (final states)."""
        model = self._model if y is None else dataclasses.replace(
            self._model, y=_asfloat(y))
        final = self._result.final_state

        def resp(st):
            lp = model.responsibilities(st)
            return jax.nn.softmax(lp, axis=-1)

        return np.asarray(jnp.mean(jax.vmap(resp)(final), 0))


@dataclasses.dataclass
class DirichletProcessMvn(SavableFit):
    """DP mixture of multivariate Gaussians (reference
    DirichletProcessMvn, mixtures/dirichlet_process.py:8) via the
    collapsed CRP sampler."""

    max_components: int = 20
    alpha: float = 1.0
    _model: Any = None
    _draws: list = dataclasses.field(default_factory=list)

    def fit(self, y, niter=300, burn=200, seed=0, **kw):
        from boom_tpu.models.dirichlet_process import DpMvnCollapsed

        y = _asfloat(y)
        self._model = DpMvnCollapsed(
            y=y, max_components=self.max_components, alpha=self.alpha,
            **kw)
        kern = self._model.kernel()
        state = self._model.init_state(jax.random.key(seed + 1))
        key = jax.random.key(seed)

        # one jitted program for the whole fit: the collapsed-CRP kernel
        # scans over draws with a fixed buffer (every other front end's
        # contract; a Python driver loop would pay one dispatch + host
        # round-trip per draw)
        @jax.jit
        def fit(state, key):
            def step(carry, k):
                new = kern(k, carry)
                return new, new["z"]

            return jax.lax.scan(step, state,
                                jax.random.split(key, niter))

        final, zs = fit(state, key)
        zs = np.asarray(zs[burn:])
        self._draws = [zs[i] for i in range(zs.shape[0])]
        self._final = jax.tree_util.tree_map(np.asarray, final)
        return self

    def num_cluster_draws(self):
        return np.asarray([len(np.unique(z)) for z in self._draws])

    def cluster_labels(self):
        """Final-state hard assignments [n]."""
        return np.asarray(self._final["z"])


@dataclasses.dataclass
class MixedDataImputer(SavableFit):
    """Missing-data imputation for mixed numeric/categorical frames
    (reference Interfaces/python/impute/BayesBoom/impute/impute.py:13,
    engine Models/Impute/MixedDataImputer.hpp:612)."""

    num_clusters: int = 3
    error_correction: bool = False
    _model: Any = None
    _finals: Any = None

    def fit(self, numeric, categorical, num_levels, atoms=None,
            niter=300, num_chains=2, burn=300, seed=0, **kw):
        """numeric: [n, d_num] with NaN at missing cells; categorical:
        [n, d_cat] int codes with negatives at missing cells."""
        from boom_tpu.models.mixed_impute import (
            MixedDataImputer as _Engine,
        )

        self._model = _Engine.from_frame(
            np.asarray(numeric, float), np.asarray(categorical),
            num_levels=tuple(num_levels), atoms=atoms,
            num_clusters=self.num_clusters,
            error_correction=self.error_correction, **kw)
        res = run_mcmc(
            jax.random.key(seed), self._model.kernel(),
            self._model.init_state, num_draws=niter,
            num_chains=num_chains, burn=burn)
        self._finals = res.final_state
        return self

    def imputed_frames(self):
        """One completed (numeric, categorical) frame per chain."""
        chains = jax.tree_util.tree_leaves(self._finals)[0].shape[0]
        outs = []
        for c in range(chains):
            st = jax.tree_util.tree_map(lambda a: a[c], self._finals)
            num, cat = self._model.imputed_frame(st)
            outs.append((np.asarray(num), np.asarray(cat)))
        return outs

    def imputed_frame(self):
        """Across-chain average numeric frame + modal categorical."""
        frames = self.imputed_frames()
        num = np.mean([f[0] for f in frames], axis=0)
        cats = np.stack([f[1] for f in frames])
        cat = np.apply_along_axis(
            lambda v: np.bincount(v).argmax(), 0, cats)
        return num, cat


@dataclasses.dataclass
class PoissonFactorModel(SavableFit):
    """Audience-measurement Poisson factor model front end (reference
    factormodels/poisson_factor_model.py; engine
    Models/FactorModels/PoissonFactorModel.hpp)."""

    num_classes: int = 2
    _model: Any = None
    _result: McmcResult | None = None

    def fit(self, counts, exposure=None, niter=500, num_chains=2,
            burn=200, seed=0, **kw):
        from boom_tpu.models.factor import PoissonFactorModel as _M

        self._model = _M(
            counts=_asfloat(counts), num_classes=self.num_classes,
            exposure=None if exposure is None else _asfloat(exposure),
            **kw)
        self._result = run_mcmc(
            jax.random.key(seed), self._model.kernel(),
            self._model.init_state, num_draws=niter,
            num_chains=num_chains, burn=burn)
        return self

    def site_rate_draws(self):
        """[draws, sites, classes] Poisson rate draws."""
        return np.asarray(self._result.stacked()["lam"])

    def class_membership_probs(self, counts=None):
        """Posterior-mean visitor class probabilities [V, K].

        Chains can settle on different class labelings (the factor-model
        analog of mixture label switching), so each chain's columns are
        aligned to chain 0 by linear assignment on membership agreement
        before averaging (identify_permutation analog,
        Models/Mixtures/PosteriorSamplers/identify_permutation.cpp)."""
        from boom_tpu.numopt import linear_assignment

        model = self._model if counts is None else dataclasses.replace(
            self._model, counts=_asfloat(counts))
        final = self._result.final_state

        def probs(st):
            return jax.nn.softmax(model.class_logits(st), axis=-1)

        per_chain = np.asarray(jax.vmap(probs)(final))  # [chains, V, K]
        ref = per_chain[0]
        aligned = [ref]
        for c in range(1, per_chain.shape[0]):
            # cost[j, k] = -agreement between chain-c class j and ref class k
            agree = np.einsum("vj,vk->jk", per_chain[c], ref)
            perm = linear_assignment(-agree)  # chain class j -> ref class perm[j]
            inv = np.argsort(perm)  # ref class k <- chain class inv[k]
            aligned.append(per_chain[c][:, inv])
        return np.mean(aligned, axis=0)


@dataclasses.dataclass
class MultinomialFactorModel(PoissonFactorModel):
    """Multinomial variant (reference
    factormodels/multinomial_factor_model.py:9)."""

    def fit(self, counts, niter=500, num_chains=2, burn=200, seed=0,
            **kw):
        from boom_tpu.models.factor import MultinomialFactorModel as _M

        self._model = _M(counts=_asfloat(counts),
                         num_classes=self.num_classes, **kw)
        self._result = run_mcmc(
            jax.random.key(seed), self._model.kernel(),
            self._model.init_state, num_draws=niter,
            num_chains=num_chains, burn=burn)
        return self

    def site_profile_draws(self):
        """[draws, sites, classes] visit-profile draws."""
        return np.asarray(self._result.stacked()["profiles"])


class BinomialBandit(SavableFit):
    """Thompson-sampling front end for Bernoulli rewards (reference
    bandits/binomial_bandit.py; Bandits/BinomialBandit.hpp). Streaming:
    update() with observed (arm, reward), draw_arm() to act."""

    def __init__(self, num_arms, prior_a=1.0, prior_b=1.0, seed=0):
        from boom_tpu.models.bandits import BinomialBandit as _B

        self._model = _B(num_arms=num_arms, prior_a=prior_a,
                         prior_b=prior_b)
        self._state = self._model.init_state()
        self._key = jax.random.key(seed)

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def update(self, arm, reward):
        self._state = self._model.update(self._state, int(arm),
                                         float(reward))
        return self

    def draw_arm(self):
        return int(self._model.draw_arm(self._next_key(), self._state))

    def optimal_arm_probabilities(self, num_draws=2000):
        return np.asarray(self._model.optimal_arm_probabilities(
            self._next_key(), self._state, num_draws=num_draws))


class LinearBandit(SavableFit):
    """Thompson sampling over a factorial experiment with linear
    Gaussian rewards (reference bandits/linear_bandit_encoder.py +
    Bandits/LinearBanditEncoder.hpp)."""

    def __init__(self, factor_levels, context_dim=0, seed=0, **kw):
        from boom_tpu.models.bandits import LinearBandit as _B

        self._model = _B(factor_levels=tuple(factor_levels),
                         context_dim=context_dim, **kw)
        self._state = self._model.init_state()
        self._key = jax.random.key(seed)

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def update(self, arm, reward, context=None):
        self._state = self._model.update(self._state, int(arm),
                                         float(reward), context=context)
        return self

    def draw_arm(self, context=None):
        return int(self._model.draw_arm(self._next_key(), self._state,
                                        context=context))

    def optimal_arm_probabilities(self, context=None, num_draws=2000):
        return np.asarray(self._model.optimal_arm_probabilities(
            self._next_key(), self._state, context=context,
            num_draws=num_draws))


@dataclasses.dataclass
class ShrinkageRegression(SavableFit):
    """Regression with exchangeable coefficient groups shrunk together
    (reference BoomSpikeSlab shrinkage.regression.R /
    Models/Glm/PosteriorSamplers/RegressionShrinkageSampler.hpp:44).

    coefficient_groups: list of index lists partitioning 0..p-1; any
    index not listed gets its own singleton group."""

    coefficient_groups: list = dataclasses.field(default_factory=list)
    _model: Any = None
    _result: McmcResult | None = None

    def fit(self, x, y, niter=500, num_chains=2, burn=300, seed=0,
            **kw):
        import numpy as np

        from boom_tpu.models.glm.extras import RegressionShrinkage

        x = _asfloat(x)
        p = x.shape[1]
        gidx = np.full(p, -1)
        for k, idxs in enumerate(self.coefficient_groups):
            gidx[list(idxs)] = k
        next_free = len(self.coefficient_groups)
        for j in range(p):
            if gidx[j] < 0:
                gidx[j] = next_free
                next_free += 1
        self._model = RegressionShrinkage(
            x=x, y=_asfloat(y), coef_groups=jnp.asarray(gidx),
            num_groups=next_free, **kw)
        self._result = run_mcmc(
            jax.random.key(seed), self._model.kernel(),
            self._model.init_state, num_draws=niter,
            num_chains=num_chains, burn=burn)
        return self

    def coefficient_draws(self):
        return np.asarray(self._result.stacked()["beta"])

    def group_mean_draws(self):
        """[draws, K] shrinkage-group means b_k."""
        return np.asarray(self._result.stacked()["b"])

    def residual_sd_draws(self):
        return np.sqrt(np.asarray(self._result.stacked()["sigsq"]))

    def predict(self, x):
        x = _asfloat(x)
        beta = self._result.stacked()["beta"]
        preds = beta @ x.T
        return (np.asarray(jnp.mean(preds, 0)),
                np.asarray(jnp.std(preds, 0)))


@dataclasses.dataclass
class NnetRegression(SavableFit):
    """Bayesian feed-forward regression front end (reference
    BoomSpikeSlab nnet.R / Models/Nnet
    GaussianFeedForwardNeuralNetwork)."""

    hidden: int = 8
    _model: Any = None
    _result: McmcResult | None = None

    def fit(self, x, y, niter=800, num_chains=2, burn=400, seed=0,
            **kw):
        from boom_tpu.models.nnet import FeedForwardRegression

        self._model = FeedForwardRegression(
            x=_asfloat(x), y=_asfloat(y), hidden=self.hidden, **kw)
        self._result = run_mcmc(
            jax.random.key(seed), self._model.kernel(),
            self._model.init_state, num_draws=niter,
            num_chains=num_chains, burn=burn,
            extract=lambda s: {"weights": s["weights"],
                               "sigsq": s["sigsq"]})
        return self

    def predict(self, x, max_draws=200):
        """Posterior-mean prediction [n] and sd [n]."""
        x = _asfloat(x)
        w = self._result.stacked()["weights"]
        total = jax.tree_util.tree_leaves(w)[0].shape[0]
        take = min(max_draws, total)
        idx = jnp.linspace(0, total - 1, take).astype(jnp.int32)
        sub = jax.tree_util.tree_map(lambda a: a[idx], w)
        preds = jax.vmap(
            lambda ws: self._model.forward(ws, x))(sub)
        return (np.asarray(jnp.mean(preds, 0)),
                np.asarray(jnp.std(preds, 0)))

    def residual_sd_draws(self):
        return np.sqrt(np.asarray(self._result.stacked()["sigsq"]))


@dataclasses.dataclass
class GaussianProcessRegression(SavableFit):
    """GP regression front end (reference Interfaces/python/bayesreg/
    BayesBoom/bayesreg/gaussian_process.py:15, kernels.py
    RadialBasisFunction/MahalanobisKernel, mean_function.py
    ZeroFunction/LinearMeanFunction).

        gp = GaussianProcessRegression(kernel="rbf", mean="linear")
        gp.fit(x, y, niter=500)
        mean, sd = gp.predict(x_new)
    """

    kernel: str = "rbf"  # "rbf" | "mahalanobis"
    mean: str = "zero"   # "zero" | "linear"
    _model: Any = None
    _result: McmcResult | None = None

    def fit(self, x, y, niter=500, num_chains=2, burn=200, seed=0,
            **model_kw):
        from boom_tpu.models.gp import GpRegression

        x, y = _asfloat(x), _asfloat(y)
        h = None
        if self.mean == "linear":
            h = jnp.concatenate([jnp.ones((x.shape[0], 1), x.dtype), x],
                                axis=1)
        self._model = GpRegression(
            x=x, y=y, kernel_type=self.kernel, mean_design=h, **model_kw)
        self._result = run_mcmc(
            jax.random.key(seed), self._model.kernel(),
            self._model.init_state, num_draws=niter,
            num_chains=num_chains, burn=burn)
        return self

    def hyperparameter_draws(self):
        """dict of flattened posterior draws of the kernel params."""
        flat = self._result.stacked()
        out = {"amplitude": np.exp(np.asarray(flat["log_amp"])),
               "residual_sd": np.exp(np.asarray(flat["log_sigma"]))}
        if "log_length" in flat:
            out["lengthscale"] = np.exp(np.asarray(flat["log_length"]))
        if "log_scales" in flat:
            out["scales"] = np.exp(np.asarray(flat["log_scales"]))
        if "beta" in flat:
            out["beta"] = np.asarray(flat["beta"])
        return out

    def predict(self, x_new, seed=0, max_draws=100):
        """Posterior-predictive mean and sd at x_new, integrating over
        hyperparameter draws (function draws per hyperparameter draw)."""
        x_new = _asfloat(x_new)
        h_new = None
        if self.mean == "linear":
            h_new = jnp.concatenate(
                [jnp.ones((x_new.shape[0], 1), x_new.dtype), x_new],
                axis=1)
        flat = self._result.stacked()
        total = jax.tree_util.tree_leaves(flat)[0].shape[0]
        take = min(max_draws, total)
        idx = jnp.linspace(0, total - 1, take).astype(jnp.int32)
        sub = jax.tree_util.tree_map(lambda a: a[idx], flat)
        keys = jax.random.split(jax.random.key(seed), take)
        draws = jax.jit(jax.vmap(
            lambda k, st: self._model.predict_draw(k, st, x_new, h_new)
        ))(keys, sub)
        return (np.asarray(jnp.mean(draws, 0)),
                np.asarray(jnp.std(draws, 0)))


@dataclasses.dataclass
class HierarchicalGaussianProcessRegression(SavableFit):
    """Hierarchical GP front end (reference bayesreg/
    hierarchical_gaussian_process.py:16): a shared prior function plus
    per-group deviation GPs."""

    _model: Any = None
    _result: McmcResult | None = None

    def fit(self, x, y, group, niter=400, num_chains=2, burn=200,
            seed=0, **model_kw):
        """x [n, d], y [n], group [n] integer labels: padded into the
        model's fixed-shape [K, n_max, d] stacks with an observed mask."""
        from boom_tpu.models.gp import HierarchicalGpRegression

        x = np.atleast_2d(np.asarray(x, float))
        if x.shape[0] != len(y):
            x = x.T
        y = np.asarray(y, float)
        group = np.asarray(group)
        self._levels = list(dict.fromkeys(group.tolist()))
        idx = [np.where(group == g)[0] for g in self._levels]
        n_max = max(len(i) for i in idx)
        k = len(idx)
        xp = np.zeros((k, n_max, x.shape[1]))
        yp = np.zeros((k, n_max))
        mask = np.zeros((k, n_max), bool)
        for j, ii in enumerate(idx):
            xp[j, :len(ii)] = x[ii]
            yp[j, :len(ii)] = y[ii]
            mask[j, :len(ii)] = True
        self._model = HierarchicalGpRegression(
            x=_asfloat(xp), y=_asfloat(yp), mask=jnp.asarray(mask),
            **model_kw)
        self._result = run_mcmc(
            jax.random.key(seed), self._model.kernel(),
            self._model.init_state, num_draws=niter,
            num_chains=num_chains, burn=burn)
        return self

    def predict_group(self, x_new, group, max_draws=100):
        """Posterior mean/sd of group's curve at x_new. `group` is a
        label from fit(); x_new is [m, d]."""
        group = self._levels.index(group)
        x_new = np.atleast_2d(np.asarray(x_new, float))
        if x_new.shape[1] != self._model.x.shape[-1]:
            x_new = x_new.T
        flat = self._result.stacked()
        total = jax.tree_util.tree_leaves(flat)[0].shape[0]
        take = min(max_draws, total)
        idx = jnp.linspace(0, total - 1, take).astype(jnp.int32)
        sub = jax.tree_util.tree_map(lambda a: a[idx], flat)
        draws = jax.jit(jax.vmap(
            lambda st: self._model.predict_group(
                st, _asfloat(x_new), group)))(sub)
        return (np.asarray(jnp.mean(draws, 0)),
                np.asarray(jnp.std(draws, 0)))
