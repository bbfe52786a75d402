"""Multi-armed bandits with Thompson sampling.

Reference: Bandits/ (top level) — BinomialBandit (BinomialBandit.hpp),
LogitBandit (LogitBandit.hpp, contextual with logistic rewards),
bandit_functions.hpp compute_optimal_arm_probabilities, and
stats/optimal_arm_probabilities.hpp. Python front end
Interfaces/python/bandits.

TPU form: arm posteriors are closed-form (Beta) or the logit spike-slab
machinery; optimal-arm probabilities are one vectorized Monte Carlo
(draws [S, K] -> argmax histogram), which is exactly the reference's
algorithm but batched.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from boom_tpu import dists


@dataclasses.dataclass(frozen=True)
class BinomialBandit:
    """K-armed Bernoulli bandit with Beta priors (reference
    BinomialBandit.hpp). State = (successes, trials) per arm."""

    num_arms: int
    prior_a: float = 1.0
    prior_b: float = 1.0

    def init_state(self):
        k = self.num_arms
        return {"successes": jnp.zeros((k,)), "trials": jnp.zeros((k,))}

    def posterior_params(self, state):
        a = self.prior_a + state["successes"]
        b = self.prior_b + state["trials"] - state["successes"]
        return a, b

    def draw_arm(self, key, state):
        """Thompson sampling: draw a reward prob per arm, play argmax."""
        a, b = self.posterior_params(state)
        theta = dists.beta.sample(key, a, b)
        return jnp.argmax(theta)

    def update(self, state, arm, reward):
        onehot = jax.nn.one_hot(arm, self.num_arms)
        return {"successes": state["successes"] + onehot * reward,
                "trials": state["trials"] + onehot}

    def optimal_arm_probabilities(self, key, state, num_draws=2000):
        """P(arm k is best) by Monte Carlo over the joint posterior
        (reference compute_optimal_arm_probabilities,
        bandit_functions.hpp)."""
        a, b = self.posterior_params(state)
        draws = dists.beta.sample(key, a, b, shape=(num_draws,))
        best = jnp.argmax(draws, axis=-1)
        return jnp.mean(jax.nn.one_hot(best, self.num_arms), axis=0)

    def run(self, key, true_probs, num_steps):
        """Simulate a full Thompson-sampling run against true arm probs.
        Returns (final_state, arms_played, rewards)."""
        true_probs = jnp.asarray(true_probs)

        def step(state, k):
            k_draw, k_rew = jax.random.split(k)
            arm = self.draw_arm(k_draw, state)
            reward = jnp.asarray(
                jax.random.uniform(k_rew, ()) < true_probs[arm],
                true_probs.dtype)
            return self.update(state, arm, reward), (arm, reward)

        state, (arms, rewards) = jax.lax.scan(
            step, self.init_state(), jax.random.split(key, num_steps))
        return state, arms, rewards


@dataclasses.dataclass(frozen=True)
class LogitBandit:
    """Contextual bandit with logistic reward model (reference
    LogitBandit.hpp): reward ~ Bernoulli(sigmoid(x_arm' beta)). The
    posterior over beta is tracked by a Laplace-style Gaussian updated
    in mini-batches via the logit data-augmentation machinery; Thompson
    sampling draws beta and plays the best arm context."""

    dim: int
    prior_precision: float = 1.0

    def init_state(self):
        d = self.dim
        return {"prec": self.prior_precision * jnp.eye(d),
                "prec_mean": jnp.zeros((d,))}

    def draw_beta(self, key, state):
        return dists.mvn.sample_suf(key, state["prec_mean"], state["prec"])

    def draw_arm(self, key, state, contexts):
        """contexts: [K, d]. Thompson: draw beta, play argmax utility."""
        beta = self.draw_beta(key, state)
        return jnp.argmax(contexts @ beta)

    def update(self, key, state, x, reward):
        """Assimilate one (context, reward) pair with one step of logit
        augmentation at the current posterior mean (online approximate
        conjugate update; the reference's LogitBanditPosteriorSampler
        re-runs MCMC — the streaming form keeps TPU-side state O(d^2))."""
        from boom_tpu.models.glm import _mixture_tables as tables
        from boom_tpu.models.glm.logit import impute_logit_latent
        from boom_tpu.models.glm.ssvs import sample_mixture_indicator

        kz, km = jax.random.split(key)
        beta_mean = jnp.linalg.solve(state["prec"], state["prec_mean"])
        eta = x @ beta_mean
        z = impute_logit_latent(kz, eta, reward)
        s_tab = jnp.asarray(tables.LOGISTIC_SDS)
        comp = sample_mixture_indicator(
            km, z - eta, jnp.asarray(tables.LOGISTIC_WEIGHTS),
            jnp.zeros_like(s_tab), s_tab)
        w = 1.0 / s_tab[comp] ** 2
        return {"prec": state["prec"] + w * jnp.outer(x, x),
                "prec_mean": state["prec_mean"] + w * z * x}


def arm_map(factor_levels):
    """Enumerate the arms of a factorial experiment: the cartesian
    product of factor levels, row i = the integer level of each factor
    for arm i (reference ArmMap, Bandits/LinearBanditEncoder.hpp:26;
    ExperimentStructure in stats/Design.hpp). factor_levels: sequence of
    ints (#levels per factor). Returns [n_arms, n_factors] int array."""
    grids = jnp.meshgrid(*[jnp.arange(n) for n in factor_levels],
                         indexing="ij")
    return jnp.stack([g.ravel() for g in grids], axis=1)


def effects_encode(levels, num_levels):
    """Effects (sum-to-zero) coding with the LAST level as baseline:
    level j < L-1 -> e_j, level L-1 -> -1 vector (reference
    EffectsEncoder, stats/Encoders.hpp, as used by ExperimentArmEncoder,
    LinearBanditEncoder.hpp:83). levels: [n] ints -> [n, L-1]."""
    one_hot = jax.nn.one_hot(levels, num_levels)
    return one_hot[:, :-1] - one_hot[:, -1:]


@dataclasses.dataclass(frozen=True)
class LinearBandit:
    """Linear (Gaussian-reward) bandit over a factorial experiment
    (reference Bandits/LinearBanditEncoder.hpp:137 + the linear bandit
    workflow in Interfaces/python/bandits): arms are cells of a
    factorial design, encoded by effects coding plus an intercept and
    optional per-observation context; rewards follow
        r ~ N(x(arm, context)' beta, sigsq)
    with a conjugate normal-inverse-gamma posterior, so Thompson
    sampling draws (beta, sigsq) in closed form.

    State: (prec [p, p], prec_mean [p], sse scalar, n scalar)."""

    factor_levels: tuple
    context_dim: int = 0
    prior_precision: float = 1.0
    sigsq_a: float = 1.0
    sigsq_b: float = 1.0

    @property
    def arms(self):
        return arm_map(self.factor_levels)

    @property
    def dim(self):
        return (1 + sum(n - 1 for n in self.factor_levels)
                + self.context_dim)

    def encode(self, arms, context=None):
        """arms: [n] arm indices -> [n, p] design rows."""
        arms = jnp.atleast_1d(arms)
        amap = self.arms
        cols = [jnp.ones((arms.shape[0], 1))]
        for f, n_lev in enumerate(self.factor_levels):
            cols.append(effects_encode(amap[arms, f], n_lev))
        if self.context_dim:
            ctx = jnp.broadcast_to(
                context, (arms.shape[0], self.context_dim))
            cols.append(ctx)
        return jnp.concatenate(cols, axis=1)

    def init_state(self):
        p = self.dim
        return {"prec": self.prior_precision * jnp.eye(p),
                "prec_mean": jnp.zeros((p,)),
                "sse": jnp.asarray(0.0), "n": jnp.asarray(0.0)}

    def draw_beta(self, key, state):
        """(beta, sigsq) from the NIG posterior."""
        kb, ks = jax.random.split(key)
        mean = jnp.linalg.solve(state["prec"], state["prec_mean"])
        a = self.sigsq_a + 0.5 * state["n"]
        b = self.sigsq_b + 0.5 * jnp.maximum(
            state["sse"] - state["prec_mean"] @ mean, 0.0)
        sigsq = b / dists.gamma.sample(ks, a, 1.0)
        chol = jnp.linalg.cholesky(state["prec"])
        z = jax.random.normal(kb, mean.shape)
        beta = mean + jnp.sqrt(sigsq) * jax.scipy.linalg.solve_triangular(
            chol.T, z, lower=False)
        return beta, sigsq

    def draw_arm(self, key, state, context=None):
        """Thompson sampling over all arms."""
        beta, _ = self.draw_beta(key, state)
        n_arms = self.arms.shape[0]
        x = self.encode(jnp.arange(n_arms), context)
        return jnp.argmax(x @ beta)

    def update(self, state, arm, reward, context=None):
        x = self.encode(jnp.atleast_1d(arm), context)[0]
        return {"prec": state["prec"] + jnp.outer(x, x),
                "prec_mean": state["prec_mean"] + reward * x,
                "sse": state["sse"] + reward * reward,
                "n": state["n"] + 1.0}

    def optimal_arm_probabilities(self, key, state, context=None,
                                  num_draws=2000):
        n_arms = self.arms.shape[0]
        x = self.encode(jnp.arange(n_arms), context)
        mean = jnp.linalg.solve(state["prec"], state["prec_mean"])
        a = self.sigsq_a + 0.5 * state["n"]
        b = self.sigsq_b + 0.5 * jnp.maximum(
            state["sse"] - state["prec_mean"] @ mean, 0.0)
        ks, kb = jax.random.split(key)
        sigsq = b / dists.gamma.sample(ks, a, 1.0, shape=(num_draws,))
        chol = jnp.linalg.cholesky(state["prec"])
        z = jax.random.normal(kb, (num_draws,) + mean.shape)
        betas = mean + jnp.sqrt(sigsq)[:, None] * jax.scipy.linalg.\
            solve_triangular(chol.T, z.T, lower=False).T
        best = jnp.argmax(betas @ x.T, axis=-1)
        return jnp.mean(jax.nn.one_hot(best, n_arms), axis=0)

    def run(self, key, true_beta, sigma, num_steps, context=None):
        """Simulate a Thompson-sampling run against a true linear model."""
        true_beta = jnp.asarray(true_beta)

        def step(state, k):
            k_draw, k_rew = jax.random.split(k)
            arm = self.draw_arm(k_draw, state, context)
            x = self.encode(jnp.atleast_1d(arm), context)[0]
            reward = x @ true_beta + sigma * jax.random.normal(k_rew, ())
            return self.update(state, arm, reward, context), (arm, reward)

        state, (arms, rewards) = jax.lax.scan(
            step, self.init_state(), jax.random.split(key, num_steps))
        return state, arms, rewards
