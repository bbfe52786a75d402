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
