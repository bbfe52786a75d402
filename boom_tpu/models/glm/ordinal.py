"""Ordinal regression (cumulative logit/probit with cutpoints).

Reference: Models/Glm/OrdinalCutpointModel.hpp (+
OrdinalLogitPosteriorSampler): y in {0..M-1} from a latent utility
z = x'beta + eps crossing ordered cutpoints c_0 = 0 < c_1 < ... The
logit version augments with truncated-logistic latents + our fitted
normal-mixture table (same machinery as logit.py); cutpoints move by
ordered slice sampling.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from boom_tpu import dists
from boom_tpu.inference.kernels.slice import slice_step
from boom_tpu.models.glm import _mixture_tables as tables
from boom_tpu.models.glm.regression import SpikeSlabPrior
from boom_tpu.models.glm.ssvs import (
    WeightedRegSuf,
    kv_draw_beta,
    kv_draw_indicators,
    sample_mixture_indicator,
)


@dataclasses.dataclass(frozen=True)
class OrdinalLogitSpikeSlab:
    """Cumulative logit with spike-slab coefficients. The first cutpoint
    is fixed at 0 for identification (the reference's convention; the
    intercept column carries location). State: gamma [p], beta [p],
    cuts [M-2] (log-spacing parameterization keeps them ordered)."""

    x: jax.Array  # [n, p]
    y: jax.Array  # [n] ints in [0, M)
    num_levels: int
    prior: SpikeSlabPrior
    max_flips: int | None = None

    @staticmethod
    def from_data(x, y, num_levels, expected_model_size=1.0,
                  prior_information_weight=0.01, **kw):
        prior = SpikeSlabPrior.from_data(
            x, jnp.asarray(y, x.dtype),
            expected_model_size=expected_model_size,
            prior_information_weight=prior_information_weight, **kw)
        return OrdinalLogitSpikeSlab(
            x=x, y=jnp.asarray(y), num_levels=num_levels, prior=prior)

    def _cutpoints(self, log_spacing):
        """[M-1] ordered cutpoints: 0, then cumulative exp spacings."""
        spac = jnp.exp(log_spacing)
        return jnp.concatenate(
            [jnp.zeros((1,), spac.dtype), jnp.cumsum(spac)])

    def init_state(self, key):
        p = self.prior.mean.shape[0]
        pi = jax.nn.sigmoid(self.prior.log_inclusion_odds)
        gamma = jax.random.uniform(key, (p,)) < jnp.maximum(pi, 2.0 / p)
        m = self.num_levels
        return {"gamma": gamma, "beta": jnp.zeros((p,), self.x.dtype),
                "log_spacing": jnp.zeros((m - 2,), self.x.dtype)}

    def loglik(self, beta, log_spacing):
        eta = self.x @ beta
        cuts = self._cutpoints(log_spacing)
        padded = jnp.concatenate(
            [jnp.asarray([-jnp.inf]), cuts, jnp.asarray([jnp.inf])])
        hi = padded[self.y + 1] - eta
        lo = padded[self.y] - eta
        # P(lo < eps <= hi), eps logistic
        p = jax.nn.sigmoid(hi) - jax.nn.sigmoid(lo)
        return jnp.sum(jnp.log(jnp.clip(p, 1e-300, None)))

    def kernel(self):
        w_tab = jnp.asarray(tables.LOGISTIC_WEIGHTS)
        s_tab = jnp.asarray(tables.LOGISTIC_SDS)

        def sweep(key, state):
            kz, km, kg, kb, kc = jax.random.split(key, 5)
            eta = self.x @ state["beta"]
            cuts = self._cutpoints(state["log_spacing"])
            padded = jnp.concatenate(
                [jnp.asarray([-jnp.inf]), cuts, jnp.asarray([jnp.inf])])
            lo = padded[self.y]
            hi = padded[self.y + 1]
            z = dists.trun_logistic.sample(kz, eta, 1.0, lo, hi)
            comp = sample_mixture_indicator(
                km, z - eta, w_tab, jnp.zeros_like(s_tab), s_tab)
            w = 1.0 / s_tab[comp] ** 2
            suf = WeightedRegSuf.from_data(self.x, z, w)
            gamma = kv_draw_indicators(kg, suf, self.prior,
                                       state["gamma"], self.max_flips)
            beta = kv_draw_beta(kb, suf, self.prior, gamma)

            # cutpoint spacings by slice on the exact categorical loglik
            def one_spacing(ls, inp):
                j, k = inp

                def target(v):
                    ls_j = ls.at[j].set(v)
                    return (self.loglik(beta, ls_j)
                            - 0.5 * v * v / 9.0)  # N(0, 3^2) prior

                v_new = slice_step(k, ls[j], target, width=1.0,
                                   lower=-8.0, upper=8.0)
                return ls.at[j].set(v_new), None

            m = self.num_levels
            if m > 2:
                ls, _ = jax.lax.scan(
                    one_spacing, state["log_spacing"],
                    (jnp.arange(m - 2), jax.random.split(kc, m - 2)))
            else:
                ls = state["log_spacing"]
            return {"gamma": gamma, "beta": beta, "log_spacing": ls}

        return sweep

    @staticmethod
    def simulate(key, n, p, num_levels, nonzero, beta_scale=1.5):
        kx, kb, ke = jax.random.split(key, 3)
        x = jax.random.normal(kx, (n, p)).at[:, 0].set(1.0)
        beta = jnp.zeros(p)
        vals = beta_scale * jnp.where(
            jax.random.uniform(kb, (nonzero,)) < 0.5, -1.0, 1.0)
        beta = beta.at[jnp.arange(nonzero)].set(vals)
        eps = dists.logistic.sample(ke, 0.0, 1.0, shape=(n,))
        z = x @ beta + eps
        cuts = jnp.linspace(0.0, 2.0 * (num_levels - 2), num_levels - 1)
        y = jnp.sum(z[:, None] > cuts[None, :], axis=1)
        return x, y, beta, cuts
