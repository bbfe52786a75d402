"""HMM EM (Baum-Welch), GeneralHmm wrapper, nested Clickstream HMM,
and the Bsts MLE path.

Reference: Models/HMM/HmmFilter.hpp:116 (HmmEmFilter),
Models/HMM/GeneralHmm.hpp, Models/HMM/Clickstream/,
ModelTypes.hpp:138 (MLE_Model).
"""

import jax
import jax.numpy as jnp
import numpy as np

from boom_tpu.inference import run_mcmc
from boom_tpu.models.hmm import (
    GaussianHmm,
    GeneralHmm,
    NestedHmm,
    hmm_em_gaussian,
    pairwise_smoothed,
)
from boom_tpu.statespace import Bsts, LocalLinearTrend


def test_hmm_em_recovers_parameters(rng_key):
    trans = jnp.asarray([[0.92, 0.08], [0.15, 0.85]])
    means = jnp.asarray([-1.0, 2.0])
    sds = jnp.asarray([0.6, 0.8])
    y, _ = GaussianHmm.simulate(rng_key, 3000, trans, means, sds)
    t_hat, m_hat, s_hat, _, lls = hmm_em_gaussian(y, 2, iters=150)
    order = np.argsort(np.asarray(m_hat))
    np.testing.assert_allclose(np.asarray(m_hat)[order],
                               np.asarray(means), atol=0.1)
    np.testing.assert_allclose(np.asarray(s_hat)[order],
                               np.asarray(sds), atol=0.1)
    t_sorted = np.asarray(t_hat)[np.ix_(order, order)]
    np.testing.assert_allclose(np.diag(t_sorted), [0.92, 0.85],
                               atol=0.04)
    # EM monotone in log likelihood (allow tiny numeric wiggle)
    lls = np.asarray(lls)
    assert (np.diff(lls) > -1e-4).all()


def test_pairwise_smoothed_consistency(rng_key):
    """xi marginals must match gamma."""
    trans = jnp.asarray([[0.9, 0.1], [0.2, 0.8]])
    means = jnp.asarray([0.0, 3.0])
    y, _ = GaussianHmm.simulate(rng_key, 400, trans, means,
                                jnp.asarray([1.0, 1.0]))
    from boom_tpu import dists

    ll = dists.normal.logpdf(y[:, None], means[None], 1.0)
    gamma, xi, loglik = pairwise_smoothed(
        ll, jnp.log(trans), jnp.log(jnp.asarray([0.5, 0.5])))
    np.testing.assert_allclose(np.asarray(xi.sum((1, 2))), 1.0,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(xi.sum(2)),
                               np.asarray(gamma[:-1]), atol=1e-6)
    assert np.isfinite(float(loglik))


def test_general_hmm_poisson_emissions(rng_key):
    """GeneralHmm with user-supplied Poisson emissions recovers the
    state-dependent rates."""
    from boom_tpu import dists

    k1, k2 = jax.random.split(rng_key)
    trans = jnp.asarray([[0.95, 0.05], [0.1, 0.9]])
    rates = jnp.asarray([2.0, 9.0])
    _, z = GaussianHmm.simulate(k1, 2000, trans, jnp.zeros(2),
                                jnp.ones(2))
    y = jax.random.poisson(k2, rates[z])

    def emission_loglik(params, y):
        return dists.poisson.logpmf(y[:, None], params["rate"][None])

    def draw_emission(key, params, y, z):
        counts = jax.ops.segment_sum(jnp.asarray(y, jnp.float32), z, 2)
        n_k = jax.ops.segment_sum(jnp.ones(y.shape), z, 2)
        return {"rate": dists.gamma.sample(
            key, counts + 1.0, n_k + 0.5)}

    def init_emission(key):
        return {"rate": jnp.asarray([1.0, 5.0])}

    model = GeneralHmm(y=y, num_states=2,
                       emission_loglik=emission_loglik,
                       draw_emission_params=draw_emission,
                       init_emission_params=init_emission)
    res = run_mcmc(jax.random.key(1), model.kernel(), model.init_state,
                   num_draws=200, num_chains=2, burn=100)
    for c in range(2):
        r = np.sort(np.asarray(jnp.mean(
            res.draws["emission"]["rate"][c], 0)))
        np.testing.assert_allclose(r, np.asarray(rates), rtol=0.08)


def test_nested_hmm_recovers_structure(rng_key):
    """Two session types with very different within-session dynamics."""
    rng = np.random.default_rng(3)
    sc, sf, v = 2, 2, 3
    coarse_trans = np.asarray([[0.7, 0.3], [0.3, 0.7]])
    fine_trans = np.asarray([
        [[0.9, 0.1], [0.1, 0.9]],   # session type 0: sticky
        [[0.2, 0.8], [0.8, 0.2]],   # session type 1: alternating
    ])
    fine_init = np.asarray([[0.9, 0.1], [0.5, 0.5]])
    emit = np.asarray([
        [[0.8, 0.1, 0.1], [0.1, 0.8, 0.1]],
        [[0.1, 0.1, 0.8], [0.4, 0.3, 0.3]],
    ])
    y, newsess = [], []
    h = 0
    for sess in range(120):
        h = rng.choice(sc, p=coarse_trans[h]) if sess else 0
        length = rng.integers(5, 15)
        l = rng.choice(sf, p=fine_init[h])
        for t in range(length):
            if t:
                l = rng.choice(sf, p=fine_trans[h, l])
            y.append(rng.choice(v, p=emit[h, l]))
            newsess.append(t == 0)
    model = NestedHmm(y=jnp.asarray(y), new_session=jnp.asarray(newsess),
                      num_coarse=sc, num_fine=sf, num_symbols=v)
    res = run_mcmc(rng_key, model.kernel(), model.init_state,
                   num_draws=300, num_chains=1, burn=300)
    # identify session types by their emission signature for symbol 2
    em = np.asarray(jnp.mean(res.draws["emit"][0], 0))  # [sc, sf, v]
    # type-1 sessions emit symbol 2 heavily from fine state 0
    sym2 = em[:, :, 2].max(axis=1)
    h1 = int(np.argmax(sym2))
    h0 = 1 - h1
    ft = np.asarray(jnp.mean(res.draws["fine_trans"][0], 0))
    # sticky session type: high self-transition; alternating: low
    sticky = np.diag(ft[h0]).mean()
    alt = np.diag(ft[h1]).mean()
    assert sticky > 0.7, (sticky, ft)
    assert alt < 0.45, (alt, ft)


def test_bsts_mle(rng_key):
    k1, k2, k3 = jax.random.split(rng_key, 3)
    t_len = 400
    slope = jnp.cumsum(0.02 * jax.random.normal(k3, (t_len,)))
    lvl = jnp.cumsum(slope + 0.3 * jax.random.normal(k1, (t_len,)))
    y = lvl + 0.5 * jax.random.normal(k2, (t_len,))
    model = Bsts(y=y, blocks=[LocalLinearTrend.default(y)])
    st, ll = model.mle()
    assert np.isfinite(float(ll))
    sd_obs = float(jnp.sqrt(st["sigsq_obs"]))
    sd_lvl = float(jnp.sqrt(st["blocks"]["trend"]["sigma_level_sq"]))
    assert abs(sd_obs - 0.5) < 0.15, sd_obs
    assert abs(sd_lvl - 0.3) < 0.15, sd_lvl
    # MLE loglik beats the starting point's
    st0 = model.init_state(jax.random.key(0))
    assert float(ll) >= float(model.log_lik(st0)) - 1e-6
