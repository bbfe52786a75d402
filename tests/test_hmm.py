"""Config #4 (BASELINE.md): Gaussian-emission HMM — forward-backward +
posterior sampling. Reference test style: Models/HMM/tests."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from boom_tpu import testing
from boom_tpu.inference import run_mcmc
from boom_tpu.models.hmm import (
    GaussianHmm,
    backward_sample,
    forward_filter,
    smoothed_marginals,
    transition_counts,
)
from boom_tpu.models.mixtures import relabel_sorted


def _tiny_hmm():
    trans = jnp.asarray([[0.8, 0.2], [0.3, 0.7]])
    init = jnp.asarray([0.6, 0.4])
    # emission log-liks for T=6, S=2 (arbitrary)
    rng = np.random.default_rng(0)
    ll = jnp.asarray(rng.normal(size=(6, 2)))
    return trans, init, ll


def _brute_force_loglik(trans, init, ll):
    t_len, s = ll.shape
    total = -np.inf
    for path in itertools.product(range(s), repeat=t_len):
        lp = np.log(float(init[path[0]])) + float(ll[0, path[0]])
        for t in range(1, t_len):
            lp += np.log(float(trans[path[t - 1], path[t]]))
            lp += float(ll[t, path[t]])
        total = np.logaddexp(total, lp)
    return total


def test_forward_filter_matches_brute_force():
    trans, init, ll = _tiny_hmm()
    _, loglike = forward_filter(ll, jnp.log(trans), jnp.log(init))
    want = _brute_force_loglik(trans, init, ll)
    np.testing.assert_allclose(float(loglike), want, rtol=1e-10)


def test_smoothed_marginals_match_brute_force():
    trans, init, ll = _tiny_hmm()
    post, _ = smoothed_marginals(ll, jnp.log(trans), jnp.log(init))
    # brute force marginals
    t_len, s = ll.shape
    marg = np.zeros((t_len, s))
    for path in itertools.product(range(s), repeat=t_len):
        lp = np.log(float(init[path[0]])) + float(ll[0, path[0]])
        for t in range(1, t_len):
            lp += np.log(float(trans[path[t - 1], path[t]]))
            lp += float(ll[t, path[t]])
        for t in range(t_len):
            marg[t, path[t]] += np.exp(lp)
    marg /= marg.sum(1, keepdims=True)
    np.testing.assert_allclose(np.asarray(post), marg, rtol=1e-8)


def test_backward_sample_matches_marginals(rng_key):
    trans, init, ll = _tiny_hmm()
    la, _ = forward_filter(ll, jnp.log(trans), jnp.log(init))
    draws = jax.vmap(lambda k: backward_sample(k, la, jnp.log(trans)))(
        jax.random.split(rng_key, 40_000))
    freq = np.asarray(jax.nn.one_hot(draws, 2).mean(0))
    post, _ = smoothed_marginals(ll, jnp.log(trans), jnp.log(init))
    np.testing.assert_allclose(freq, np.asarray(post), atol=0.01)


def test_transition_counts():
    z = jnp.asarray([0, 0, 1, 1, 0, 2])
    c = np.asarray(transition_counts(z, 3))
    want = np.zeros((3, 3))
    for a, b in zip([0, 0, 1, 1, 0], [0, 1, 1, 0, 2]):
        want[a, b] += 1
    np.testing.assert_allclose(c, want)


def test_hmm_gibbs_recovers_truth(rng_key):
    true_trans = [[0.92, 0.08], [0.12, 0.88]]
    true_mu = [-1.5, 1.8]
    true_sd = [0.8, 0.6]
    y, z = GaussianHmm.simulate(rng_key, 1200, true_trans, true_mu, true_sd)
    model = GaussianHmm(y=y, num_states=2)
    res = run_mcmc(jax.random.key(13), model.kernel(), model.init_state,
                   num_draws=1200, num_chains=4, burn=400,
                   extract=lambda s: s)
    mu, sigsq = relabel_sorted(res.draws["mu"], res.draws["sigsq"])
    mu_flat = np.asarray(mu).reshape(-1, 2)
    sd_flat = np.sqrt(np.asarray(sigsq).reshape(-1, 2))
    assert testing.check_mcmc_matrix(mu_flat, true_mu, confidence=0.98)
    assert testing.check_mcmc_matrix(sd_flat, true_sd, confidence=0.98)
    # diagonal of transition matrix, aligned by the mu sort order
    order = np.argsort(np.asarray(res.draws["mu"]).reshape(-1, 2), axis=-1)
    trans = np.asarray(res.draws["trans"]).reshape(-1, 2, 2)
    diag = np.stack([
        trans[np.arange(len(trans)), order[:, 0], order[:, 0]],
        trans[np.arange(len(trans)), order[:, 1], order[:, 1]],
    ], axis=1)
    assert testing.check_mcmc_matrix(diag, [0.92, 0.88], confidence=0.98)


def test_parallel_forward_filter_matches_sequential():
    """O(log T)-depth associative-scan HMM filter (hmm_parallel.py) ==
    the sequential scan, to float tolerance, incl. smoothed marginals
    (SURVEY §5 parallel-prefix forward-backward)."""
    from boom_tpu.models.hmm import forward_filter, smoothed_marginals
    from boom_tpu.models.hmm_parallel import (
        parallel_forward_filter,
        parallel_smoothed_marginals,
    )

    key = jax.random.key(3)
    t_len, s = 900, 4
    log_trans = jax.nn.log_softmax(jax.random.normal(key, (s, s)),
                                   axis=1)
    log_init = jax.nn.log_softmax(
        jax.random.normal(jax.random.fold_in(key, 1), (s,)))
    log_lik = -2.0 * jax.random.normal(
        jax.random.fold_in(key, 2), (t_len, s)) ** 2
    la_s, ll_s = forward_filter(log_lik, log_trans, log_init)
    la_p, ll_p = parallel_forward_filter(log_lik, log_trans, log_init)
    assert abs(float(ll_s - ll_p)) < 1e-8 * abs(float(ll_s))
    assert float(jnp.max(jnp.abs(la_s - la_p))) < 1e-9
    ps, _ = smoothed_marginals(log_lik, log_trans, log_init)
    pp, _ = parallel_smoothed_marginals(log_lik, log_trans, log_init)
    assert float(jnp.max(jnp.abs(ps - pp))) < 1e-9

    # f32 stability at long T (the TPU regime)
    f32 = jnp.float32
    ll32 = jnp.asarray(log_lik, f32)
    la_s32, lls32 = forward_filter(ll32, jnp.asarray(log_trans, f32),
                                   jnp.asarray(log_init, f32))
    la_p32, llp32 = parallel_forward_filter(
        ll32, jnp.asarray(log_trans, f32), jnp.asarray(log_init, f32))
    assert abs(float(lls32 - llp32)) < 1e-4 * abs(float(lls32))
    assert float(jnp.max(jnp.abs(la_s32 - la_p32))) < 1e-3


def test_gaussian_hmm_parallel_filter_option():
    """GaussianHmm(parallel_filter=True) runs the same Gibbs program
    through the associative-scan filter."""
    from boom_tpu.models.hmm import GaussianHmm

    key = jax.random.key(4)
    z = (jnp.cumsum(jax.random.bernoulli(
        key, 0.05, (300,)).astype(jnp.int32)) % 2)
    y = jnp.where(z == 0, -1.5, 1.5) + 0.5 * jax.random.normal(
        jax.random.fold_in(key, 1), (300,))
    model = GaussianHmm(y=y, num_states=2, parallel_filter=True)
    st = model.init_state(jax.random.key(5))
    kern = jax.jit(model.kernel())
    for i in range(60):
        st = kern(jax.random.fold_in(jax.random.key(6), i), st)
    mu = np.sort(np.asarray(st["mu"]))
    assert abs(mu[0] + 1.5) < 0.5 and abs(mu[1] - 1.5) < 0.5, mu
