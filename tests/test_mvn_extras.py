"""WeightedMvn / LowRankMvn / CompositeMixture (models/mvn_extras.py)
— reference Models/WeightedMvnModel.hpp:70, LowRankMvnModel.hpp:45,
CompositeModel.hpp:36."""

import numpy as np
import jax
import jax.numpy as jnp

from boom_tpu.inference import run_mcmc
from boom_tpu.models.mvn_extras import (
    CompositeMixture,
    LowRankMvn,
    WeightedMvnModel,
)


def test_weighted_mvn_recovers_truth():
    key = jax.random.key(0)
    mu_true = jnp.array([1.0, -2.0, 0.5])
    a = jnp.array([[1.0, 0.3, 0.0], [0.3, 1.5, -0.2], [0.0, -0.2, 0.8]])
    sigma_true = a @ a.T / 2.0
    y, w = WeightedMvnModel.simulate(key, 800, mu_true, sigma_true)
    model = WeightedMvnModel(y=y, w=w, kappa=0.01)
    res = run_mcmc(jax.random.key(1), model.kernel(),
                   model.init_state, num_draws=400, num_chains=2,
                   burn=200)
    mu_hat = np.asarray(res.draws["mu"]).reshape(-1, 3).mean(0)
    assert np.allclose(mu_hat, np.asarray(mu_true), atol=0.15)
    sig_hat = np.asarray(res.draws["sigma"]).reshape(-1, 3, 3).mean(0)
    assert np.allclose(sig_hat, np.asarray(sigma_true), atol=0.35)


def test_weighted_mvn_suf_and_loglik():
    key = jax.random.key(2)
    y, w = WeightedMvnModel.simulate(key, 50, jnp.zeros(2), jnp.eye(2))
    model = WeightedMvnModel(y=y, w=w)
    s, syy, n, sumw, sumlogw = model.suf()
    assert np.allclose(np.asarray(s), np.asarray((w[:, None] * y).sum(0)))
    assert float(n) == 50
    # loglik equals the sum of scipy mvn logpdfs with cov Sigma/w_i
    from scipy.stats import multivariate_normal

    mu = np.array([0.1, -0.2])
    sig = np.array([[1.2, 0.3], [0.3, 0.9]])
    want = sum(
        multivariate_normal.logpdf(np.asarray(y)[i], mu,
                                   sig / float(w[i]))
        for i in range(50))
    got = float(model.loglik(jnp.asarray(mu), jnp.asarray(sig)))
    assert np.isclose(got, want, rtol=1e-6)


def test_low_rank_mvn_simulation_and_support():
    mu = jnp.array([1.0, 2.0, 3.0, 4.0])
    b = jnp.array([[1.0, 0.0], [0.5, 1.0], [0.0, 1.0], [1.0, -1.0]])
    sigma = b @ b.T  # rank 2 in R^4
    m = LowRankMvn.from_covariance(mu, sigma)
    assert m.rank == 2
    draws = m.sim(jax.random.key(0), shape=(4000,))
    assert np.allclose(np.asarray(draws.mean(0)), np.asarray(mu),
                       atol=0.1)
    assert np.allclose(np.asarray(jnp.cov(draws.T)),
                       np.asarray(sigma), atol=0.2)
    # on-support point has finite subspace density; off-support -inf
    on = m.sim(jax.random.key(1), shape=(3,))
    lp = m.subspace_logpdf(on)
    assert np.all(np.isfinite(np.asarray(lp)))
    off = on + jnp.array([1.0, 0.0, 0.0, 0.0])  # leave the column space
    lp_off = m.subspace_logpdf(off)
    assert np.all(np.asarray(lp_off) == -np.inf)


def test_composite_mixture_recovers_clusters():
    """Mixed numeric+categorical+count clustering with a shared
    indicator — the CompositeModel-as-mixture-component use case."""
    key = jax.random.key(3)
    weights = jnp.array([0.6, 0.4])
    mu = jnp.array([[-2.0], [2.0]])
    sigsq = jnp.array([[0.5], [0.5]])
    theta = jnp.array([[[0.9, 0.1]], [[0.2, 0.8]]])  # [K, d_cat, L]
    lam = jnp.array([[1.0], [8.0]])
    sim = CompositeMixture.simulate(key, 600, weights, mu, sigsq,
                                    theta=theta, lam=lam)
    model = CompositeMixture(
        numeric=sim["numeric"], categorical=sim["categorical"],
        counts=jnp.asarray(sim["counts"], jnp.float64),
        num_levels=2, num_components=2)
    res = run_mcmc(jax.random.key(4), model.kernel(), model.init_state,
                   num_draws=300, num_chains=2, burn=150)
    # resolve label switching by sorting on mu
    mu_d = np.asarray(res.draws["mu"]).reshape(-1, 2)
    lam_d = np.asarray(res.draws["lam"]).reshape(-1, 2)
    w_d = np.asarray(res.draws["weights"]).reshape(-1, 2)
    order = np.argsort(mu_d, axis=1)
    mu_s = np.take_along_axis(mu_d, order, 1).mean(0)
    lam_s = np.take_along_axis(lam_d, order, 1).mean(0)
    w_s = np.take_along_axis(w_d, order, 1).mean(0)
    assert np.allclose(mu_s, [-2.0, 2.0], atol=0.3)
    assert np.allclose(lam_s, [1.0, 8.0], atol=0.8)
    assert np.allclose(w_s, [0.6, 0.4], atol=0.08)
    # z recovers the simulated clustering (up to the same relabeling)
    z_last = np.asarray(res.draws["z"])[0, -1]
    truth = np.asarray(sim["z"])
    agree = max((z_last == truth).mean(), (z_last != truth).mean())
    assert agree > 0.9


def test_composite_mixture_numeric_only_loglik_finite():
    key = jax.random.key(5)
    x = jax.random.normal(key, (40, 2))
    model = CompositeMixture(numeric=x, categorical=None, counts=None,
                             num_components=3)
    st = model.init_state(jax.random.key(6))
    assert np.isfinite(float(model.log_lik(st)))
    st2 = model.kernel()(jax.random.key(7), st)
    assert st2["mu"].shape == (3, 2)


def test_zero_mean_gaussian_and_mvn():
    from boom_tpu.models.mvn_extras import ZeroMeanGaussian, ZeroMeanMvn

    key = jax.random.key(0)
    y = 1.7 * jax.random.normal(key, (3000,))
    m = ZeroMeanGaussian(y=y)
    st = m.init_state(jax.random.key(1))
    draws = []
    kern = jax.jit(m.kernel())
    for i in range(300):
        st = kern(jax.random.fold_in(key, i), st)
        if i >= 50:
            draws.append(float(st["sigsq"]))
    assert abs(np.sqrt(np.mean(draws)) - 1.7) < 0.1

    cov = jnp.asarray([[2.0, 0.8], [0.8, 1.0]])
    ym = jax.random.multivariate_normal(
        jax.random.key(2), jnp.zeros(2), cov, (4000,))
    mm = ZeroMeanMvn(y=ym)
    stm = mm.init_state(jax.random.key(3))
    kernm = jax.jit(mm.kernel())
    sigs = []
    for i in range(200):
        stm = kernm(jax.random.fold_in(jax.random.key(4), i), stm)
        if i >= 50:
            sigs.append(np.asarray(stm["Sigma"]))
    assert np.abs(np.mean(sigs, 0) - np.asarray(cov)).max() < 0.15


def test_independent_mvn():
    from boom_tpu.models.mvn_extras import IndependentMvn

    key = jax.random.key(5)
    mu = jnp.asarray([1.0, -2.0, 0.0])
    sd = jnp.asarray([0.5, 2.0, 1.0])
    y = mu + sd * jax.random.normal(key, (4000, 3))
    m = IndependentMvn(y=y)
    from boom_tpu.inference import run_mcmc

    res = run_mcmc(jax.random.key(7), m.kernel(), m.init_state, 150,
                   num_chains=2, burn=50)
    mus = np.asarray(res.draws["mu"]).reshape(-1, 3)
    sds = np.sqrt(np.asarray(res.draws["sigsq"])).reshape(-1, 3)
    assert np.abs(mus.mean(0) - np.asarray(mu)).max() < 0.1
    assert np.abs(sds.mean(0) / np.asarray(sd) - 1.0).max() < 0.1


def test_mvn_given_sigma_and_indep_scalar_sigma():
    from boom_tpu.models.mvn_extras import (
        IndependentMvnGivenScalarSigma,
        MvnGivenSigma,
    )
    from scipy.stats import multivariate_normal, norm

    sigma = jnp.asarray([[1.5, 0.4], [0.4, 0.8]])
    prior = MvnGivenSigma(mean=jnp.asarray([1.0, 2.0]), sample_size=4.0)
    x = jnp.asarray([0.7, 2.2])
    want = multivariate_normal.logpdf(
        np.asarray(x), [1.0, 2.0], np.asarray(sigma) / 4.0)
    assert abs(float(prior.logpdf(x, sigma)) - want) < 1e-6
    # conjugate mean draw moments
    draws = jax.vmap(lambda k: prior.posterior_mean_draw(
        k, 100.0, 100.0 * jnp.asarray([0.0, 0.0]), sigma))(
        jax.random.split(jax.random.key(8), 4000))
    want_mean = 4.0 * np.asarray([1.0, 2.0]) / 104.0
    assert np.abs(np.asarray(draws).mean(0) - want_mean).max() < 0.03

    ip = IndependentMvnGivenScalarSigma(
        mean=jnp.asarray([0.0, 1.0]),
        unscaled_variance_diagonal=jnp.asarray([2.0, 0.5]))
    got = float(ip.logpdf(jnp.asarray([0.3, 0.9]), 1.5))
    want = (norm.logpdf(0.3, 0.0, np.sqrt(1.5 * 2.0))
            + norm.logpdf(0.9, 1.0, np.sqrt(1.5 * 0.5)))
    assert abs(got - want) < 1e-6


def test_product_vector():
    from boom_tpu.models.mvn_extras import ProductVector, ZeroMeanGaussian
    from boom_tpu.models.scalar_zoo import Lognormal

    key = jax.random.key(9)
    y1 = 2.0 * jax.random.normal(key, (1000,))
    y2 = jnp.exp(0.3 * jax.random.normal(jax.random.fold_in(key, 1),
                                         (1000,)) + 0.5)
    pv = ProductVector(components=(ZeroMeanGaussian(y=y1),
                                   Lognormal(y=y2)))
    st = pv.init_state(jax.random.key(10))
    kern = jax.jit(pv.kernel())
    for i in range(60):
        st = kern(jax.random.fold_in(jax.random.key(11), i), st)
    assert abs(np.sqrt(float(st["c0"]["sigsq"])) - 2.0) < 0.3
    assert np.isfinite(
        np.asarray(jax.tree_util.tree_leaves(st["c1"]))).all()


def test_independent_mvn_state_shapes_invariant():
    """Round-5 regression guard: the r5 audit found the kernel's
    variance draw passed shape=(p,) with an already-[p] scale — the
    dists convention PREPENDS shape, so sigsq grew one rank per sweep,
    forcing a ~1s recompile per call until XLA's rank limit ABORTED the
    test process. Every kernel must map a state pytree to one of
    identical shapes."""
    from boom_tpu.models.mvn_extras import IndependentMvn

    y = jax.random.normal(jax.random.key(0), (50, 3))
    m = IndependentMvn(y=y)
    st = m.init_state(jax.random.key(1))
    kern = m.kernel()
    st2 = kern(jax.random.key(2), st)
    assert jax.tree_util.tree_map(jnp.shape, st2) == \
        jax.tree_util.tree_map(jnp.shape, st)
