"""DP mixtures (truncated stick-breaking) and SMC (resamplers, bootstrap
filter, Liu-West joint state+parameter filter)."""

import jax
import jax.numpy as jnp
import numpy as np

from boom_tpu.inference.smc import (
    LiuWestFilter,
    bootstrap_filter,
    ess_of_log_weights,
    multinomial_resample,
    residual_resample,
    systematic_resample,
)
from boom_tpu.models.dirichlet_process import (  # noqa: E402
    DpGaussianMixture,
    DpMvnMixture,
    draw_sticks,
    stick_breaking_weights,
)
from boom_tpu.models.mixtures import GaussianMixtureModel  # noqa: E402


# -- stick breaking -----------------------------------------------------------

def test_stick_breaking_weights_sum_to_one(rng_key):
    v = jax.random.uniform(rng_key, (7,))
    w = stick_breaking_weights(v)
    np.testing.assert_allclose(float(jnp.sum(w)), 1.0, rtol=1e-10)
    assert bool(jnp.all(w >= 0))


def test_draw_sticks_posterior_mean(rng_key):
    counts = jnp.asarray([50.0, 30.0, 0.0, 0.0])
    draws = jax.vmap(lambda k: draw_sticks(k, counts, 1.0))(
        jax.random.split(rng_key, 4000))
    # v_0 ~ Beta(51, 31): mean 51/82
    np.testing.assert_allclose(float(jnp.mean(draws[:, 0])), 51 / 82,
                               atol=0.01)


def test_dp_gaussian_recovers_cluster_count(rng_key):
    y, _ = GaussianMixtureModel.simulate(
        rng_key, 400, [0.4, 0.35, 0.25], [-4.0, 0.0, 4.0],
        [0.5, 0.5, 0.5])
    model = DpGaussianMixture(y=y, max_components=15, sigma_guess=0.7)
    kernel = model.kernel()

    @jax.jit
    def run(key):
        state = model.init_state(key)

        def step(st, k):
            st = kernel(k, st)
            return st, model.occupied_components(st)

        return jax.lax.scan(step, state,
                            jax.random.split(jax.random.key(7), 400))

    _, occ = run(jax.random.key(3))
    mode_occ = int(np.bincount(np.asarray(occ[200:])).argmax())
    assert 2 <= mode_occ <= 5, mode_occ


def test_dp_mvn_mixture_runs_and_separates(rng_key):
    k1, k2 = jax.random.split(rng_key)
    n = 300
    z = jax.random.bernoulli(k1, 0.5, (n,))
    means = jnp.where(z[:, None], jnp.asarray([3.0, 3.0]),
                      jnp.asarray([-3.0, -3.0]))
    y = means + jax.random.normal(k2, (n, 2))
    model = DpMvnMixture(y=y, max_components=10)
    kernel = model.kernel()
    state = model.init_state(jax.random.key(1))

    @jax.jit
    def run(state):
        def step(st, k):
            return kernel(k, st), None

        st, _ = jax.lax.scan(step, state,
                             jax.random.split(jax.random.key(2), 200))
        return st

    state = run(state)
    # hard-assign observations; occupied components should sit near the
    # two true means and each true mean should be matched by one of them
    from boom_tpu import dists as bd

    logp = jax.vmap(
        lambda m, si: bd.mvn.logpdf_prec(y, m, si),
        out_axes=1)(state["mu"], state["siginv"])
    w = stick_breaking_weights(state["v"])
    z = np.asarray(jnp.argmax(
        logp + jnp.log(jnp.clip(w, 1e-300, None)), -1))
    counts = np.bincount(z, minlength=10)
    occupied = np.where(counts > 30)[0]
    assert len(occupied) >= 2, counts
    mus = np.asarray(state["mu"])[occupied]
    truth = np.asarray([[3.0, 3.0], [-3.0, -3.0]])
    for tmean in truth:
        d2 = np.linalg.norm(mus - tmean[None], axis=-1).min()
        assert d2 < 1.0, (mus, tmean)


# -- resamplers ---------------------------------------------------------------

def test_resamplers_are_unbiased(rng_key):
    log_w = jnp.log(jnp.asarray([0.1, 0.2, 0.3, 0.4]))
    for fn in (multinomial_resample, systematic_resample,
               residual_resample):
        idx = jax.vmap(lambda k: fn(k, log_w))(
            jax.random.split(rng_key, 3000))
        freq = np.bincount(np.asarray(idx).ravel(), minlength=4) / idx.size
        np.testing.assert_allclose(freq, [0.1, 0.2, 0.3, 0.4], atol=0.02), fn


def test_ess_of_log_weights():
    lw = jnp.zeros((100,))
    np.testing.assert_allclose(float(ess_of_log_weights(lw)), 100.0,
                               rtol=1e-6)
    lw = jnp.log(jnp.asarray([1.0] + [1e-12] * 99))
    assert float(ess_of_log_weights(lw)) < 1.5


# -- bootstrap filter ---------------------------------------------------------

def test_bootstrap_filter_loglik_matches_kalman(rng_key):
    """Local-level model: PF loglik should approximate the exact Kalman
    loglik."""
    from boom_tpu.statespace import SsmParams, kalman_filter

    k1, k2 = jax.random.split(rng_key)
    t_len, sig_state, sig_obs = 50, 0.3, 0.5
    lvl = jnp.cumsum(sig_state * jax.random.normal(k1, (t_len,)))
    y = lvl + sig_obs * jax.random.normal(k2, (t_len,))
    params = SsmParams(
        z=jnp.ones(1), t_mat=jnp.eye(1), r_mat=jnp.eye(1),
        q_mat=sig_state**2 * jnp.eye(1), h=jnp.asarray(sig_obs**2),
        a0=jnp.zeros(1), p0=jnp.eye(1))
    exact = float(kalman_filter(params, y).loglik)

    n_part = 4000
    init = jax.random.normal(jax.random.key(5), (n_part, 1))

    def transition(k, p):
        return p + sig_state * jax.random.normal(k, p.shape)

    def log_obs(y_t, p):
        return -0.5 * ((y_t - p[:, 0]) / sig_obs) ** 2 - 0.5 * jnp.log(
            2 * jnp.pi * sig_obs**2)

    _, _, ll, _ = jax.jit(
        lambda k: bootstrap_filter(k, y, init, transition, log_obs))(
        jax.random.key(6))
    assert abs(float(ll) - exact) < 2.0, (float(ll), exact)


# -- Liu-West -----------------------------------------------------------------

def test_liu_west_learns_parameter(rng_key):
    """AR(1) with unknown coefficient phi=0.8: Liu-West should converge
    the parameter cloud toward the truth."""
    k1, k2 = jax.random.split(rng_key)
    t_len, phi_true, sig = 400, 0.8, 0.3
    x = jnp.zeros(())
    xs = []
    key_sim = k1
    val = 0.0
    noise = sig * jax.random.normal(k1, (t_len,))
    series = []
    v = 0.0
    for t in range(t_len):
        v = phi_true * v + float(noise[t])
        series.append(v)
    xs = jnp.asarray(series)
    y = xs + 0.2 * jax.random.normal(k2, (t_len,))

    n_part = 2000
    init_state = jnp.zeros((n_part, 1))
    init_theta = jax.random.uniform(jax.random.key(3), (n_part, 1),
                                    minval=-0.5, maxval=1.0)

    lw = LiuWestFilter(
        predict_state=lambda s, th: jnp.clip(th, -0.99, 0.99) * s,
        transition=lambda k, s, th: (
            jnp.clip(th, -0.99, 0.99) * s
            + sig * jax.random.normal(k, s.shape)),
        log_obs=lambda y_t, s, th: -0.5 * ((y_t - s[:, 0]) / 0.2) ** 2,
        discount=0.98)
    _, theta, logw, theta_path = jax.jit(
        lambda k: lw.run(k, y, init_state, init_theta))(jax.random.key(4))
    final_phi = float(theta_path[-1, 0])
    assert abs(final_phi - phi_true) < 0.15, final_phi
