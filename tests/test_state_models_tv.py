"""New state-model blocks: semilocal trend, dynamic regression, holiday,
student LLT — and the time-varying Kalman machinery beneath them.

Reference test pattern: Models/StateSpace/tests/ (dynamic_regression_test,
semilocal_linear_trend_test, random_walk_holiday_test,
student_local_linear_trend_test): simulate, fit, check recovery."""

import jax
import jax.numpy as jnp
import numpy as np

from boom_tpu.statespace import (
    Bsts,
    DynamicRegression,
    LocalLevel,
    RandomWalkHoliday,
    SemilocalLinearTrend,
    SsmParams,
    StudentLocalLinearTrend,
    kalman_filter,
    simulation_smoother,
    smooth_states,
)


def run_bsts(model, key, n_iter=300, n_chains=4, burn=100):
    ki, kr = jax.random.split(key)
    init = jax.vmap(model.init_state)(jax.random.split(ki, n_chains))
    kernel = model.kernel()

    @jax.jit
    def run(keys, state):
        def step(state, ks):
            new = jax.vmap(kernel)(ks, state)
            return new, new

        all_keys = jax.vmap(lambda k: jax.random.split(k, n_iter))(
            keys).swapaxes(0, 1)
        return jax.lax.scan(step, state, all_keys)

    _, draws = run(jax.random.split(kr, n_chains), init)
    return jax.tree_util.tree_map(lambda a: a[burn:], draws)


# -- time-varying Kalman core -------------------------------------------------

def test_tv_filter_matches_static_when_constant(rng_key):
    """Broadcasting static params to time-varying must not change
    anything."""
    t_len, d = 40, 2
    params = SsmParams(
        z=jnp.asarray([1.0, 0.0]),
        t_mat=jnp.asarray([[1.0, 1.0], [0.0, 1.0]]),
        r_mat=jnp.eye(2), q_mat=0.1 * jnp.eye(2),
        h=jnp.asarray(0.5), a0=jnp.zeros(2), p0=jnp.eye(2))
    y = jax.random.normal(rng_key, (t_len,))
    f_static = kalman_filter(params, y)
    params_tv = params._replace(
        z=jnp.broadcast_to(params.z, (t_len, d)),
        h=jnp.broadcast_to(params.h, (t_len,)),
        q_scale=jnp.ones((t_len, 2)))
    f_tv = kalman_filter(params_tv, y)
    np.testing.assert_allclose(float(f_static.loglik), float(f_tv.loglik),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(f_static.a), np.asarray(f_tv.a),
                               atol=1e-10)
    s1 = smooth_states(params, y)
    s2 = smooth_states(params_tv, y)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-9)


def test_tv_z_filter_is_regression(rng_key):
    """With T=I, Q=0, H=sig^2, Z_t = x_t, the Kalman filter posterior is
    Bayesian linear regression: compare against the closed form."""
    kx, ke = jax.random.split(rng_key)
    t_len, p = 60, 3
    x = jax.random.normal(kx, (t_len, p))
    beta = jnp.asarray([1.0, -2.0, 0.5])
    sig = 0.3
    y = x @ beta + sig * jax.random.normal(ke, (t_len,))
    params = SsmParams(
        z=x, t_mat=jnp.eye(p), r_mat=jnp.eye(p),
        q_mat=jnp.zeros((p, p)), h=jnp.asarray(sig**2),
        a0=jnp.zeros(p), p0=10.0 * jnp.eye(p))
    smoothed = smooth_states(params, y)
    # closed form posterior mean of beta
    prec = x.T @ x / sig**2 + jnp.eye(p) / 10.0
    mean = jnp.linalg.solve(prec, x.T @ y / sig**2)
    np.testing.assert_allclose(np.asarray(smoothed[-1]), np.asarray(mean),
                               atol=1e-6)
    # static coefficients: every smoothed state equals the posterior mean
    np.testing.assert_allclose(np.asarray(smoothed[0]), np.asarray(mean),
                               atol=1e-6)


def test_tv_simulation_smoother_moments(rng_key):
    """E[draws] ~= smoothed mean for a time-varying system."""
    kx, ke, ks = jax.random.split(rng_key, 3)
    t_len = 30
    x = jax.random.normal(kx, (t_len, 1)) + 1.0
    params = SsmParams(
        z=x, t_mat=jnp.eye(1), r_mat=jnp.eye(1),
        q_mat=0.05 * jnp.eye(1), h=jnp.asarray(0.2),
        a0=jnp.zeros(1), p0=jnp.eye(1))
    y = jnp.cumsum(0.1 * jax.random.normal(ke, (t_len,))) * x[:, 0]
    mean = smooth_states(params, y)
    draws = jax.vmap(lambda k: simulation_smoother(k, params, y))(
        jax.random.split(ks, 600))
    emp = jnp.mean(draws, 0)
    np.testing.assert_allclose(np.asarray(emp), np.asarray(mean), atol=0.1)


# -- blocks -------------------------------------------------------------------

def test_semilocal_trend_recovers_slope_mean(rng_key):
    """Series with persistent drift: semilocal trend should put the
    imputed long-run slope mean near the true drift."""
    t_len = 300
    drift = 0.5
    y = drift * jnp.arange(t_len, dtype=jnp.float64) + 2.0 * jax.random.normal(
        rng_key, (t_len,))
    model = Bsts(y=y, blocks=[SemilocalLinearTrend.default(y)])
    draws = run_bsts(model, jax.random.key(1))
    # third state component is the long-run slope mean D
    d_draws = draws["alpha"][..., 0, 2]  # t=0 entry (static component)
    d_mean = float(jnp.mean(d_draws))
    assert abs(d_mean - drift) < 0.3, d_mean
    phi_mean = float(jnp.mean(draws["blocks"]["semilocal_trend"]["phi"]))
    assert -1.0 < phi_mean < 1.0


def test_dynamic_regression_tracks_coefficient(rng_key):
    kx, ke = jax.random.split(rng_key)
    t_len = 250
    x = jax.random.normal(kx, (t_len, 1)) * 2.0
    beta_path = jnp.sin(jnp.arange(t_len) / 40.0) * 2.0
    y = x[:, 0] * beta_path + 0.3 * jax.random.normal(ke, (t_len,))
    model = Bsts(
        y=y,
        blocks=[DynamicRegression.default(y, x)],
        obs_prior=None)
    draws = run_bsts(model, jax.random.key(2), n_iter=250, burn=100)
    est_path = np.asarray(jnp.mean(draws["alpha"][..., 0], (0, 1)))
    err = np.sqrt(np.mean((est_path - np.asarray(beta_path)) ** 2))
    assert err < 0.4, err


def test_random_walk_holiday_effect(rng_key):
    """Yearly holiday bump of +5 on one day: the holiday block should
    capture it."""
    t_len = 365 * 3
    period = 365
    active = -jnp.ones((t_len,), jnp.int32)
    holiday_days = jnp.arange(100, t_len, period)
    active = active.at[holiday_days].set(0)
    ke = rng_key
    y = 0.5 * jax.random.normal(ke, (t_len,))
    y = y.at[holiday_days].add(5.0)
    model = Bsts(
        y=y,
        blocks=[
            LocalLevel.default(y),
            RandomWalkHoliday.default(y, active, window=1),
        ])
    draws = run_bsts(model, jax.random.key(3), n_iter=200, n_chains=2,
                     burn=80)
    # holiday state component (last state dim) on an active day
    contrib = draws["alpha"][..., int(holiday_days[1]), 1]
    est = float(jnp.mean(contrib))
    assert abs(est - 5.0) < 1.0, est


def test_student_llt_handles_level_outliers(rng_key):
    """A level path with one big jump: student LLT should follow the jump
    and not inflate sigma_level as much as implied by Gaussian innovations
    (weights flag the jump)."""
    k1, k2 = jax.random.split(rng_key)
    t_len = 200
    level = jnp.cumsum(0.1 * jax.random.normal(k1, (t_len,)))
    level = level + jnp.where(jnp.arange(t_len) >= 100, 8.0, 0.0)
    y = level + 0.3 * jax.random.normal(k2, (t_len,))
    model = Bsts(y=y, blocks=[StudentLocalLinearTrend.default(y)],
                 asis=False)
    draws = run_bsts(model, jax.random.key(4), n_iter=250, n_chains=2,
                     burn=100)
    # the jump step should get a small weight (heavy-tail flag)
    w_jump = float(jnp.mean(
        draws["blocks"]["student_trend"]["w_level"][..., 99]))
    w_typical = float(jnp.mean(
        draws["blocks"]["student_trend"]["w_level"][..., 50]))
    assert w_jump < 0.5 * w_typical, (w_jump, w_typical)
    # fitted level tracks the jump
    lvl_est = np.asarray(jnp.mean(draws["alpha"][..., 0], (0, 1)))
    assert abs(lvl_est[150] - float(level[150])) < 1.5


def test_predict_with_dynamic_regression(rng_key):
    kx, ke = jax.random.split(rng_key)
    t_len = 120
    x = jax.random.normal(kx, (t_len + 10, 1))
    y = 1.5 * x[:t_len, 0] + 0.2 * jax.random.normal(ke, (t_len,))
    model = Bsts(y=y, blocks=[DynamicRegression.default(y, x[:t_len])])
    state = model.init_state(jax.random.key(5))
    kernel = model.kernel()
    for i in range(30):
        state = jax.jit(kernel)(jax.random.key(100 + i), state)
    ys = model.predict(jax.random.key(6), state, horizon=10,
                       future_z={"dynamic_regression": x[t_len:]})
    assert ys.shape == (10,)
    assert bool(jnp.all(jnp.isfinite(ys)))
