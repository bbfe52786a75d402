"""Smoke tier: one fast end-to-end touch per heavy module.

Every module whose statistical tests are all marked slow (see
_slow_manifest.py) gets a few-iteration smoke here: build the model, jit
the real kernel, run a handful of sweeps, assert finiteness/shape. These
catch import errors, shape bugs, and jit regressions in < a few seconds
each; the statistical recover-truth tests stay in the full tier.
"""

import jax
import jax.numpy as jnp
import numpy as np

from boom_tpu.inference import run_mcmc


def _finite(tree):
    return all(bool(jnp.all(jnp.isfinite(leaf)))
               for leaf in jax.tree_util.tree_leaves(tree)
               if jnp.issubdtype(leaf.dtype, jnp.floating))


def _run_few(model, key=None, draws=5, chains=2, **kw):
    key = key if key is not None else jax.random.key(0)
    res = run_mcmc(key, model.kernel(), model.init_state,
                   num_draws=draws, num_chains=chains, **kw)
    assert _finite(res.final_state)
    return res


def test_smoke_bsts(rng_key):
    from boom_tpu.statespace import Bsts, LocalLinearTrend, Seasonal

    y = jnp.cumsum(0.3 * jax.random.normal(rng_key, (48,))) + 2.0
    model = Bsts(y=y, blocks=[LocalLinearTrend.default(y),
                              Seasonal.default(y, nseasons=4)],
                 asis=False)
    res = _run_few(model)
    final = jax.tree_util.tree_map(lambda a: a[0], res.final_state)
    ys = model.predict(jax.random.key(1), final, horizon=4)
    assert ys.shape[-1] == 4 and _finite(ys)


def test_smoke_families_logit(rng_key):
    from boom_tpu.statespace import LocalLevel, SdPrior
    from boom_tpu.statespace.families import NonGaussianBsts

    y = (jax.random.uniform(rng_key, (40,)) < 0.5).astype(jnp.int32)
    model = NonGaussianBsts(
        y=y, blocks=[LocalLevel(sigma_prior=SdPrior(0.1, upper_limit=2.0),
                                initial_mean=0.0, initial_sd=2.0)],
        family="logit")
    _run_few(model)


def test_smoke_holiday_blocks(rng_key):
    from boom_tpu.statespace import Bsts, LocalLevel, RegressionHoliday

    t_len = 60
    wh = jnp.full((t_len,), -1, jnp.int32).at[10].set(0).at[40].set(0)
    wd = jnp.zeros((t_len,), jnp.int32)
    y = jax.random.normal(rng_key, (t_len,))
    block = RegressionHoliday(which_holiday=wh, which_day=wd,
                              num_holidays=1, window=1, prior_sd=2.0)
    model = Bsts(y=y, blocks=[LocalLevel.default(y), block])
    _run_few(model)


def test_smoke_mixed_impute(rng_key):
    from boom_tpu.models.mixed_impute import MixedDataImputer

    k1, k2 = jax.random.split(rng_key)
    num = jax.random.normal(k1, (60, 2))
    num = num.at[::7, 0].set(jnp.nan)
    cats = jax.random.randint(k2, (60, 1), 0, 3)
    cats = cats.at[::5, 0].set(-1)
    model = MixedDataImputer.from_frame(num, cats, num_levels=(3,),
                                        atoms=[[0.0], []][:1],
                                        num_clusters=2)
    res = _run_few(model, chains=1)
    final = jax.tree_util.tree_map(lambda a: a[0], res.final_state)
    num_imp, cat_imp = model.imputed_frame(final)
    assert _finite(num_imp)


def test_smoke_parallel_kalman(rng_key):
    from boom_tpu.statespace import SsmParams, smooth_states
    from boom_tpu.statespace.parallel_kalman import parallel_smooth_states

    params = SsmParams(
        z=jnp.asarray([1.0, 0.0]),
        t_mat=jnp.asarray([[1.0, 1.0], [0.0, 1.0]]),
        r_mat=jnp.eye(2), q_mat=0.1 * jnp.eye(2), h=jnp.asarray(0.4),
        a0=jnp.zeros(2), p0=jnp.eye(2))
    y = jax.random.normal(rng_key, (64,))
    np.testing.assert_allclose(np.asarray(parallel_smooth_states(params, y)),
                               np.asarray(smooth_states(params, y)),
                               atol=1e-8)


def test_smoke_api_lm_spike(rng_key):
    from boom_tpu.api import LmSpike

    k1, k2 = jax.random.split(rng_key)
    x = jax.random.normal(k1, (100, 5))
    y = 2.0 * x[:, 0] + 0.5 * jax.random.normal(k2, (100,))
    fit = LmSpike(expected_model_size=2.0).fit(
        np.asarray(x), np.asarray(y), niter=20, num_chains=1, burn=5)
    assert len(fit.coefficients()) == 5


def test_smoke_hmm(rng_key):
    from boom_tpu.models.hmm import CategoricalHmm

    trans = jnp.asarray([[0.9, 0.1], [0.2, 0.8]])
    emit = jnp.asarray([[0.7, 0.2, 0.1], [0.1, 0.3, 0.6]])
    y, _ = CategoricalHmm.simulate(rng_key, 120, trans, emit,
                                   jnp.asarray([0.5, 0.5]))
    model = CategoricalHmm(y=y, num_states=2, num_symbols=3)
    _run_few(model)


def test_smoke_beta_binomial(rng_key):
    from boom_tpu.models import BetaBinomialModel

    n, y = BetaBinomialModel.simulate(rng_key, 30, 10, 6.0, 14.0)
    model = BetaBinomialModel(trials=n, successes=y)
    _run_few(model, draws=10)


def test_smoke_dp_collapsed(rng_key):
    from boom_tpu.models.dirichlet_process import DpMvnCollapsed

    y = jax.random.normal(rng_key, (50, 2))
    model = DpMvnCollapsed(y=y, max_components=6, alpha=1.0)
    state = {"z": jnp.zeros((50,), jnp.int32)}
    kern = jax.jit(model.kernel())
    for i in range(3):
        state = kern(jax.random.fold_in(jax.random.key(1), i), state)
    assert int(model.num_clusters(state)) >= 1


def test_smoke_glm_breadth(rng_key):
    from boom_tpu.models.glm.breadth import GammaRegression

    k1, k2 = jax.random.split(rng_key)
    x = jax.random.normal(k1, (80, 3))
    y = jnp.exp(0.5 * x[:, 0]) * jax.random.gamma(k2, 3.0, (80,)) / 3.0
    model = GammaRegression(x=x, y=y)
    _run_few(model)


def test_smoke_tim(rng_key):
    from boom_tpu.inference.kernels.tim import tim_kernel

    def log_target(state, _=None):
        x = state["x"]
        return -0.5 * jnp.sum(x * x)

    kern = tim_kernel("x", log_target, {"x": jnp.zeros(3)})
    state = {"x": jnp.full((3,), 2.0)}
    kern_j = jax.jit(kern)
    for i in range(5):
        state = kern_j(jax.random.fold_in(rng_key, i), state)
    assert _finite(state)


def test_smoke_tp_ssvs():
    from jax.sharding import Mesh, PartitionSpec as P

    from boom_tpu.parallel.mesh import shard_map
    from boom_tpu.parallel.tp_ssvs import (
        TpSpikeSlabConfig, init_tp_state, make_tp_ssvs_kernel,
    )

    devices = jax.devices()[:2]
    mesh = Mesh(np.asarray(devices), ("tp",))
    k1, k2 = jax.random.split(jax.random.key(0))
    x = jax.random.normal(k1, (40, 8))
    y = 2.0 * x[:, 0] + 0.3 * jax.random.normal(k2, (40,))
    cfg = TpSpikeSlabConfig(p_total=8, max_size=4, num_flips=6)

    def step(x_local, y_rep, k):
        kern = make_tp_ssvs_kernel(x_local, y_rep, cfg)
        st = init_tp_state(k, cfg, x_local.dtype)
        return kern(k, st)["sigsq"]

    sharded = shard_map(step, mesh=mesh,
                        in_specs=(P(None, "tp"), P(), P()),
                        out_specs=P())
    sig = jax.jit(sharded)(x, y, jax.random.key(2))
    assert bool(jnp.isfinite(sig))


def test_smoke_pallas_scan(rng_key):
    from boom_tpu.statespace import SsmParams
    from boom_tpu.statespace.pallas_scan import pallas_smooth_states
    from boom_tpu.statespace.kalman import smooth_states

    params = SsmParams(
        z=jnp.asarray([1.0]), t_mat=jnp.eye(1), r_mat=jnp.eye(1),
        q_mat=0.2 * jnp.eye(1), h=jnp.asarray(0.3), a0=jnp.zeros(1),
        p0=jnp.eye(1))
    y = jnp.cumsum(0.4 * jax.random.normal(rng_key, (64,)))
    np.testing.assert_allclose(np.asarray(pallas_smooth_states(params, y)),
                               np.asarray(smooth_states(params, y)),
                               atol=1e-6)


def test_smoke_state_models_tv(rng_key):
    from boom_tpu.statespace import Bsts, DynamicRegression, LocalLevel

    k1, k2 = jax.random.split(rng_key)
    x = jax.random.normal(k1, (50, 2))
    y = x[:, 0] + 0.3 * jax.random.normal(k2, (50,))
    model = Bsts(y=y, blocks=[LocalLevel.default(y),
                              DynamicRegression.default(y, x)])
    _run_few(model)


def test_smoke_hmm_em(rng_key):
    from boom_tpu.models.hmm import GaussianHmm

    trans = jnp.asarray([[0.9, 0.1], [0.2, 0.8]])
    y, _ = GaussianHmm.simulate(rng_key, 150, trans,
                                jnp.asarray([-1.0, 2.0]),
                                jnp.asarray([0.5, 0.5]))
    model = GaussianHmm(y=y, num_states=2)
    _run_few(model)


def test_smoke_mixtures(rng_key):
    from boom_tpu.models.mixtures import GaussianMixtureModel

    y = jnp.concatenate([jax.random.normal(rng_key, (40,)) - 2.0,
                         jax.random.normal(rng_key, (40,)) + 2.0])
    model = GaussianMixtureModel(y=y, num_components=2)
    _run_few(model, draws=10)


def test_smoke_timeseries_ar(rng_key):
    from boom_tpu.models.timeseries import ArModel

    y = jax.random.normal(rng_key, (100,))
    model = ArModel(y=y, lags=2)
    _run_few(model, draws=10)


def test_smoke_scalar_zoo(rng_key):
    from boom_tpu.models.scalar_zoo import Lognormal

    y = jnp.exp(0.5 * jax.random.normal(rng_key, (60,)) + 1.0)
    model = Lognormal(y=y)
    _run_few(model, draws=10)


def test_smoke_mbsts(rng_key):
    from boom_tpu.statespace.multivariate import MultivariateBsts

    y = jax.random.normal(rng_key, (30, 3))
    model = MultivariateBsts(y=y, num_factors=1, student_df=5.0)
    st = model.init_state(jax.random.key(1))
    kern = jax.jit(model.kernel())
    for i in range(3):
        st = kern(jax.random.key(10 + i), st)
    assert _finite(st)


def test_smoke_glm_stragglers(rng_key):
    """Few-sweep coverage of the r4 GLM additions (full statistical
    tests in test_glm_stragglers.py, slow tier)."""
    from boom_tpu.models import HierarchicalPoissonRegression
    from boom_tpu.models.glm import MultinomialProbit

    tb = jnp.asarray([[0.0, 0.0], [1.0, -0.5]])
    x, choice = MultinomialProbit.simulate(rng_key, 120, 2, tb)
    mp = MultinomialProbit(x=x, choice=choice, num_choices=2)
    st = mp.init_state(jax.random.key(0))
    st = jax.jit(mp.kernel())(jax.random.key(1), st)
    assert jnp.isfinite(st["b"]).all()

    xh, yh, gh = HierarchicalPoissonRegression.simulate(
        jax.random.key(2), [40] * 4, jnp.asarray([0.3, 0.2]))
    hm = HierarchicalPoissonRegression(x=xh, y=yh, group=gh,
                                       num_groups=4)
    sth = hm.init_state(jax.random.key(3))
    sth = jax.jit(hm.kernel())(jax.random.key(4), sth)
    assert jnp.isfinite(sth["beta"]).all()


def test_smoke_bsts_tim_marginal(rng_key):
    """Few-sweep coverage of the TIM marginal move (bench-critical
    path; statistical match tests in test_bsts_marginal.py)."""
    from boom_tpu.statespace import Bsts, LocalLinearTrend

    k1, k2 = jax.random.split(rng_key)
    y = jnp.cumsum(0.2 * jax.random.normal(k1, (80,))) \
        + 0.5 * jax.random.normal(k2, (80,))
    model = Bsts(y=y, blocks=[LocalLinearTrend.default(y)],
                 marginal_sigma_slice=True, marginal_move="tim",
                 marginal_tim_trials=8)
    st = model.init_state(jax.random.key(0))
    st = jax.jit(model.kernel())(jax.random.key(1), st)
    assert jnp.isfinite(st["sigsq_obs"]).all()


def test_smoke_irt_framework(rng_key):
    from boom_tpu.models.irt import IrtModel

    resp, loadings, _ = IrtModel.simulate(rng_key, n=60,
                                          items_per_scale=3)
    model = IrtModel(responses=resp, loadings=loadings, num_levels=2)
    st = model.init_state(jax.random.key(0))
    st = jax.jit(model.kernel())(jax.random.key(1), st)
    assert jnp.isfinite(st["theta"]).all()
    assert jnp.isfinite(st["Sigma"]).all()
