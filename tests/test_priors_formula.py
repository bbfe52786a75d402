"""User-facing prior-spec classes (priors.py) and R-style formulas
(formula.py) — the reference's Interfaces/python/spikeslab/priors.py and
Interfaces/R/parse_model_formula.cpp surfaces."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from boom_tpu import priors
from boom_tpu.formula import design_matrix, model_matrix, parse_formula


def _sim(key, n=300, p=8, nonzero=3, sigma=0.5):
    kx, ke = jax.random.split(jax.random.key(key))
    x = jax.random.normal(kx, (n, p))
    x = x.at[:, 0].set(1.0)
    beta = jnp.zeros(p).at[:nonzero].set(jnp.arange(1, nonzero + 1.0))
    y = x @ beta + sigma * jax.random.normal(ke, (n,))
    return np.asarray(x), np.asarray(y), np.asarray(beta)


def test_regression_prior_build_shapes_and_defaults():
    x, y, _ = _sim(0)
    spec = priors.RegressionSpikeSlabPrior(expected_model_size=3)
    prior = spec.build(x, y)
    p = x.shape[1]
    assert prior.mean.shape == (p,)
    # intercept prior mean = ybar, slopes 0
    assert np.isclose(float(prior.mean[0]), y.mean())
    assert np.allclose(np.asarray(prior.mean[1:]), 0.0)
    assert prior.unscaled_precision.shape == (p, p)
    pi = jax.nn.sigmoid(prior.log_inclusion_odds)
    assert np.allclose(np.asarray(pi), 3.0 / p, atol=1e-6)
    # reference python default: sigma_upper_limit = 1.2 * sdy
    assert np.isclose(prior.sigma_upper_limit, 1.2 * y.std(), rtol=1e-6)
    # max_flips=-1 (default) -> full sweep
    assert spec.kernel_max_flips is None


def test_prior_inclusion_probability_vector_and_max_size():
    x, y, _ = _sim(1)
    pvec = np.full(8, 0.9)
    spec = priors.RegressionSpikeSlabPrior(
        prior_inclusion_probabilities=pvec, max_size=4,
        sigma_upper_limit=np.inf, max_flips=3)
    prior = spec.build(x, y)
    pi = jax.nn.sigmoid(prior.log_inclusion_odds)
    assert np.allclose(np.asarray(pi), 0.9, atol=1e-6)
    assert prior.max_size == 4
    assert prior.sigma_upper_limit is None
    assert spec.kernel_max_flips == 3


def test_lm_spike_accepts_prior_and_recovers():
    from boom_tpu.api import LmSpike

    x, y, beta = _sim(2)
    spec = priors.RegressionSpikeSlabPrior(
        expected_model_size=3, prior_df=1.0)
    m = LmSpike(prior=spec).fit(x, y, niter=300, num_chains=2, burn=100)
    bhat = np.asarray(m.draws["beta"]).reshape(-1, 8).mean(0)
    assert np.allclose(bhat, beta, atol=0.25)
    # truncation respected: sigma draws below 1.2 * sdy
    s = np.sqrt(np.asarray(m.draws["sigsq"]))
    assert float(s.max()) <= 1.2 * y.std() + 1e-8


def test_sigma_upper_truncation_binds():
    """With a binding upper limit, every sigma draw respects it."""
    from boom_tpu.dists import continuous as c

    key = jax.random.key(0)
    draws = c.scaled_inv_chisq.sample_upper_truncated(
        key, 5.0, 2.0, upper=1.5, shape=(2000,))
    d = np.asarray(draws)
    assert d.max() <= 1.5 + 1e-9
    # matches the analytically truncated cdf at the median
    med = np.median(d)
    num = float(c.scaled_inv_chisq.cdf(med, 5.0, 2.0))
    den = float(c.scaled_inv_chisq.cdf(1.5, 5.0, 2.0))
    assert abs(num / den - 0.5) < 0.05


def test_logit_zellner_prior_intercept_mean():
    x = np.random.default_rng(0).normal(size=(100, 4))
    x[:, 0] = 1.0
    y = (np.random.default_rng(1).uniform(size=100) < 0.8).astype(float)
    spec = priors.LogitZellnerPrior(expected_model_size=2)
    prior = spec.build(x, y)
    # intercept prior mean near logit(mean(y))
    exp = np.log(y.mean() / (1 - y.mean()))
    assert np.isclose(float(prior.mean[0]), exp, atol=1e-6)
    # sigma_df = 0: known-variance engine form
    assert float(prior.sigma_df) == 0.0


def test_poisson_zellner_prior_rate():
    x = np.random.default_rng(0).normal(size=(50, 3))
    y = np.random.default_rng(1).poisson(3.0, size=50)
    spec = priors.PoissonZellnerPrior()
    prior = spec.build(x, y)
    assert np.isclose(float(prior.mean[0]), np.log(y.mean()), atol=1e-6)


def test_logit_spike_api_with_zellner_prior():
    from boom_tpu.api import LogitSpike

    rng = np.random.default_rng(3)
    x = rng.normal(size=(400, 4))
    x[:, 0] = 1.0
    eta = 2.0 * x[:, 1]
    y = (rng.uniform(size=400) < 1 / (1 + np.exp(-eta))).astype(int)
    m = LogitSpike(prior=priors.LogitZellnerPrior(
        expected_model_size=2)).fit(x, y, niter=300, num_chains=2,
                                    burn=100)
    probs = np.asarray(m.draws["gamma"]).reshape(-1, 4).mean(0)
    assert probs[1] > 0.9


# ---------------------------------------------------------------------------
# formulas
# ---------------------------------------------------------------------------
@pytest.fixture
def frame():
    rng = np.random.default_rng(0)
    return {
        "y": rng.normal(size=20),
        "x1": rng.normal(size=20),
        "x2": rng.normal(size=20),
        "g": np.array(["a", "b", "c", "a"] * 5),
    }


def test_parse_formula_terms():
    resp, terms = parse_formula("y ~ x1 + x2 - x3")
    assert resp == "y"
    assert terms == [("+", "x1"), ("+", "x2"), ("-", "x3")]


def test_model_matrix_basic(frame):
    y, x, names = model_matrix("y ~ x1 + x2", frame)
    assert names == ["(Intercept)", "x1", "x2"]
    assert x.shape == (20, 3)
    assert np.allclose(x[:, 0], 1.0)
    assert np.allclose(y, frame["y"])


def test_dot_expansion_and_removal(frame):
    _, x, names = model_matrix("y ~ . - x2", frame)
    assert "x2" not in names
    assert "x1" in names
    # categorical g dummy-coded with first level dropped
    assert "g.b" in names and "g.c" in names and "g.a" not in names


def test_interaction_and_star(frame):
    _, x, names = model_matrix("y ~ x1:x2", frame)
    assert names == ["(Intercept)", "x1:x2"]
    assert np.allclose(x[:, 1], frame["x1"] * frame["x2"])
    _, xs, ns = model_matrix("y ~ x1*x2", frame)
    assert ns == ["(Intercept)", "x1", "x2", "x1:x2"]


def test_transform_terms_and_no_intercept(frame):
    frame = dict(frame, x1=np.abs(frame["x1"]) + 1.0)
    _, x, names = model_matrix("y ~ log(x1) - 1", frame)
    assert names == ["log(x1)"]
    assert np.allclose(x[:, 0], np.log(frame["x1"]))


def test_categorical_interaction(frame):
    _, x, names = model_matrix("y ~ x1:g", frame)
    assert "x1:g.b" in names
    jb = names.index("x1:g.b")
    expect = frame["x1"] * (frame["g"] == "b")
    assert np.allclose(x[:, jb], expect)


def test_pandas_frame_roundtrip(frame):
    pd = pytest.importorskip("pandas")
    df = pd.DataFrame(frame)
    y, x, names = model_matrix("y ~ .", df)
    assert x.shape[1] == 1 + 2 + 2  # intercept, x1, x2, g.b, g.c


def test_fit_formula_end_to_end(frame):
    from boom_tpu.api import LmSpike

    rng = np.random.default_rng(1)
    data = {
        "x1": rng.normal(size=200),
        "x2": rng.normal(size=200),
    }
    data["y"] = 2.0 + 1.5 * data["x1"] + rng.normal(size=200) * 0.3
    m = LmSpike(expected_model_size=2).fit_formula(
        "y ~ .", data, niter=300, num_chains=2, burn=100)
    tab = {r["name"]: r for r in m.coefficients()}
    assert "(Intercept)" in tab and "x1" in tab
    assert abs(tab["x1"]["mean"] - 1.5) < 0.2


# ---------------------------------------------------------------------------
# data summaries (stats/summarize.py — reference R/summary.py surface)
# ---------------------------------------------------------------------------
def test_numeric_summary_moments_and_missing_codes():
    from boom_tpu.stats.summarize import NumericSummary

    x = np.concatenate([np.random.default_rng(0).normal(5, 2, 500),
                        [np.nan] * 10, [999.0] * 60])
    s = NumericSummary(x)
    assert s.sample_size == 570
    assert s.number_missing == 10
    assert 999.0 in s.potential_missing_codes
    assert abs(np.median([q for q in [s.median]]) - 5.0) < 15  # finite
    clean = NumericSummary(x[:500])
    assert abs(clean.mean - 5.0) < 0.3
    assert abs(clean.sd - 2.0) < 0.3
    assert clean.potential_missing_codes == []


def test_categorical_summary_frequencies():
    from boom_tpu.stats.summarize import CategoricalSummary

    s = CategoricalSummary(["a", "b", "a", "c", "a", None])
    assert s.number_missing == 1
    assert s.frequencies == {"a": 3, "b": 1, "c": 1}
    assert abs(s.proportions["a"] - 0.6) < 1e-12


def test_summarize_dispatch():
    from boom_tpu.stats.summarize import (
        CategoricalSummary,
        NumericSummary,
        summarize,
    )

    rng = np.random.default_rng(1)
    data = {
        "x": rng.normal(size=100),
        "g": np.array(["u", "v"] * 50),
        "k": np.repeat([1, 2, 3], [40, 30, 30]),  # low-card ints
    }
    out = summarize(data)
    assert isinstance(out["x"], NumericSummary)
    assert isinstance(out["g"], CategoricalSummary)
    assert isinstance(out["k"], CategoricalSummary)
    assert "NumericSummary" in repr(out["x"])


def test_student_prior_selects_student_model():
    """LmSpike(prior=StudentSpikeSlabPrior(...)) must fit t errors, not
    silently fall back to Gaussian (advisor r3 finding): the fitted
    result carries nu draws inside df_prior's support."""
    import jax
    import numpy as np

    from boom_tpu.api import LmSpike
    from boom_tpu.priors import StudentSpikeSlabPrior, UniformPrior
    from boom_tpu.models.glm import StudentSpikeSlab

    x, y, beta = StudentSpikeSlab.simulate(
        jax.random.key(0), 600, 8, 2, nu=4.0)
    fit = LmSpike(prior=StudentSpikeSlabPrior(
        df_prior=UniformPrior(1.0, 50.0), expected_model_size=2.0)).fit(
        np.asarray(x), np.asarray(y), niter=200, num_chains=2, burn=100)
    nu = np.asarray(fit.draws["nu"]).ravel()
    assert nu.shape[0] > 0
    assert np.all(nu >= 1.0) and np.all(nu <= 50.0)
    incl = np.asarray(fit.draws["gamma"]).reshape(-1, 8).mean(0)
    assert incl[:2].min() > 0.8
