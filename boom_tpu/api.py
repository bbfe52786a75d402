"""User-facing API: the spikeslab / bsts package analogs.

Reference: Interfaces/python/spikeslab (lm_spike at spikeslab.py:85,
priors), Interfaces/python/bsts (Bsts class bsts.py:17, train :115,
suggest_burn :398, BstsPrediction :1181), and the R front ends
BoomSpikeSlab::lm.spike / bsts::bsts.

The classes here wrap the functional models in boom_tpu.models /
boom_tpu.statespace with the reference's ergonomics: construct, train
(everything jitted, all chains at once), summarize, predict. Where the
reference records draws by crossing pybind11 twice per iteration
(SURVEY.md §3.4), training here is one XLA program and draws land in
device arrays.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from boom_tpu.inference import diagnostics
from boom_tpu.inference.driver import McmcResult, run_mcmc
from boom_tpu.serialize import SavableFit, load_fit, save_fit


def suggest_burn(loglik_path, proportion=0.1):
    """Suggest a burn-in from a log-likelihood path (reference
    bsts.py:398 suggest_burn): first index where the path reaches the
    lower quantile of its final stretch."""
    ll = np.asarray(loglik_path)
    if ll.ndim > 1:
        ll = ll.mean(axis=tuple(range(ll.ndim - 1)))
    tail = ll[int(len(ll) * 0.5):]
    cutoff = np.quantile(tail, 0.1)
    idx = np.argmax(ll >= cutoff)
    return int(min(max(idx, int(proportion * len(ll))), len(ll) - 1))


def _coef_table(beta, gamma, names=None):
    """Posterior summary rows for spike-slab coefficients."""
    beta = np.asarray(beta).reshape(-1, beta.shape[-1])
    gamma = np.asarray(gamma).reshape(-1, gamma.shape[-1])
    p = beta.shape[1]
    names = names or [f"x{j}" for j in range(p)]
    rows = []
    for j in range(p):
        b = beta[:, j]
        inc = gamma[:, j].mean()
        nz = b[np.abs(b) > 0]
        rows.append({
            "name": names[j],
            "inclusion_prob": float(inc),
            "mean": float(b.mean()),
            "mean_given_inclusion": float(nz.mean()) if nz.size else 0.0,
            "sd": float(b.std()),
            "q025": float(np.quantile(b, 0.025)),
            "q975": float(np.quantile(b, 0.975)),
        })
    return rows


class _SpikeBase(SavableFit):
    """Shared train/summary plumbing for the *.spike classes."""

    _model = None
    _result: McmcResult | None = None
    _names: Sequence[str] | None = None

    def _fit(self, model, niter, num_chains, burn, seed):
        self._model = model
        self._result = run_mcmc(
            jax.random.key(seed), model.kernel(), model.init_state,
            num_draws=niter, num_chains=num_chains, burn=burn)
        return self

    @property
    def draws(self):
        return self._result.draws

    def coefficients(self):
        return _coef_table(self.draws["beta"], self.draws["gamma"],
                           self._names)

    def fit_formula(self, formula, data, **fit_kw):
        """R-interface entry point: `lm.spike(y ~ ., data)` etc. The
        design matrix (with intercept, dummy coding, interactions,
        transforms) is built by boom_tpu.formula.model_matrix."""
        from boom_tpu.formula import model_matrix

        y, x, names = model_matrix(formula, data)
        self._names = names
        return self.fit(x, y, **fit_kw)

    def plot(self, kind="inclusion", ax=None, **kw):
        """plot.lm.spike dispatch (BoomSpikeSlab R/plot.lm.spike.R):
        'inclusion' = signed inclusion-probability bars,
        'coefficients' = boxplots of the coefficient draws."""
        from boom_tpu import rplots

        if kind == "inclusion":
            return rplots.plot_inclusion_probs(
                self.coefficients(), ax=ax, **kw)
        if kind == "coefficients":
            beta = np.asarray(self.draws["beta"])
            return rplots.boxplot_true(
                beta.reshape(-1, beta.shape[-1]),
                names=self._names, ax=ax, **kw)
        raise ValueError(f"unknown plot kind {kind!r}")

    def summary(self):
        out = {"coefficients": self.coefficients()}
        if "sigsq" in self.draws:
            s = np.sqrt(np.asarray(self.draws["sigsq"]).ravel())
            out["residual_sd"] = {
                "mean": float(s.mean()),
                "q025": float(np.quantile(s, 0.025)),
                "q975": float(np.quantile(s, 0.975))}
        out["diagnostics"] = {
            "beta_rhat": np.asarray(
                diagnostics.potential_scale_reduction(
                    self.draws["beta"])).tolist(),
        }
        return out


class LmSpike(_SpikeBase):
    """lm.spike / lm_spike (reference spikeslab.py:85).

    `prior` takes a boom_tpu.priors.RegressionSpikeSlabPrior for full
    control over the prior spec (the reference's priors.py:66 surface);
    otherwise the **prior_kw shortcut parameterizes the default prior.
    """

    def __init__(self, expected_model_size=1.0, names=None, prior=None,
                 **prior_kw):
        self._prior_kw = dict(prior_kw,
                              expected_model_size=expected_model_size)
        self._prior = prior
        self._names = names

    def fit(self, x, y, niter=1000, num_chains=4, burn=200, seed=0):
        from boom_tpu.models.glm import SpikeSlabRegression
        from boom_tpu.models.glm.regression import RegSuf

        x, y = jnp.asarray(x), jnp.asarray(y)
        if self._prior is not None:
            from boom_tpu.priors import StudentSpikeSlabPrior

            if isinstance(self._prior, StudentSpikeSlabPrior):
                # student-t errors: the prior type selects the error
                # family (the reference's lm.spike does the same with
                # StudentSpikeSlabPrior); df_prior's support becomes
                # the nu slice bounds with a flat prior inside them
                from boom_tpu.models.glm import StudentSpikeSlab

                dfp = self._prior.df_prior
                model = StudentSpikeSlab(
                    x=x, y=y, prior=self._prior.build(x, y),
                    max_flips=self._prior.kernel_max_flips,
                    nu_prior_rate=0.0,
                    nu_bounds=(dfp.lo, dfp.hi))
            else:
                model = SpikeSlabRegression(
                    suf=RegSuf.from_data(x, y),
                    prior=self._prior.build(x, y),
                    max_flips=self._prior.kernel_max_flips)
        else:
            model = SpikeSlabRegression.from_data(x, y, **self._prior_kw)
        return self._fit(model, niter, num_chains, burn, seed)

    def predict(self, x_new, seed=0):
        """Posterior-predictive draws [draws, n_new]."""
        x_new = jnp.asarray(x_new)
        beta = self.draws["beta"].reshape(-1, x_new.shape[1])
        sig = jnp.sqrt(self.draws["sigsq"].reshape(-1))
        eta = beta @ x_new.T
        eps = jax.random.normal(jax.random.key(seed), eta.shape)
        return eta + sig[:, None] * eps


class LogitSpike(_SpikeBase):
    """logit.spike (reference BoomSpikeSlab/R/logit.spike.R).

    `prior` takes a boom_tpu.priors.LogitZellnerPrior (priors.py:385).
    """

    def __init__(self, expected_model_size=1.0, names=None, prior=None,
                 **prior_kw):
        self._prior_kw = dict(prior_kw,
                              expected_model_size=expected_model_size)
        self._prior = prior
        self._names = names

    def _model(self, cls, x, y):
        if self._prior is not None:
            return cls(x=x, y=y, prior=self._prior.build(x, y),
                       max_flips=self._prior.kernel_max_flips)
        return cls.from_data(x, y, **self._prior_kw)

    def fit(self, x, y, niter=1000, num_chains=4, burn=200, seed=0):
        from boom_tpu.models.glm import LogitSpikeSlab

        model = self._model(LogitSpikeSlab, jnp.asarray(x), jnp.asarray(y))
        return self._fit(model, niter, num_chains, burn, seed)

    def predict_prob(self, x_new):
        beta = self.draws["beta"].reshape(-1, jnp.asarray(x_new).shape[1])
        return jax.nn.sigmoid(beta @ jnp.asarray(x_new).T)


class ProbitSpike(LogitSpike):
    """probit.spike."""

    def fit(self, x, y, niter=1000, num_chains=4, burn=200, seed=0):
        from boom_tpu.models.glm import ProbitSpikeSlab

        model = self._model(ProbitSpikeSlab, jnp.asarray(x), jnp.asarray(y))
        return self._fit(model, niter, num_chains, burn, seed)

    def predict_prob(self, x_new):
        beta = self.draws["beta"].reshape(-1, jnp.asarray(x_new).shape[1])
        return jax.scipy.stats.norm.cdf(beta @ jnp.asarray(x_new).T)


class PoissonSpike(_SpikeBase):
    """poisson.spike.

    `prior` takes a boom_tpu.priors.PoissonZellnerPrior (priors.py:480).
    """

    def __init__(self, expected_model_size=1.0, names=None, prior=None,
                 **prior_kw):
        self._prior_kw = dict(prior_kw,
                              expected_model_size=expected_model_size)
        self._prior = prior
        self._names = names

    def fit(self, x, y, exposure=None, niter=1000, num_chains=4,
            burn=200, seed=0):
        from boom_tpu.models.glm import PoissonSpikeSlab

        x, y = jnp.asarray(x), jnp.asarray(y)
        if self._prior is not None:
            log_e = (jnp.zeros(y.shape, x.dtype) if exposure is None
                     else jnp.log(jnp.asarray(exposure, x.dtype)))
            model = PoissonSpikeSlab(
                x=x, y=y, log_exposure=log_e,
                prior=self._prior.build(x, y, exposure),
                max_flips=self._prior.kernel_max_flips)
        else:
            model = PoissonSpikeSlab.from_data(
                x, y, exposure=exposure, **self._prior_kw)
        return self._fit(model, niter, num_chains, burn, seed)


class QregSpike(_SpikeBase):
    """qreg.spike."""

    def __init__(self, tau=0.5, expected_model_size=1.0, names=None):
        self._tau = tau
        self._ems = expected_model_size
        self._names = names

    def fit(self, x, y, niter=1000, num_chains=4, burn=200, seed=0):
        from boom_tpu.models.glm.quantile import QuantileSpikeSlab

        model = QuantileSpikeSlab.from_data(
            jnp.asarray(x), jnp.asarray(y), tau=self._tau,
            expected_model_size=self._ems)
        return self._fit(model, niter, num_chains, burn, seed)


@dataclasses.dataclass
class BstsModel(SavableFit):
    """Builder-style bsts front end (reference bsts.Bsts, bsts.py:17;
    R bsts() with add.* specs):

        model = (BstsModel()
                 .add_local_linear_trend()
                 .add_seasonal(nseasons=7))
        model.fit(y, predictors=x, niter=1000)
        model.predict(horizon=30)
    """

    _specs: list = dataclasses.field(default_factory=list)
    _model: Any = None
    _result: McmcResult | None = None
    _loglik: Any = None

    # -- state spec builders (reference add.* files) ------------------------
    def add_local_level(self, **kw):
        self._specs.append(("local_level", kw))
        return self

    def add_local_linear_trend(self, **kw):
        self._specs.append(("local_linear_trend", kw))
        return self

    def add_semilocal_linear_trend(self, **kw):
        self._specs.append(("semilocal_linear_trend", kw))
        return self

    def add_student_local_linear_trend(self, **kw):
        self._specs.append(("student_local_linear_trend", kw))
        return self

    def add_seasonal(self, nseasons, **kw):
        self._specs.append(("seasonal", dict(kw, nseasons=nseasons)))
        return self

    def add_trig(self, period, nfreq, **kw):
        self._specs.append(("trig", dict(kw, period=period, nfreq=nfreq)))
        return self

    def add_ar(self, lags=1, **kw):
        self._specs.append(("ar", dict(kw, lags=lags)))
        return self

    def add_static_intercept(self, **kw):
        self._specs.append(("static_intercept", kw))
        return self

    def add_dynamic_regression(self, predictors, **kw):
        self._specs.append(
            ("dynamic_regression", dict(kw, predictors=predictors)))
        return self

    def add_regression_holiday(self, holidays, first_date,
                               hierarchical=False, **kw):
        """holidays: utils.dates Holiday objects (or names accepted by
        create_named_holiday); first_date: date of y[0]. Mirrors R's
        AddRegressionHoliday / AddHierarchicalRegressionHoliday."""
        from boom_tpu.utils.dates import Holiday, create_named_holiday

        hols = [h if isinstance(h, Holiday) else create_named_holiday(h)
                for h in holidays]
        self._specs.append(("regression_holiday",
                            dict(kw, holidays=hols, first_date=first_date,
                                 hierarchical=hierarchical)))
        return self

    def add_monthly_annual_cycle(self, first_date, **kw):
        """12-season monthly cycle for daily data, rotating on the first
        of each month (reference AddMonthlyAnnualCycle,
        add.monthly.annual.cycle.R; SeasonalStateModel.hpp:134).
        first_date: datetime.date of y[0]."""
        self._specs.append(
            ("monthly_annual_cycle", dict(kw, first_date=first_date)))
        return self

    def add_general_seasonal_llt(self, nseasons, **kw):
        self._specs.append(
            ("general_seasonal_llt", dict(kw, nseasons=nseasons)))
        return self

    def add_dynamic_regression_ar(self, predictors, lags=1, **kw):
        self._specs.append(
            ("dynamic_regression_ar",
             dict(kw, predictors=jnp.asarray(predictors), lags=lags)))
        return self

    def add_random_walk_holiday(self, active, window, **kw):
        self._specs.append(
            ("holiday", dict(kw, active=active, window=window)))
        return self

    def _build_blocks(self, y):
        from boom_tpu.statespace import state_models as sm

        builders = {
            "local_level": lambda kw: sm.LocalLevel.default(y, **kw),
            "local_linear_trend":
                lambda kw: sm.LocalLinearTrend.default(y, **kw),
            "semilocal_linear_trend":
                lambda kw: sm.SemilocalLinearTrend.default(y, **kw),
            "student_local_linear_trend":
                lambda kw: sm.StudentLocalLinearTrend.default(y, **kw),
            "seasonal": lambda kw: sm.Seasonal.default(y, **kw),
            "trig": lambda kw: sm.Trig.default(y, **kw),
            "ar": lambda kw: sm.ArState.default(y, **kw),
            "static_intercept":
                lambda kw: sm.StaticIntercept.default(y, **kw),
            "dynamic_regression":
                lambda kw: sm.DynamicRegression.default(y, **kw),
            "holiday": lambda kw: sm.RandomWalkHoliday.default(y, **kw),
            "regression_holiday": lambda kw: (
                sm.HierarchicalRegressionHoliday.from_holidays(
                    y, kw["holidays"], kw["first_date"],
                    **{k: v for k, v in kw.items()
                       if k not in ("holidays", "first_date",
                                    "hierarchical")})
                if kw.get("hierarchical")
                else sm.RegressionHoliday.from_holidays(
                    y, kw["holidays"], kw["first_date"],
                    **{k: v for k, v in kw.items()
                       if k not in ("holidays", "first_date",
                                    "hierarchical")})),
            "general_seasonal_llt":
                lambda kw: sm.GeneralSeasonalLLT.default(y, **kw),
            "monthly_annual_cycle":
                lambda kw: sm.MonthlyAnnualCycle.default(y, **kw),
            "dynamic_regression_ar":
                lambda kw: sm.DynamicRegressionAr.default(y, **kw),
        }
        return [builders[name](kw) for name, kw in self._specs]

    def fit(self, y, predictors=None, family="gaussian",
            expected_model_size=1.0, niter=1000, num_chains=4, burn=200,
            seed=0, timestamps=None, **model_kw):
        """timestamps: optional per-observation timestamps (numeric,
        numpy datetime64, or python dates). Irregular series are
        regularized exactly as the reference's bsts() does
        (format.timestamps.R RegularizeTimestamps): gaps become missing
        grid points and duplicate timestamps multiplex onto one grid
        point (utils.timestamps). Gaussian family only."""
        from boom_tpu.models.glm.regression import SpikeSlabPrior
        from boom_tpu.statespace import Bsts
        from boom_tpu.statespace.families import NonGaussianBsts

        if timestamps is not None:
            from boom_tpu.utils.timestamps import (
                collapse_to_grid,
                regularize_timestamps,
            )

            info = regularize_timestamps(timestamps)
            if not info.timestamps_are_trivial:
                if family != "gaussian":
                    raise NotImplementedError(
                        "timestamp regularization requires the "
                        "gaussian family")
                grid = collapse_to_grid(np.asarray(y), info,
                                        predictors=None
                                        if predictors is None
                                        else np.asarray(predictors))
                y = grid["y_grid"]
                model_kw.setdefault(
                    "observed", jnp.asarray(grid["observed"]))
                model_kw.setdefault(
                    "obs_weights",
                    jnp.asarray(grid["weights"],
                                jnp.result_type(float)))
                model_kw.setdefault("extra_obs_ss", grid["extra_ss"])
                if predictors is not None:
                    predictors = grid["predictors_grid"]
                self._timestamp_info = info

        y = jnp.asarray(y)
        blocks = self._build_blocks(y)
        reg_prior = None
        if predictors is not None:
            predictors = jnp.asarray(predictors)
            reg_prior = SpikeSlabPrior.from_data(
                predictors, jnp.asarray(y, predictors.dtype),
                expected_model_size=expected_model_size,
                prior_information_weight=(
                    0.01 if family != "gaussian" else 1.0))
        if family == "gaussian":
            model_kw.setdefault("chains_hint", num_chains)
            self._model = Bsts(y=y, blocks=blocks, predictors=predictors,
                               reg_prior=reg_prior, **model_kw)
        else:
            self._model = NonGaussianBsts(
                y=y, blocks=blocks, family=family, predictors=predictors,
                reg_prior=reg_prior, **model_kw)
        self._result = run_mcmc(
            jax.random.key(seed), self._model.kernel(),
            self._model.init_state, num_draws=niter,
            num_chains=num_chains, burn=burn)
        return self

    @property
    def draws(self):
        return self._result.draws

    def _subsampled_states(self, burn=0, max_draws=50):
        """Thinned flat draw states honoring a per-chain burn."""
        flat = self._result.stacked()
        if burn:
            chains = jax.tree_util.tree_leaves(
                self._result.draws)[0].shape[0]
            flat = jax.tree_util.tree_map(
                lambda a: a.reshape((chains, -1) + a.shape[1:])
                [:, burn:].reshape((-1,) + a.shape[1:]), flat)
        total = jax.tree_util.tree_leaves(flat)[0].shape[0]
        take = min(max_draws, total)
        idx = jnp.linspace(0, total - 1, take).astype(jnp.int32)
        return jax.tree_util.tree_map(lambda a: a[idx], flat)

    def _one_step_errors(self, burn=0, standardize=True, max_draws=50):
        from boom_tpu.statespace.bsts import one_step_prediction_errors

        return one_step_prediction_errors(
            self._model, self._subsampled_states(burn, max_draws),
            standardize=standardize)

    def prediction_errors(self, cutpoints=None, burn=0, seed=0,
                          max_draws=50):
        """bsts.prediction.errors analog (reference bsts/R/
        diagnostics.R:61): {'in.sample': [draws, T], '<cutpoint>':
        [draws, T], ...}. Cutpoint entries REFIT the model to
        y[:cutpoint] and filter through the holdout, so post-cutpoint
        columns are genuine out-of-sample one-step errors."""
        from boom_tpu.statespace.bsts import holdout_prediction_errors

        out = {"in.sample": self._one_step_errors(burn=burn,
                                                  max_draws=max_draws)}
        for i, c in enumerate(cutpoints or []):
            out[str(int(c))] = holdout_prediction_errors(
                self._model, jax.random.key(seed + i), int(c),
                max_draws=max_draws)
        return out

    def state_contribution_draws(self, burn=0):
        """Per-block contribution paths over all draws. `burn` drops the
        first recorded draws of EACH chain (the draw axis, not the
        flattened chain-major axis)."""
        flat = self._result.stacked()
        if burn:
            chains = jax.tree_util.tree_leaves(
                self._result.draws)[0].shape[0]
            flat = jax.tree_util.tree_map(
                lambda a: a.reshape((chains, -1) + a.shape[1:])
                [:, burn:].reshape((-1,) + a.shape[1:]), flat)
        return jax.vmap(self._model.state_contributions)(flat)

    def coefficients(self):
        assert "beta" in self.draws, "no regression component"
        return _coef_table(self.draws["beta"], self.draws["gamma"])

    def summary(self):
        out = {}
        if "sigsq_obs" in self.draws:
            s = np.sqrt(np.asarray(self.draws["sigsq_obs"]).reshape(-1))
            out["observation_sd"] = {
                "mean": float(s.mean()),
                "q025": float(np.quantile(s, 0.025)),
                "q975": float(np.quantile(s, 0.975))}
        if "beta" in self.draws:
            out["coefficients"] = self.coefficients()
        return out

    def plot(self, kind="state", ax=None, burn=0, **kw):
        """plot.bsts dispatch (reference bsts R/plots.R:224 plot.bsts):
        'state' = posterior of the fitted state mean with the data
        overlaid; 'components' = one dynamic-distribution panel per
        state block; 'residuals' = dynamic distribution of y - fit;
        'coefficients' = inclusion bars (regression models only);
        'prediction.errors' = dynamic distribution of the standardized
        one-step errors (PlotBstsPredictionErrors; pass cutpoints=[...]
        for holdout-refit panels); 'forecast.distribution' = posterior
        of the one-step-ahead forecasts y_t - v_t with actuals overlaid
        (PlotBstsForecastDistribution); 'qq' = posterior QQ fan of the
        standardized errors (diagnostics qqdist); 'acf' = posterior ACF
        boxplots of the standardized errors (AcfDist); 'predictors' =
        standardized high-inclusion predictor series
        (PlotBstsPredictors, plots.R:261); 'size' = model-size
        histogram/trace (PlotBstsSize, plots.R:399); 'seasonal' /
        'monthly' = per-season effect panels (PlotSeasonalEffect /
        PlotMonthlyAnnualCycle)."""
        from boom_tpu import rplots

        if kind == "coefficients":
            table = (_coef_table(self.draws["beta"][:, burn:],
                                 self.draws["gamma"][:, burn:])
                     if burn else self.coefficients())
            return rplots.plot_inclusion_probs(table, ax=ax, **kw)
        if kind == "prediction.errors":
            errs = self.prediction_errors(
                cutpoints=kw.pop("cutpoints", None), burn=burn,
                seed=kw.pop("seed", 0))
            return rplots.compare_dynamic_distributions(
                [np.asarray(v) for v in errs.values()],
                names=list(errs.keys()), **kw)
        if kind == "forecast.distribution":
            raw = np.asarray(self._one_step_errors(
                burn=burn, standardize=False))
            y = np.asarray(self._model.y)
            ax = rplots.plot_dynamic_distribution(
                y[None, :] - raw, ax=ax, **kw)
            ax.plot(np.arange(len(y)), y, ".", color="blue",
                    markersize=3)
            return ax
        if kind == "qq":
            return rplots.qqdist(
                np.asarray(self._one_step_errors(burn=burn)), ax=ax,
                **kw)
        if kind == "acf":
            return rplots.acf_dist(
                np.asarray(self._one_step_errors(burn=burn)), ax=ax,
                **kw)
        if kind == "predictors":
            # PlotBstsPredictors (plots.R:261): standardized predictor
            # series whose inclusion probability clears the threshold,
            # shaded by inclusion probability, sign-flipped to align
            # with the (standardized) original series
            assert "beta" in self.draws, "no regression component"
            beta = np.asarray(self.draws["beta"]).reshape(
                -1, self.draws["beta"].shape[-1])
            if burn:
                beta = np.asarray(
                    self.draws["beta"][:, burn:]).reshape(-1,
                                                          beta.shape[-1])
            incl = (beta != 0).mean(0)
            threshold = kw.pop("inclusion_threshold", 0.10)
            flip = kw.pop("flip_signs", True)
            keep = np.flatnonzero(incl > threshold)
            ax = rplots._ensure_ax(ax)
            x_mat = np.asarray(self._model.predictors)
            y = np.asarray(self._model.y)

            def _scale(v):
                s = v.std()
                return (v - v.mean()) / (s if s > 0 else 1.0)

            order = keep[np.argsort(-incl[keep])]
            for j in order:
                series = _scale(x_mat[:, j])
                if flip:
                    bj = beta[:, j]
                    bj = bj[bj != 0]
                    if bj.size and (bj > 0).mean() <= 0.5:
                        series = -series
                shade = str(max(0.0, 1.0 - incl[j]))
                ax.plot(series, color=shade,
                        label=f"x{j} ({incl[j]:.2f})")
            ax.plot(_scale(y), ".", color="blue", markersize=3)
            if kw.pop("show_legend", True) and order.size:
                ax.legend(fontsize=7)
            return ax
        if kind == "size":
            # PlotBstsSize (plots.R:399): distribution of the number of
            # included coefficients; style="histogram" (default) or "ts"
            assert "gamma" in self.draws, "no regression component"
            gamma = np.asarray(self.draws["gamma"])
            if burn:
                gamma = gamma[:, burn:]
            size = gamma.sum(-1).reshape(-1)
            ax = rplots._ensure_ax(ax)
            if kw.pop("style", "histogram") == "ts":
                per_iter = np.asarray(self.draws["gamma"]).sum(-1)
                ax.plot(per_iter.mean(0))
                ax.set_ylabel("model size")
            else:
                ax.hist(size, bins=np.arange(size.min() - 0.5,
                                             size.max() + 1.5))
                ax.set_xlabel("number of included predictors")
            return ax
        if kind in ("seasonal", "monthly"):
            return self._plot_seasonal_effect(kind, burn=burn, **kw)
        contrib = {k: np.asarray(v)
                   for k, v in
                   self.state_contribution_draws(burn=burn).items()}
        total = sum(contrib.values())
        y = np.asarray(self._model.y)
        if kind == "state":
            ax = rplots.plot_dynamic_distribution(total, ax=ax, **kw)
            ax.plot(np.arange(len(y)), y, ".", color="k", markersize=3)
            return ax
        if kind == "components":
            return rplots.compare_dynamic_distributions(
                list(contrib.values()), names=list(contrib.keys()), **kw)
        if kind == "residuals":
            return rplots.plot_dynamic_distribution(
                y[None, :] - total, ax=ax, **kw)
        raise ValueError(f"unknown plot kind {kind!r}")

    def _plot_seasonal_effect(self, kind, burn=0, same_scale=True,
                              axes=None, **kw):
        """Per-season effect panels (reference PlotSeasonalEffect,
        plot_seasonal_effect.R, and PlotMonthlyAnnualCycle): one panel
        per season showing how that season's effect evolves over the
        years — the 'month plot' view of the seasonal component."""
        import datetime

        from boom_tpu import rplots
        from boom_tpu.statespace.state_models import (
            MonthlyAnnualCycle,
            Seasonal,
        )

        want = MonthlyAnnualCycle if kind == "monthly" else Seasonal
        block = next((b for b in self._model.blocks
                      if isinstance(b, want)), None)
        if block is None:
            raise ValueError(f"model has no {kind} component")
        contrib = np.asarray(
            self.state_contribution_draws(burn=burn)[block.name])
        t_len = contrib.shape[-1]
        if kind == "monthly":
            season = np.array(
                [(block.first_date + datetime.timedelta(days=t)).month - 1
                 for t in range(t_len)])
            names = ["Jan", "Feb", "Mar", "Apr", "May", "Jun", "Jul",
                     "Aug", "Sep", "Oct", "Nov", "Dec"]
            nseasons = 12
        else:
            nseasons = block.nseasons
            season = np.arange(t_len) % nseasons
            names = [f"season {s}" for s in range(nseasons)]

        plt = rplots._plt()
        if axes is None:
            rows, cols = rplots.plot_grid_shape(nseasons)
            _, axes = plt.subplots(rows, cols, squeeze=False)
            axes = [a for row in axes for a in row]
        lo, hi = float(contrib.min()), float(contrib.max())
        for s in range(nseasons):
            axx = axes[s]
            idx = np.flatnonzero(season == s)
            rplots.plot_dynamic_distribution(
                contrib[..., idx].reshape(-1, idx.size),
                timestamps=idx, ax=axx, **kw)
            axx.set_title(names[s], fontsize=8)
            if same_scale:
                axx.set_ylim(lo, hi)
        return axes

    def predict(self, horizon, seed=0, future_z=None,
                future_predictors=None, max_draws=200):
        """Posterior-predictive forecasts [draws, horizon] by simulating
        forward from a thinned set of posterior draws (reference
        predict.bsts / BstsPrediction)."""
        flat = self._result.stacked()
        total = jax.tree_util.tree_leaves(flat)[0].shape[0]
        take = min(max_draws, total)
        idx = jnp.linspace(0, total - 1, take).astype(jnp.int32)
        sub = jax.tree_util.tree_map(lambda a: a[idx], flat)
        keys = jax.random.split(jax.random.key(seed), take)

        from boom_tpu.statespace.families import NonGaussianBsts

        kwargs = {}
        if future_z is not None:
            kwargs["future_z"] = future_z
        is_glm = isinstance(self._model, NonGaussianBsts)
        if is_glm and future_predictors is not None:
            kwargs["future_predictors"] = jnp.asarray(future_predictors)
        if (not is_glm) and future_predictors is not None:
            # Gaussian: regression enters additively on the y scale
            def one(k, st):
                extra = jnp.asarray(future_predictors) @ st["beta"]
                return self._model.predict(k, st, horizon, **kwargs) + extra
        else:
            def one(k, st):
                return self._model.predict(k, st, horizon, **kwargs)

        return jax.jit(jax.vmap(one))(keys, sub)


@dataclasses.dataclass
@dataclasses.dataclass
class MbstsModel(SavableFit):
    """mbsts front end — the R mbsts() surface (bsts/R/mbsts.R:86, plot
    dispatch mbsts.plots.R:17, predict.mbsts.R) over the
    MultivariateBsts engine. fit() takes wide-format data y [T, K];
    shared factors + optional shared/series blocks, per-series
    spike-slab regression, student errors via the engine kwargs."""

    num_factors: int = 1
    _model: Any = None
    _result: McmcResult | None = None

    def fit(self, y, predictors=None, niter=500, num_chains=2,
            burn=300, seed=0, **model_kw):
        from boom_tpu.statespace.multivariate import MultivariateBsts

        y = jnp.asarray(y)
        if predictors is not None:
            predictors = jnp.asarray(predictors)
        self._model = MultivariateBsts(
            y=y, num_factors=self.num_factors, predictors=predictors,
            **model_kw)
        self._result = run_mcmc(
            jax.random.key(seed), self._model.kernel(),
            self._model.init_state, num_draws=niter,
            num_chains=num_chains, burn=burn,
            extract=lambda s: s)
        return self

    @property
    def draws(self):
        return self._result.draws

    def _subsampled_states(self, burn=0, max_draws=50):
        flat = self._result.stacked()
        if burn:
            chains = jax.tree_util.tree_leaves(
                self._result.draws)[0].shape[0]
            flat = jax.tree_util.tree_map(
                lambda a: a.reshape((chains, -1) + a.shape[1:])
                [:, burn:].reshape((-1,) + a.shape[1:]), flat)
        total = jax.tree_util.tree_leaves(flat)[0].shape[0]
        take = min(max_draws, total)
        idx = jnp.linspace(0, total - 1, take).astype(jnp.int32)
        return jax.tree_util.tree_map(lambda a: a[idx], flat)

    def series_mean_draws(self, burn=0, max_draws=50):
        """[draws, T, K] conditional means: shared + series-specific
        state + regression contributions (PlotMbstsSeriesMeans'
        quantity, mbsts.plots.R:35)."""
        states = self._subsampled_states(burn, max_draws)

        def one(st):
            return (self._model.shared_contrib(st)
                    + self._model.series_contrib(st)
                    + self._model._reg_contrib(st))

        return jax.jit(jax.vmap(one))(states)

    def plot(self, kind="means", series=None, burn=0, **kw):
        """plot.mbsts dispatch (mbsts.plots.R:17): 'means' = per-series
        conditional-mean fans with the actuals overlaid; 'prediction' =
        per-series forecast fan charts continuing the training series
        (plot.mbsts.prediction, mbsts.plots.R:177) — pass horizon=...
        or prediction=<draws from .predict()>."""
        from boom_tpu import rplots

        y = np.asarray(self._model.y)
        k_dim = y.shape[1]
        ids = list(range(k_dim) if series is None else series)
        if kind == "prediction":
            pred = kw.pop("prediction", None)
            if pred is None:
                pred = self.predict(kw.pop("horizon", 24),
                                    seed=kw.pop("seed", 0), burn=burn)
            pred = np.asarray(pred)  # [draws, h, K]
            plot_original = kw.pop("plot_original", True)
            t_len, h = y.shape[0], pred.shape[1]
            times = np.arange(t_len, t_len + h)
            plt = rplots._plt()
            rows, cols = rplots.plot_grid_shape(len(ids))
            fig, axes = plt.subplots(rows, cols, squeeze=False)
            flat = [a for row in axes for a in row]
            for axx, k in zip(flat, ids):
                fan = pred[:, :, k]
                med = np.median(fan, 0)
                lo = np.quantile(fan, kw.get("interval_quantiles",
                                             (0.025, 0.975))[0], axis=0)
                hi = np.quantile(fan, kw.get("interval_quantiles",
                                             (0.025, 0.975))[1], axis=0)
                rplots.plot_dynamic_distribution(fan, timestamps=times,
                                                 ax=axx)
                axx.plot(times, med, color="blue", linewidth=2)
                axx.plot(times, lo, color="green", linestyle="--")
                axx.plot(times, hi, color="green", linestyle="--")
                if plot_original:
                    axx.plot(np.arange(t_len), y[:, k], ".",
                             color="k", markersize=2)
                axx.set_title(f"series {k}", fontsize=8)
            return fig, axes
        if kind != "means":
            raise ValueError(f"unknown plot kind {kind!r}")
        means = np.asarray(self.series_mean_draws(burn=burn))
        curves = [means[:, :, k] for k in ids]
        fig, axes = rplots.compare_dynamic_distributions(
            curves, names=[f"series {k}" for k in ids], **kw)
        for ax_row, k in zip(axes.ravel(), ids):
            ax_row.plot(np.arange(y.shape[0]), y[:, k], ".",
                        color="k", markersize=2)
        return fig, axes

    def predict(self, horizon, seed=0, future_predictors=None,
                max_draws=50, burn=0):
        """Posterior-predictive forecasts [draws, horizon, K]
        (predict.mbsts.R semantics: simulate forward per draw)."""
        states = self._subsampled_states(burn, max_draws)
        take = jax.tree_util.tree_leaves(states)[0].shape[0]
        keys = jax.random.split(jax.random.key(seed), take)
        return jax.jit(jax.vmap(
            lambda k, st: self._model.predict(
                k, st, horizon,
                future_predictors=future_predictors)))(keys, states)

    def summary(self):
        sig = np.sqrt(np.asarray(self.draws["sigsq_obs"]))
        sig = sig.reshape(-1, sig.shape[-1])
        out = {"observation_sd": {
            "mean": sig.mean(0).tolist(),
            "q025": np.quantile(sig, 0.025, axis=0).tolist(),
            "q975": np.quantile(sig, 0.975, axis=0).tolist()}}
        lod = np.asarray(self.draws["loadings"])
        out["loadings_mean"] = lod.reshape(
            (-1,) + lod.shape[-2:]).mean(0).tolist()
        return out


class DirmModel(SavableFit):
    """dirm front end (reference Interfaces/R/bsts/R/dirm.R): dynamic
    intercept regression over multiplexed observations.

        model = DirmModel().add_local_linear_trend()
        model.fit(y_list, x_list, niter=1000)   # ragged per-time data
        model.predict(future_predictors)
    """

    _specs: list = dataclasses.field(default_factory=list)
    _model: Any = None
    _result: McmcResult | None = None

    # share the state-spec builders with BstsModel
    add_local_level = BstsModel.add_local_level
    add_local_linear_trend = BstsModel.add_local_linear_trend
    add_semilocal_linear_trend = BstsModel.add_semilocal_linear_trend
    add_seasonal = BstsModel.add_seasonal
    add_trig = BstsModel.add_trig
    add_ar = BstsModel.add_ar
    add_static_intercept = BstsModel.add_static_intercept
    _build_blocks = BstsModel._build_blocks

    def fit(self, y, predictors, observed=None, expected_model_size=1.0,
            niter=1000, num_chains=4, burn=200, seed=0, **model_kw):
        """y/predictors: padded [T, n_max] / [T, n_max, p] arrays with an
        `observed` mask, or ragged per-time lists."""
        from boom_tpu.models.glm.regression import SpikeSlabPrior
        from boom_tpu.statespace.dirm import DynamicInterceptRegression

        if isinstance(y, (list, tuple)):
            flat_y = jnp.concatenate(
                [jnp.atleast_1d(jnp.asarray(v, jnp.result_type(float)))
                 for v in y])
            flat_x = jnp.concatenate(
                [jnp.atleast_2d(jnp.asarray(v, jnp.result_type(float)))
                 for v in predictors])
            prior = SpikeSlabPrior.from_data(
                flat_x, flat_y, expected_model_size=expected_model_size)
            ymeans = jnp.asarray(
                [float(jnp.mean(jnp.asarray(v))) for v in y])
            self._model = DynamicInterceptRegression.from_ragged(
                y, predictors, blocks=self._build_blocks(ymeans),
                reg_prior=prior, **model_kw)
        else:
            y = jnp.asarray(y)
            predictors = jnp.asarray(predictors)
            if observed is None:
                observed = jnp.ones(y.shape, bool)
            p = predictors.shape[-1]
            prior = SpikeSlabPrior.from_data(
                predictors.reshape(-1, p), y.reshape(-1),
                expected_model_size=expected_model_size)
            self._model = DynamicInterceptRegression(
                y=y, predictors=predictors, observed=observed,
                blocks=self._build_blocks(jnp.mean(y, 1)),
                reg_prior=prior, **model_kw)
        self._result = run_mcmc(
            jax.random.key(seed), self._model.kernel(),
            self._model.init_state, num_draws=niter,
            num_chains=num_chains, burn=burn)
        return self

    draws = BstsModel.draws
    coefficients = BstsModel.coefficients
    summary = BstsModel.summary
    state_contribution_draws = BstsModel.state_contribution_draws

    def predict(self, future_predictors, seed=0, max_draws=200):
        flat = self._result.stacked()
        total = jax.tree_util.tree_leaves(flat)[0].shape[0]
        take = min(max_draws, total)
        idx = jnp.linspace(0, total - 1, take).astype(jnp.int32)
        sub = jax.tree_util.tree_map(lambda a: a[idx], flat)
        keys = jax.random.split(jax.random.key(seed), take)
        fp = jnp.asarray(future_predictors)
        return jax.jit(jax.vmap(
            lambda k, st: self._model.predict(k, st, fp)))(keys, sub)


@dataclasses.dataclass
class MixedFrequencyModel(SavableFit):
    """Mixed-frequency front end (reference bsts/R/mixed.frequency.R):
    fine-scale latent structural time series observed as coarse
    aggregates."""

    _specs: list = dataclasses.field(default_factory=list)
    _model: Any = None
    _result: McmcResult | None = None

    add_local_level = BstsModel.add_local_level
    add_local_linear_trend = BstsModel.add_local_linear_trend
    add_semilocal_linear_trend = BstsModel.add_semilocal_linear_trend
    add_seasonal = BstsModel.add_seasonal
    add_trig = BstsModel.add_trig
    add_ar = BstsModel.add_ar
    _build_blocks = BstsModel._build_blocks

    def fit(self, coarse_y, which_coarse, fraction=None, predictors=None,
            expected_model_size=1.0, niter=1000, num_chains=4, burn=200,
            seed=0, **model_kw):
        """coarse_y: [M] observed totals; which_coarse: [T] coarse-period
        index of each fine period's start; fraction: [T] share of the
        fine period in that coarse period (FineNowcastingData's
        fraction_of_value_in_initial_period)."""
        from boom_tpu.models.glm.regression import SpikeSlabPrior
        from boom_tpu.statespace.mixed_frequency import (
            MixedFrequencyRegression,
            build_aggregation_matrix,
        )

        coarse_y = jnp.asarray(coarse_y)
        agg = build_aggregation_matrix(which_coarse, fraction)
        # pseudo fine series for block scale defaults
        pseudo = agg.T @ jnp.linalg.solve(
            agg @ agg.T + 1e-10 * jnp.eye(agg.shape[0]), coarse_y)
        reg_prior = None
        if predictors is not None:
            predictors = jnp.asarray(predictors)
            reg_prior = SpikeSlabPrior.from_data(
                predictors, pseudo,
                expected_model_size=expected_model_size)
        self._model = MixedFrequencyRegression(
            coarse_y=coarse_y, agg=agg, predictors=predictors,
            reg_prior=reg_prior, blocks=self._build_blocks(pseudo),
            **model_kw)
        self._result = run_mcmc(
            jax.random.key(seed), self._model.kernel(),
            self._model.init_state, num_draws=niter,
            num_chains=num_chains, burn=burn)
        return self

    draws = BstsModel.draws
    summary = BstsModel.summary
    state_contribution_draws = BstsModel.state_contribution_draws

    def fine_series_draws(self):
        """Posterior draws of the latent fine-scale series [*, T]."""
        return self._result.stacked()["w"]

    def predict(self, horizon, future_which_coarse=None,
                future_fraction=None, future_predictors=None, seed=0,
                max_draws=200):
        from boom_tpu.statespace.mixed_frequency import (
            build_aggregation_matrix,
        )

        fut_agg = None
        if future_which_coarse is not None:
            fut_agg = build_aggregation_matrix(future_which_coarse,
                                               future_fraction)
        flat = self._result.stacked()
        total = jax.tree_util.tree_leaves(flat)[0].shape[0]
        take = min(max_draws, total)
        idx = jnp.linspace(0, total - 1, take).astype(jnp.int32)
        sub = jax.tree_util.tree_map(lambda a: a[idx], flat)
        keys = jax.random.split(jax.random.key(seed), take)
        kw = {}
        if future_predictors is not None:
            kw["future_predictors"] = jnp.asarray(future_predictors)
        fn = jax.jit(jax.vmap(
            lambda k, st: self._model.predict(
                k, st, horizon, future_agg=fut_agg, **kw)))
        return fn(keys, sub)


@dataclasses.dataclass
class DynregModel(SavableFit):
    """Wide dynamic regression front end (reference
    Interfaces/python/dynreg/BayesBoom/dynreg/dynreg.py
    SparseDynamicRegressionModel): time-varying coefficients with
    Markov spike-slab selection.

        model = DynregModel(prior_inclusion_prob=0.1)
        model.fit(x, y, timestamps=ts, niter=1000)
        model.coefficient_draws()       # [draws, T, p]
        model.inclusion_probs()         # [T, p]
        model.predict(x_future)
    """

    prior_inclusion_prob: float = 0.2
    expected_run_length: float = 20.0
    residual_sd_guess: float | None = None
    innovation_sd_guess: float = 0.1
    _model: Any = None
    _result: McmcResult | None = None

    def fit(self, x, y, timestamps=None, niter=1000, num_chains=2,
            burn=200, seed=0, **model_kw):
        """x: [N, p] in long format with integer `timestamps` mapping
        rows to time points (reference dynreg's formula/timestamps
        interface), or [T, p] / [T, n, p] pre-gridded."""
        from boom_tpu.statespace.dynreg import (
            MarkovInclusionPrior,
            SparseDynamicRegression,
        )
        from boom_tpu.statespace.state_models import SdPrior

        x = jnp.asarray(x, jnp.result_type(float))
        y = jnp.asarray(y, jnp.result_type(float))
        if timestamps is not None:
            ts = np.asarray(timestamps)
            uniq = np.unique(ts)
            t_len = len(uniq)
            remap = {v: i for i, v in enumerate(uniq)}
            idx = np.asarray([remap[v] for v in ts])
            counts = np.bincount(idx, minlength=t_len)
            n_max = int(counts.max())
            p = x.shape[1]
            xg = np.zeros((t_len, n_max, p))
            yg = np.zeros((t_len, n_max))
            mg = np.zeros((t_len, n_max), bool)
            slot = np.zeros(t_len, int)
            for r in range(x.shape[0]):
                t = idx[r]
                xg[t, slot[t]] = np.asarray(x[r])
                yg[t, slot[t]] = np.asarray(y[r])
                mg[t, slot[t]] = True
                slot[t] += 1
            x, y = jnp.asarray(xg), jnp.asarray(yg)
            model_kw.setdefault("obs_mask", jnp.asarray(mg))
        incl = MarkovInclusionPrior(
            prior_inclusion_prob=self.prior_inclusion_prob,
            expected_run_length=self.expected_run_length)
        kw = dict(model_kw)
        if self.residual_sd_guess is not None:
            kw.setdefault("residual_prior",
                          SdPrior(self.residual_sd_guess, 1.0))
        kw.setdefault(
            "innovation_prior",
            SdPrior(self.innovation_sd_guess, 1.0, upper_limit=10.0))
        self._model = SparseDynamicRegression(
            x=x, y=y, inclusion_prior=incl, **kw)
        self._result = run_mcmc(
            jax.random.key(seed), self._model.kernel(),
            self._model.init_state, num_draws=niter,
            num_chains=num_chains, burn=burn,
            extract=lambda s: {"gamma": s["gamma"], "beta": s["beta"],
                               "sigsq": s["sigsq"],
                               "tau_sq": s["tau_sq"]})
        return self

    def coefficient_draws(self):
        """[total_draws, T, p] posterior coefficient paths."""
        return np.asarray(self._result.stacked()["beta"])

    def inclusion_probs(self):
        """[T, p] posterior inclusion probabilities."""
        return np.asarray(self._result.stacked()["gamma"]).mean(0)

    def residual_sd_draws(self):
        return np.sqrt(np.asarray(self._result.stacked()["sigsq"]))

    def summary(self):
        g = self._result.stacked()
        return {
            "residual_sd_mean": float(np.mean(self.residual_sd_draws())),
            "mean_model_size": float(
                np.asarray(g["gamma"]).mean(0).sum(-1).mean()),
            "rhat_sigsq": float(np.asarray(
                diagnostics.potential_scale_reduction(
                    self._result.draws["sigsq"][..., None]))[0]),
        }

    def predict(self, x_future, seed=0, max_draws=200):
        """Posterior-predictive draws of y over the horizon: [*, h]."""
        flat = self._result.final_state
        chains = jax.tree_util.tree_leaves(flat)[0].shape[0]
        keys = jax.random.split(jax.random.key(seed), chains)
        x_future = jnp.asarray(x_future, jnp.result_type(float))
        fn = jax.jit(jax.vmap(
            lambda k, st: self._model.predict(k, st, x_future)))
        return fn(keys, flat)


# front ends for the remaining reference python packages (mixtures,
# impute, factormodels, bandits, nnet, mlogit-spike) live in
# boom_tpu.frontends; re-exported here for one-stop discovery
from boom_tpu.frontends import (  # noqa: E402,F401
    BinomialBandit,
    DirichletProcessMvn,
    FiniteMixture,
    LinearBandit,
    MixedDataImputer,
    MlmSpike,
    MultinomialFactorModel,
    NnetRegression,
    PoissonFactorModel,
    ShrinkageRegression,
)
