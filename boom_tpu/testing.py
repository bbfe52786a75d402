"""Statistical MCMC test utilities.

Replicates the reference's test_utils (test_utils/test_utils.hpp:122
CheckMcmcMatrix, :192 CheckMcmcVector, :228 DistributionsMatch, :245
TwoSampleKs): simulate data from known truth, run the real sampler, check
posterior credibility intervals cover the truth (with a multiple-comparison
allowance for vector parameters). These transfer BOOM's test strategy
(SURVEY.md §4) verbatim — equivalence with the reference is *in
distribution*, never draw-for-draw.
"""

from __future__ import annotations

import numpy as np


def _flatten_draws(draws):
    """[chains, draws, ...] or [draws] -> [total_draws, ...]."""
    a = np.asarray(draws)
    if a.ndim >= 2:
        return a.reshape(-1, *a.shape[2:]) if a.ndim > 2 else a.reshape(-1)
    return a


def check_mcmc_vector(draws, truth, confidence=0.95) -> bool:
    """True if the central credibility interval covers the scalar truth
    (reference CheckMcmcVector, test_utils.hpp:192)."""
    a = _flatten_draws(draws)
    alpha = 1.0 - confidence
    lo, hi = np.quantile(a, [alpha / 2, 1 - alpha / 2])
    return bool(lo <= truth <= hi)


def check_mcmc_matrix(draws, truth, confidence=0.95,
                      control_multiple_comparisons=True) -> bool:
    """draws: [..., dim] MCMC output; truth: [dim]. Each column's interval
    should cover its true value; with multiple-comparison control a small
    fraction of misses is tolerated (reference CheckMcmcMatrix,
    test_utils.hpp:122)."""
    a = np.asarray(draws)
    a = a.reshape(-1, a.shape[-1])
    truth = np.asarray(truth)
    alpha = 1.0 - confidence
    lo = np.quantile(a, alpha / 2, axis=0)
    hi = np.quantile(a, 1 - alpha / 2, axis=0)
    covered = (lo <= truth) & (truth <= hi)
    if not control_multiple_comparisons:
        return bool(covered.all())
    frac = covered.mean()
    # Binomial bound: allow misses consistent with the confidence level
    d = len(truth)
    se = np.sqrt(confidence * (1 - confidence) / d)
    return bool(frac >= confidence - 2.5 * se - 1e-9) or bool(covered.all())


def distributions_match(draws, ref_draws, pvalue=1e-3) -> bool:
    """Two-sample KS test (reference DistributionsMatch/TwoSampleKs,
    test_utils.hpp:228/:245)."""
    from scipy.stats import ks_2samp

    return ks_2samp(_flatten_draws(draws),
                    _flatten_draws(ref_draws)).pvalue > pvalue


def check_stochastic_process(draws, truth, confidence=0.95,
                             sd_ratio_threshold=0.1) -> bool:
    """Coverage for a time-indexed truth path (reference
    CheckStochasticProcess): the pointwise intervals should mostly cover,
    unless the posterior is so tight that tiny misses dominate."""
    a = np.asarray(draws)
    a = a.reshape(-1, a.shape[-1])
    truth = np.asarray(truth)
    alpha = 1.0 - confidence
    lo = np.quantile(a, alpha / 2, axis=0)
    hi = np.quantile(a, 1 - alpha / 2, axis=0)
    coverage = ((lo <= truth) & (truth <= hi)).mean()
    if coverage >= confidence - 0.1:
        return True
    resid = a.mean(0) - truth
    sd_ratio = np.abs(resid).mean() / (truth.std() + 1e-12)
    return bool(sd_ratio < sd_ratio_threshold)
