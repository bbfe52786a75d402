"""Statistical tests, divergences, classifier metrics.

Reference: stats/kl_divergence.hpp, stats/ChiSquareTest.hpp,
stats/classifier_metrics.hpp, stats/logit.hpp, test_utils'
TwoSampleKs (test_utils/test_utils.hpp:245).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def kl_divergence(p, q, eps=1e-300):
    """KL(p || q) for discrete distributions (reference
    stats/kl_divergence.hpp)."""
    p = jnp.asarray(p)
    q = jnp.asarray(q)
    return jnp.sum(jnp.where(
        p > 0, p * (jnp.log(jnp.clip(p, eps, None))
                    - jnp.log(jnp.clip(q, eps, None))), 0.0))


def chi_square_test(observed, expected=None):
    """One-way chi-square GOF: returns (statistic, df, p_value)
    (reference OneWayChiSquareTest, stats/ChiSquareTest.hpp)."""
    observed = jnp.asarray(observed, jnp.result_type(float))
    n = jnp.sum(observed)
    k = observed.shape[0]
    if expected is None:
        expected = jnp.full((k,), n / k)
    else:
        expected = jnp.asarray(expected, observed.dtype)
        expected = expected / jnp.sum(expected) * n
    stat = jnp.sum((observed - expected) ** 2 / expected)
    df = k - 1
    p = jax.scipy.special.gammaincc(0.5 * df, 0.5 * stat)
    return stat, df, p


def two_sample_ks(x, y):
    """Two-sample Kolmogorov-Smirnov statistic and asymptotic p-value
    (reference TwoSampleKs, test_utils.hpp:245)."""
    x = jnp.sort(jnp.asarray(x))
    y = jnp.sort(jnp.asarray(y))
    n, m = x.shape[0], y.shape[0]
    grid = jnp.concatenate([x, y])
    fx = jnp.searchsorted(x, grid, side="right") / n
    fy = jnp.searchsorted(y, grid, side="right") / m
    d = jnp.max(jnp.abs(fx - fy))
    en = jnp.sqrt(n * m / (n + m))
    lam = (en + 0.12 + 0.11 / en) * d
    j = jnp.arange(1, 101)
    p = 2.0 * jnp.sum((-1.0) ** (j - 1) * jnp.exp(-2.0 * (lam * j) ** 2))
    return d, jnp.clip(p, 0.0, 1.0)


def roc_auc(scores, labels):
    """AUC via the rank statistic (reference classifier_metrics.hpp).
    Ties get midranks."""
    scores = jnp.asarray(scores)
    labels = jnp.asarray(labels)
    order = jnp.argsort(scores)
    s_sorted = scores[order]
    # midranks: average rank among ties
    idx = jnp.arange(scores.shape[0], dtype=scores.dtype)
    left = jnp.searchsorted(s_sorted, s_sorted, side="left")
    right = jnp.searchsorted(s_sorted, s_sorted, side="right")
    ranks_sorted = 0.5 * (left + right - 1) + 1.0
    ranks = jnp.zeros_like(scores).at[order].set(ranks_sorted)
    n_pos = jnp.sum(labels)
    n_neg = labels.shape[0] - n_pos
    rank_sum = jnp.sum(jnp.where(labels > 0, ranks, 0.0))
    return (rank_sum - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)


def confusion_matrix(pred, truth, num_classes: int):
    """[num_classes, num_classes] counts, rows = truth."""
    onehot_t = jax.nn.one_hot(jnp.asarray(truth), num_classes)
    onehot_p = jax.nn.one_hot(jnp.asarray(pred), num_classes)
    return onehot_t.T @ onehot_p


def binary_classification_metrics(pred, truth):
    """accuracy / precision / recall / f1 for 0-1 predictions."""
    pred = jnp.asarray(pred)
    truth = jnp.asarray(truth)
    tp = jnp.sum((pred == 1) & (truth == 1))
    fp = jnp.sum((pred == 1) & (truth == 0))
    fn = jnp.sum((pred == 0) & (truth == 1))
    tn = jnp.sum((pred == 0) & (truth == 0))
    precision = tp / jnp.maximum(tp + fp, 1)
    recall = tp / jnp.maximum(tp + fn, 1)
    return {
        "accuracy": (tp + tn) / pred.shape[0],
        "precision": precision,
        "recall": recall,
        "f1": 2.0 * precision * recall / jnp.maximum(
            precision + recall, 1e-12),
    }
