"""Linear algebra tests: masked-subset ops (Selector analog, reference
LinAlg/Selector.hpp:44) and SWEEP (reference LinAlg/SWEEP.hpp)."""

import jax
import jax.numpy as jnp
import numpy as np

from boom_tpu import linalg


def _spd(d, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(d, d))
    return jnp.asarray(a @ a.T + d * np.eye(d))


def test_masked_cholesky_matches_subset():
    d = 6
    a = _spd(d)
    mask = jnp.asarray([True, False, True, True, False, True])
    chol = linalg.masked_cholesky(a, mask)
    idx = np.where(np.asarray(mask))[0]
    sub = np.asarray(a)[np.ix_(idx, idx)]
    want = np.linalg.cholesky(sub)
    got = np.asarray(chol)[np.ix_(idx, idx)]
    np.testing.assert_allclose(got, want, rtol=1e-12)
    # logdet
    np.testing.assert_allclose(
        float(linalg.masked_logdet(chol, mask)),
        np.linalg.slogdet(sub)[1], rtol=1e-12)


def test_masked_cho_solve():
    d = 6
    a = _spd(d, 1)
    b = jnp.asarray(np.random.default_rng(2).normal(size=d))
    mask = jnp.asarray([True, True, False, True, False, True])
    chol = linalg.masked_cholesky(a, mask)
    x = np.asarray(linalg.masked_cho_solve(chol, b, mask))
    idx = np.where(np.asarray(mask))[0]
    want = np.linalg.solve(np.asarray(a)[np.ix_(idx, idx)],
                           np.asarray(b)[idx])
    np.testing.assert_allclose(x[idx], want, rtol=1e-10)
    assert (x[~np.asarray(mask)] == 0).all()


def test_masked_quad_form():
    d = 5
    a = _spd(d, 3)
    b = jnp.asarray(np.random.default_rng(4).normal(size=d))
    mask = jnp.asarray([True, False, True, True, False])
    chol = linalg.masked_cholesky(a, mask)
    got = float(linalg.masked_quad_form_inv(chol, b, mask))
    idx = np.where(np.asarray(mask))[0]
    sub = np.asarray(a)[np.ix_(idx, idx)]
    bv = np.asarray(b)[idx]
    want = bv @ np.linalg.solve(sub, bv)
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_masked_cholesky_vmap_over_masks():
    """The SSVS workhorse: many candidate subsets factored at once."""
    d = 8
    a = _spd(d, 5)
    base = np.ones(d, bool)
    masks = []
    for j in range(d):
        m = base.copy()
        m[j] = ~m[j]
        masks.append(m)
    masks = jnp.asarray(np.stack(masks))
    chols = jax.vmap(lambda m: linalg.masked_cholesky(a, m))(masks)
    lds = jax.vmap(linalg.masked_logdet)(chols, masks)
    for j in range(d):
        idx = np.where(np.asarray(masks[j]))[0]
        sub = np.asarray(a)[np.ix_(idx, idx)]
        np.testing.assert_allclose(float(lds[j]),
                                   np.linalg.slogdet(sub)[1], rtol=1e-10)


def test_masked_mvn_suf_sample(rng_key):
    d = 4
    a = _spd(d, 6)
    b = jnp.asarray([1.0, -2.0, 3.0, 0.5])
    mask = jnp.asarray([True, True, False, True])
    chol = linalg.masked_cholesky(a, mask)
    draws = jax.vmap(
        lambda k: linalg.masked_mvn_suf_sample(k, chol, b, mask))(
            jax.random.split(rng_key, 100_000))
    idx = np.where(np.asarray(mask))[0]
    sub = np.asarray(a)[np.ix_(idx, idx)]
    want_mean = np.linalg.solve(sub, np.asarray(b)[idx])
    got = np.asarray(draws)
    assert (got[:, 2] == 0).all()
    np.testing.assert_allclose(got[:, idx].mean(0), want_mean, atol=0.02)
    np.testing.assert_allclose(np.cov(got[:, idx].T), np.linalg.inv(sub),
                               atol=0.02)


def test_sweep_matches_definition():
    d = 5
    a = _spd(d, 7)
    k = 2
    s = np.asarray(linalg.sweep(a, k))
    an = np.asarray(a)
    want = an - np.outer(an[:, k], an[k, :]) / an[k, k]
    for i in range(d):
        for j in range(d):
            if i != k and j != k:
                np.testing.assert_allclose(s[i, j], want[i, j], rtol=1e-10)
    np.testing.assert_allclose(s[k, :][np.arange(d) != k],
                               an[k, np.arange(d) != k] / an[k, k])
    np.testing.assert_allclose(s[:, k][np.arange(d) != k],
                               an[np.arange(d) != k, k] / an[k, k])
    np.testing.assert_allclose(s[k, k], -1.0 / an[k, k])


def test_sweep_unsweep_roundtrip():
    a = _spd(6, 8)
    s = linalg.sweep(a, 3)
    back = linalg.unsweep(s, 3)
    np.testing.assert_allclose(np.asarray(back), np.asarray(a), rtol=1e-10)


def test_sweep_subset_gives_inverse():
    """Sweeping all indices yields -A^{-1} (classic SWEEP property)."""
    d = 5
    a = _spd(d, 9)
    s = np.asarray(linalg.sweep_subset(a, jnp.ones(d, bool)))
    np.testing.assert_allclose(s, -np.linalg.inv(np.asarray(a)),
                               rtol=1e-8, atol=1e-10)


def test_sweep_subset_regression():
    """Sweeping predictor block of [X'X X'y; y'X y'y] yields betahat and
    residual SS — the SWEEP regression property the reference exploits."""
    rng = np.random.default_rng(10)
    n, p = 100, 3
    x = rng.normal(size=(n, p))
    y = x @ np.asarray([1.0, -2.0, 0.5]) + 0.1 * rng.normal(size=n)
    xy = np.column_stack([x, y])
    xtx = jnp.asarray(xy.T @ xy)
    mask = jnp.asarray([True] * p + [False])
    s = np.asarray(linalg.sweep_subset(xtx, mask))
    betahat = np.linalg.lstsq(x, y, rcond=None)[0]
    np.testing.assert_allclose(s[:p, p], betahat, rtol=1e-8)
    resid_ss = y @ y - (x @ betahat) @ y
    np.testing.assert_allclose(s[p, p], resid_ss, rtol=1e-6)


def test_cho_solve_and_logdet():
    a = _spd(4, 11)
    chol = jnp.linalg.cholesky(a)
    b = jnp.asarray(np.random.default_rng(12).normal(size=4))
    np.testing.assert_allclose(
        np.asarray(linalg.cho_solve(chol, b)),
        np.linalg.solve(np.asarray(a), np.asarray(b)), rtol=1e-10)
    np.testing.assert_allclose(float(linalg.cho_logdet(chol)),
                               np.linalg.slogdet(np.asarray(a))[1],
                               rtol=1e-12)
