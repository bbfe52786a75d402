"""MixedDataImputer: mixed-frame imputation with atoms, clusters, and
error correction (reference Models/Impute/MixedDataImputer.hpp:612,
MixedDataImputerWithErrorCorrection.hpp:310)."""

import jax
import jax.numpy as jnp
import numpy as np

from boom_tpu.inference import run_mcmc
from boom_tpu.models.mixed_impute import MixedDataImputer


def _simulate_frame(key, n=600):
    """2 categorical variables drive 2 numeric variables; numeric var 0
    has an atom at 0 (semicontinuous)."""
    ks = jax.random.split(key, 6)
    c0 = jax.random.randint(ks[0], (n,), 0, 3)
    c1 = jax.random.randint(ks[1], (n,), 0, 2)
    mu0 = jnp.asarray([0.0, 2.0, 4.0])[c0] + jnp.asarray([0.0, 1.0])[c1]
    mu1 = jnp.asarray([1.0, -1.0, 0.0])[c0]
    y0 = mu0 + 0.5 * jax.random.normal(ks[2], (n,))
    y1 = mu1 + 0.5 * jax.random.normal(ks[3], (n,))
    # atom: ~25% of y0 is exactly 0
    is_atom = jax.random.uniform(ks[4], (n,)) < 0.25
    y0 = jnp.where(is_atom, 0.0, y0)
    return (jnp.stack([y0, y1], 1), jnp.stack([c0, c1], 1), is_atom)


def test_mixed_imputer_recovers_missing(rng_key):
    k_sim, k_miss, k_run = jax.random.split(rng_key, 3)
    numeric, cats, is_atom = _simulate_frame(k_sim)
    n = numeric.shape[0]
    # plant missingness: 15% of each column
    masks = jax.random.uniform(k_miss, (4, n)) < 0.15
    num_in = numeric.at[:, 0].set(
        jnp.where(masks[0], jnp.nan, numeric[:, 0]))
    num_in = num_in.at[:, 1].set(
        jnp.where(masks[1], jnp.nan, num_in[:, 1]))
    cat_in = cats.at[:, 0].set(jnp.where(masks[2], -1, cats[:, 0]))
    cat_in = cat_in.at[:, 1].set(jnp.where(masks[3], -1, cats[:, 1]))

    model = MixedDataImputer.from_frame(
        num_in, cat_in, num_levels=(3, 2), atoms=[[0.0], []],
        num_clusters=2)
    res = run_mcmc(k_run, model.kernel(), model.init_state,
                   num_draws=150, num_chains=1, burn=150)
    final = jax.tree_util.tree_map(lambda a: a[0], res.final_state)
    num_imp, cat_imp = model.imputed_frame(final)

    # categorical recovery: missing cells should mostly match truth
    # (the categories are well-separated through the numeric means)
    m0 = np.asarray(masks[2])
    acc0 = np.mean(np.asarray(cat_imp[:, 0])[m0]
                   == np.asarray(cats[:, 0])[m0])
    assert acc0 > 0.7, acc0
    # numeric recovery: RMSE on missing continuous cells well below the
    # marginal sd
    m_num = np.asarray(masks[1])
    err = np.asarray(num_imp[:, 1])[m_num] - np.asarray(numeric[:, 1])[m_num]
    assert np.sqrt(np.mean(err**2)) < 0.9, np.sqrt(np.mean(err**2))
    # atom structure: imputed y0 should reproduce ~25% zeros among
    # missing cells
    m0n = np.asarray(masks[0])
    frac_zero = np.mean(np.asarray(num_imp[:, 0])[m0n] == 0.0)
    assert 0.08 < frac_zero < 0.5, frac_zero
    # observed cells pass through untouched (no error correction)
    obs = ~m0n & np.isfinite(np.asarray(num_in[:, 0]))
    np.testing.assert_allclose(np.asarray(num_imp[:, 0])[obs],
                               np.asarray(numeric[:, 0])[obs], atol=0.15)


def test_mixed_imputer_error_correction(rng_key):
    """Plant gross errors in a categorical column; the EC variant should
    detect and fix most of them while the non-EC variant cannot."""
    k_sim, k_err, k_run = jax.random.split(rng_key, 3)
    numeric, cats, _ = _simulate_frame(k_sim, n=800)
    n = numeric.shape[0]
    # corrupt 10% of c0 (which strongly determines both numeric columns)
    k1, k2 = jax.random.split(k_err)
    corrupt = jax.random.uniform(k1, (n,)) < 0.10
    wrong = (cats[:, 0] + 1 + jax.random.randint(k2, (n,), 0, 2)) % 3
    cat_obs = cats.at[:, 0].set(jnp.where(corrupt, wrong, cats[:, 0]))

    model = MixedDataImputer.from_frame(
        numeric, cat_obs, num_levels=(3, 2), atoms=[[0.0], []],
        num_clusters=2, error_correction=True)
    res = run_mcmc(k_run, model.kernel(), model.init_state,
                   num_draws=200, num_chains=1, burn=200)
    final = jax.tree_util.tree_map(lambda a: a[0], res.final_state)
    _, cat_imp = model.imputed_frame(final)

    cmask = np.asarray(corrupt)
    fixed = np.mean(np.asarray(cat_imp[:, 0])[cmask]
                    == np.asarray(cats[:, 0])[cmask])
    kept = np.mean(np.asarray(cat_imp[:, 0])[~cmask]
                   == np.asarray(cats[:, 0])[~cmask])
    assert fixed > 0.6, fixed  # corrupted cells mostly corrected
    assert kept > 0.9, kept    # clean cells mostly left alone
    eps = float(final["eps_cat"][0])
    assert 0.03 < eps < 0.25, eps  # error rate learned near 10%
