"""Chunked MCMC driver: progress, checkpointing, interrupt/timeout
partial results (reference bsts.cc:83-117 `ngood` semantics +
cpputil/ProgressTracker.hpp)."""

import io
import os

import jax
import jax.numpy as jnp
import numpy as np

from boom_tpu.inference import run_mcmc, run_mcmc_chunked
from boom_tpu.models.conjugate import GaussianSuf, gaussian_mean_var_draw


class _Toy:
    """Minimal conjugate Gaussian mean/variance model for driver tests."""

    def __init__(self, key):
        y = 2.0 + 0.5 * jax.random.normal(key, (200,))
        self.suf = GaussianSuf.from_data(y)

    def init_state(self, key):
        return {"mu": 1.0 + jax.random.normal(key, ()),
                "sigsq": jnp.ones(())}

    def kernel(self):
        def sweep(key, state):
            mu, sigsq = gaussian_mean_var_draw(
                key, self.suf, prior_mean=0.0, prior_nobs=0.01,
                prior_df=0.1, prior_sigsq=1.0)
            return {"mu": mu, "sigsq": sigsq}

        return sweep


def _model(key):
    return _Toy(key)


def test_chunked_matches_monolithic(rng_key):
    model = _model(rng_key)
    res_c = run_mcmc_chunked(jax.random.key(1), model.kernel(),
                             model.init_state, num_draws=200,
                             num_chains=4, burn=100, chunk_size=50)
    res_m = run_mcmc(jax.random.key(2), model.kernel(), model.init_state,
                     num_draws=200, num_chains=4, burn=100)
    assert res_c.ngood == 200
    mu_c = float(jnp.mean(res_c.draws["mu"]))
    mu_m = float(jnp.mean(res_m.draws["mu"]))
    assert abs(mu_c - mu_m) < 0.05, (mu_c, mu_m)
    assert abs(mu_c - 2.0) < 0.1


def test_chunked_timeout_partial_results(rng_key):
    """A zero timeout after the first chunk yields a partial result with
    ngood < num_draws and zero-padded trailing draws."""
    model = _model(rng_key)
    res = run_mcmc_chunked(jax.random.key(3), model.kernel(),
                           model.init_state, num_draws=500,
                           num_chains=2, burn=0, chunk_size=25,
                           timeout_seconds=1e-6)
    assert 0 < res.ngood < 500
    # shapes stable; valid prefix nonzero, padding zero
    assert res.draws["mu"].shape == (2, 500)
    assert float(jnp.abs(res.draws["mu"][:, :res.ngood]).min()) > 0
    np.testing.assert_array_equal(
        np.asarray(res.draws["mu"][:, res.ngood:]), 0.0)


def test_chunked_progress_and_checkpoint(rng_key, tmp_path):
    import sys

    model = _model(rng_key)
    path = os.path.join(tmp_path, "chk.npz")
    stream = io.StringIO()
    old = sys.stderr
    sys.stderr = stream
    try:
        res = run_mcmc_chunked(jax.random.key(4), model.kernel(),
                               model.init_state, num_draws=100,
                               num_chains=2, burn=50, chunk_size=25,
                               ping=50, checkpoint_path=path,
                               checkpoint_every=2)
    finally:
        sys.stderr = old
    assert res.ngood == 100
    assert "iteration" in stream.getvalue()
    assert os.path.exists(path)
