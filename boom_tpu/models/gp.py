"""Gaussian-process regression with MCMC over kernel hyperparameters.

Reference: Models/GP — GaussianProcessRegressionModel.hpp, kernels.hpp
(RadialBasisFunction, MahalanobisKernel), GpMeanFunction,
HierarchicalGpRegressionModel, with slice/MH kernel-parameter samplers in
GP/PosteriorSamplers.

TPU form: the marginal likelihood is one Cholesky of the [n, n] Gram
matrix (MXU GEMMs dominate); hyperparameters (log amplitude, log
lengthscale, log noise sd) move by slice sampling on the collapsed
marginal — the same sampler structure as the reference's
GaussianProcessRegressionPosteriorSampler but with every candidate's
Gram matrix built as a batched op under vmap over chains.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from boom_tpu.inference.kernels.slice import slice_step


def rbf_kernel(x1, x2, amplitude, lengthscale):
    """Squared-exponential Gram matrix (reference kernels.hpp
    RadialBasisFunction). x1 [n, d], x2 [m, d] -> [n, m]."""
    d2 = jnp.sum((x1[:, None, :] - x2[None, :, :]) ** 2, -1)
    return amplitude**2 * jnp.exp(-0.5 * d2 / lengthscale**2)


def mahalanobis_kernel(x1, x2, amplitude, scale_diag):
    """Per-dimension lengthscales (reference MahalanobisKernel)."""
    z1 = x1 / scale_diag
    z2 = x2 / scale_diag
    d2 = jnp.sum((z1[:, None, :] - z2[None, :, :]) ** 2, -1)
    return amplitude**2 * jnp.exp(-0.5 * d2)


@dataclasses.dataclass(frozen=True)
class GpRegression:
    """y = f(x) + eps, f ~ GP(0, k_rbf), eps ~ N(0, sigsq).

    State: log_amp, log_length, log_sigma (all slice-sampled on the
    collapsed marginal likelihood with independent N(m, s^2) priors on
    the logs)."""

    x: jax.Array  # [n, d]
    y: jax.Array  # [n]
    log_amp_prior: tuple = (0.0, 1.0)
    log_length_prior: tuple = (0.0, 1.0)
    log_sigma_prior: tuple = (0.0, 1.0)

    def marginal_loglik(self, log_amp, log_length, log_sigma):
        n = self.y.shape[0]
        k = rbf_kernel(self.x, self.x, jnp.exp(log_amp),
                       jnp.exp(log_length))
        k = k + (jnp.exp(2.0 * log_sigma)
                 + 1e-8) * jnp.eye(n, dtype=k.dtype)
        chol = jnp.linalg.cholesky(k)
        alpha = jax.scipy.linalg.cho_solve((chol, True), self.y)
        return (-0.5 * self.y @ alpha
                - jnp.sum(jnp.log(jnp.diagonal(chol)))
                - 0.5 * n * jnp.log(2.0 * jnp.pi))

    def init_state(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        sd = jnp.std(self.y)
        spread = jnp.std(self.x)
        return {
            "log_amp": jnp.log(sd + 1e-6)
            + 0.3 * jax.random.normal(k1, ()),
            "log_length": jnp.log(spread + 1e-6)
            + 0.3 * jax.random.normal(k2, ()),
            "log_sigma": jnp.log(0.3 * sd + 1e-6)
            + 0.3 * jax.random.normal(k3, ()),
        }

    def kernel(self):
        def logpost(la, ll, ls):
            def nprior(v, ms):
                return -0.5 * ((v - ms[0]) / ms[1]) ** 2

            return (self.marginal_loglik(la, ll, ls)
                    + nprior(la, self.log_amp_prior)
                    + nprior(ll, self.log_length_prior)
                    + nprior(ls, self.log_sigma_prior))

        def sweep(key, state):
            k1, k2, k3 = jax.random.split(key, 3)
            la, ll, ls = (state["log_amp"], state["log_length"],
                          state["log_sigma"])
            la = slice_step(k1, la, lambda v: logpost(v, ll, ls),
                            width=0.5, lower=-8.0, upper=8.0)
            ll = slice_step(k2, ll, lambda v: logpost(la, v, ls),
                            width=0.5, lower=-8.0, upper=8.0)
            ls = slice_step(k3, ls, lambda v: logpost(la, ll, v),
                            width=0.5, lower=-8.0, upper=8.0)
            return {"log_amp": la, "log_length": ll, "log_sigma": ls}

        return sweep

    def posterior_mean_cov(self, state, x_new):
        """Predictive mean/cov at x_new given hyperparameters (reference
        GaussianProcessRegressionModel::predict_distribution)."""
        amp = jnp.exp(state["log_amp"])
        ell = jnp.exp(state["log_length"])
        sigsq = jnp.exp(2.0 * state["log_sigma"])
        n = self.y.shape[0]
        k_nn = rbf_kernel(self.x, self.x, amp, ell) + (
            sigsq + 1e-8) * jnp.eye(n)
        k_sn = rbf_kernel(x_new, self.x, amp, ell)
        k_ss = rbf_kernel(x_new, x_new, amp, ell)
        chol = jnp.linalg.cholesky(k_nn)
        alpha = jax.scipy.linalg.cho_solve((chol, True), self.y)
        mean = k_sn @ alpha
        v = jax.scipy.linalg.solve_triangular(chol, k_sn.T, lower=True)
        cov = k_ss - v.T @ v
        return mean, cov

    def predict_draw(self, key, state, x_new):
        mean, cov = self.posterior_mean_cov(state, x_new)
        chol = jnp.linalg.cholesky(
            cov + 1e-8 * jnp.eye(cov.shape[0], dtype=cov.dtype))
        return mean + chol @ jax.random.normal(key, mean.shape, mean.dtype)
