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
    """y = m(x) + f(x) + eps, f ~ GP(0, k), eps ~ N(0, sigsq).

    State: log_amp, log_sigma, and either log_length (rbf) or
    log_scales [d] (mahalanobis / ARD), all slice-sampled on the
    collapsed marginal likelihood with independent N(m, s^2) priors on
    the logs. With `mean_design` H set (reference GpMeanFunction's
    LinearMeanFunction), the state also carries beta [q], drawn from its
    conjugate Gaussian conditional given the kernel parameters — the
    marginal y - H beta ~ N(0, K + sigsq I) makes that draw exact."""

    x: jax.Array  # [n, d]
    y: jax.Array  # [n]
    log_amp_prior: tuple = (0.0, 1.0)
    log_length_prior: tuple = (0.0, 1.0)
    log_sigma_prior: tuple = (0.0, 1.0)
    kernel_type: str = "rbf"  # "rbf" | "mahalanobis"
    mean_design: jax.Array | None = None  # [n, q] H, or None (zero mean)

    def _gram(self, x1, x2, state):
        amp = jnp.exp(state["log_amp"])
        if self.kernel_type == "mahalanobis":
            return mahalanobis_kernel(x1, x2, amp,
                                      jnp.exp(state["log_scales"]))
        return rbf_kernel(x1, x2, amp, jnp.exp(state["log_length"]))

    def _resid(self, state):
        if self.mean_design is None:
            return self.y
        return self.y - self.mean_design @ state["beta"]

    def _chol_c(self, state):
        n = self.y.shape[0]
        k = self._gram(self.x, self.x, state)
        k = k + (jnp.exp(2.0 * state["log_sigma"])
                 + 1e-8) * jnp.eye(n, dtype=k.dtype)
        return jnp.linalg.cholesky(k)

    def marginal_loglik_state(self, state):
        n = self.y.shape[0]
        chol = self._chol_c(state)
        r = self._resid(state)
        alpha = jax.scipy.linalg.cho_solve((chol, True), r)
        return (-0.5 * r @ alpha
                - jnp.sum(jnp.log(jnp.diagonal(chol)))
                - 0.5 * n * jnp.log(2.0 * jnp.pi))

    def marginal_loglik(self, log_amp, log_length, log_sigma):
        return self.marginal_loglik_state({
            "log_amp": log_amp, "log_length": log_length,
            "log_sigma": log_sigma})

    def init_state(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        sd = jnp.std(self.y)
        spread = jnp.std(self.x)
        state = {
            "log_amp": jnp.log(sd + 1e-6)
            + 0.3 * jax.random.normal(k1, ()),
            "log_sigma": jnp.log(0.3 * sd + 1e-6)
            + 0.3 * jax.random.normal(k3, ()),
        }
        base = jnp.log(spread + 1e-6)
        if self.kernel_type == "mahalanobis":
            d = self.x.shape[1]
            state["log_scales"] = base + 0.3 * jax.random.normal(
                k2, (d,))
        else:
            state["log_length"] = base + 0.3 * jax.random.normal(k2, ())
        if self.mean_design is not None:
            state["beta"] = jnp.zeros(self.mean_design.shape[1],
                                      self.x.dtype)
        return state

    def _draw_beta(self, key, state):
        """beta | theta, y ~ N((H'C^-1 H)^-1 H'C^-1 y, (H'C^-1 H)^-1)
        under a flat prior — exact because y - H beta is Gaussian with
        known covariance C given the kernel parameters."""
        h = self.mean_design
        chol = self._chol_c(state)
        ci_h = jax.scipy.linalg.cho_solve((chol, True), h)
        prec = h.T @ ci_h
        mean = jnp.linalg.solve(prec, ci_h.T @ self.y)
        pchol = jnp.linalg.cholesky(
            prec + 1e-10 * jnp.eye(prec.shape[0], dtype=prec.dtype))
        z = jax.random.normal(key, mean.shape, mean.dtype)
        return mean + jax.scipy.linalg.solve_triangular(
            pchol.T, z, lower=False)

    def kernel(self):
        def nprior(v, ms):
            return jnp.sum(-0.5 * ((v - ms[0]) / ms[1]) ** 2)

        def logpost(state):
            lp = (self.marginal_loglik_state(state)
                  + nprior(state["log_amp"], self.log_amp_prior)
                  + nprior(state["log_sigma"], self.log_sigma_prior))
            if self.kernel_type == "mahalanobis":
                lp = lp + nprior(state["log_scales"],
                                 self.log_length_prior)
            else:
                lp = lp + nprior(state["log_length"],
                                 self.log_length_prior)
            return lp

        def slice_field(key, state, name):
            val = slice_step(
                key, state[name],
                lambda v: logpost({**state, name: v}),
                width=0.5, lower=-8.0, upper=8.0)
            return {**state, name: val}

        def sweep(key, state):
            k1, k2, k3, k4 = jax.random.split(key, 4)
            state = slice_field(k1, state, "log_amp")
            if self.kernel_type == "mahalanobis":
                d = state["log_scales"].shape[0]

                def one_dim(st, inp):
                    j, kj = inp
                    v = slice_step(
                        kj, st["log_scales"][j],
                        lambda u: logpost(
                            {**st,
                             "log_scales": st["log_scales"].at[j].set(u)}),
                        width=0.5, lower=-8.0, upper=8.0)
                    return ({**st,
                             "log_scales": st["log_scales"].at[j].set(v)},
                            None)

                state, _ = jax.lax.scan(
                    one_dim, state,
                    (jnp.arange(d), jax.random.split(k2, d)))
            else:
                state = slice_field(k2, state, "log_length")
            state = slice_field(k3, state, "log_sigma")
            if self.mean_design is not None:
                state = {**state, "beta": self._draw_beta(k4, state)}
            return state

        return sweep

    def posterior_mean_cov(self, state, x_new, h_new=None):
        """Predictive mean/cov at x_new given hyperparameters (reference
        GaussianProcessRegressionModel::predict_distribution). With a
        linear mean function, pass h_new [m, q] to evaluate it."""
        n = self.y.shape[0]
        chol = self._chol_c(state)
        k_sn = self._gram(x_new, self.x, state)
        k_ss = self._gram(x_new, x_new, state)
        r = self._resid(state)
        alpha = jax.scipy.linalg.cho_solve((chol, True), r)
        mean = k_sn @ alpha
        if self.mean_design is not None and h_new is not None:
            mean = mean + h_new @ state["beta"]
        v = jax.scipy.linalg.solve_triangular(chol, k_sn.T, lower=True)
        cov = k_ss - v.T @ v
        return mean, cov

    def predict_draw(self, key, state, x_new, h_new=None):
        mean, cov = self.posterior_mean_cov(state, x_new, h_new)
        chol = jnp.linalg.cholesky(
            cov + 1e-8 * jnp.eye(cov.shape[0], dtype=cov.dtype))
        return mean + chol @ jax.random.normal(key, mean.shape, mean.dtype)


def _mvn_draw(key, mean, cov):
    chol = jnp.linalg.cholesky(
        cov + 1e-6 * jnp.eye(cov.shape[0], dtype=cov.dtype))
    return mean + chol @ jax.random.normal(key, mean.shape, mean.dtype)


@dataclasses.dataclass(frozen=True)
class HierarchicalGpRegression:
    """Hierarchical GP (reference Models/GP/
    HierarchicalGpRegressionModel.hpp:85): a shared mean function
        f0(X) ~ GP(m0, K0),
    K group deviations fj(Xj) ~ GP(f0(Xj), Kj), and observations
        yj | fj ~ N(fj(Xj), sigsq_j I)
    (hpp:60-70). Gibbs sweep mirrors the reference's
    HierarchicalGpPosteriorSampler: draw each fj | f0, yj (Gaussian
    conditional), draw f0 | {fj} with block-diagonal Kj observation
    noise, then conjugate inverse-gamma sigsq_j.

    TPU form: groups are a fixed-shape [K, n, d] stack (pad + `mask`;
    masked points get infinite observation noise so they carry prior
    weight only); all K group conditionals run under one vmap; the f0
    update is a single [K*n, K*n] Cholesky on the stacked points.

    State: f [K, n] group functions, f0 [K*n] shared function at the
    stacked points, sigsq [K].
    """

    x: jax.Array  # [K, n, d] padded group predictors
    y: jax.Array  # [K, n]
    mask: jax.Array | None = None  # [K, n] True = observed
    amp0: float = 1.0          # K0 amplitude (shared mean function)
    length0: float = 1.0       # K0 lengthscale
    amp_group: float = 0.5     # Kj amplitude (group deviations)
    length_group: float = 1.0  # Kj lengthscale
    sigsq_a: float = 1.0       # IG prior on sigsq_j
    sigsq_b: float = 1.0

    def _masks(self):
        if self.mask is None:
            return jnp.ones(self.y.shape, bool)
        return self.mask

    def _k_group(self, xj):
        n = xj.shape[0]
        k = rbf_kernel(xj, xj, self.amp_group, self.length_group)
        return k + 1e-6 * jnp.eye(n, dtype=k.dtype)

    def init_state(self, key):
        kk, n = self.y.shape
        m = self._masks()
        ybar = jnp.sum(self.y * m, 1) / jnp.maximum(jnp.sum(m, 1), 1.0)
        return {"f": jnp.broadcast_to(ybar[:, None], (kk, n)) + 0.0,
                "f0": jnp.zeros((kk * n,), self.y.dtype),
                "sigsq": jnp.ones((kk,), self.y.dtype)}

    def kernel(self):
        kk, n, _ = self.x.shape
        mask = self._masks()
        x_all = self.x.reshape(kk * n, -1)
        k0_all = rbf_kernel(x_all, x_all, self.amp0, self.length0)
        k0_all = k0_all + 1e-6 * jnp.eye(kk * n, dtype=k0_all.dtype)
        kj_all = jax.vmap(self._k_group)(self.x)  # [K, n, n]

        def sweep(key, state):
            kf, k0, ks = jax.random.split(key, 3)
            f0_blocks = state["f0"].reshape(kk, n)

            # 1. fj | f0, yj: prior N(f0_j, Kj), data N(fj, sigsq_j I)
            def draw_fj(k, kj, f0j, yj, mj, s2):
                noise = jnp.where(mj, s2, 1e12)
                s_mat = kj + jnp.diag(noise)
                chol = jnp.linalg.cholesky(s_mat)
                resid = jnp.where(mj, yj - f0j, 0.0)
                gain = jax.scipy.linalg.cho_solve((chol, True), kj)
                mean = f0j + gain.T @ resid
                cov = kj - kj @ gain
                return _mvn_draw(k, mean, 0.5 * (cov + cov.T))

            f = jax.vmap(draw_fj)(
                jax.random.split(kf, kk), kj_all, f0_blocks, self.y, mask,
                state["sigsq"])

            # 2. f0 | {fj}: fj are exact observations of f0 with block
            # noise Kj (hpp:66-68)
            noise_block = jax.scipy.linalg.block_diag(
                *[kj_all[j] for j in range(kk)])
            s_mat = k0_all + noise_block
            chol = jnp.linalg.cholesky(s_mat)
            gain = jax.scipy.linalg.cho_solve((chol, True), k0_all)
            mean = gain.T @ f.reshape(-1)
            cov = k0_all - k0_all @ gain
            f0 = _mvn_draw(k0, mean, 0.5 * (cov + cov.T))

            # 3. sigsq_j | fj, yj (conjugate inverse gamma)
            resid2 = jnp.sum(jnp.where(mask, (self.y - f) ** 2, 0.0), 1)
            nj = jnp.sum(mask, 1)
            from boom_tpu import dists
            sigsq = 1.0 / dists.gamma.sample(
                ks, self.sigsq_a + 0.5 * nj, self.sigsq_b + 0.5 * resid2)
            return {"f": f, "f0": f0, "sigsq": sigsq}

        return sweep

    def predict_group(self, state, x_new, group):
        """Posterior mean of fj at x_new given the current draw: the GP
        conditional of the deviation around the f0 conditional mean."""
        xj = self.x[group]
        kj = self._k_group(xj)
        k_sn = rbf_kernel(x_new, xj, self.amp_group, self.length_group)
        x_all = self.x.reshape(self.x.shape[0] * self.x.shape[1], -1)
        k0_sn = rbf_kernel(x_new, x_all, self.amp0, self.length0)
        k0_all = rbf_kernel(x_all, x_all, self.amp0, self.length0)
        k0_all = k0_all + 1e-6 * jnp.eye(x_all.shape[0], dtype=k0_all.dtype)
        f0_new = k0_sn @ jnp.linalg.solve(k0_all, state["f0"])
        n = xj.shape[0]
        f0j = state["f0"].reshape(self.y.shape)[group]
        dev = state["f"][group] - f0j
        return f0_new + k_sn @ jnp.linalg.solve(kj, dev)

    @staticmethod
    def simulate(key, x, f0_fn, group_dev_fns, sigma):
        """Simulate grouped data from known functions (for tests)."""
        kk, n, _ = x.shape
        ys = []
        keys = jax.random.split(key, kk)
        for j in range(kk):
            mean = f0_fn(x[j]) + group_dev_fns[j](x[j])
            ys.append(mean + sigma * jax.random.normal(keys[j], (n,)))
        return jnp.stack(ys)
