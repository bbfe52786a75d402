"""Multinomial probit regression via truncated-normal utility
augmentation.

Reference: Models/Glm/MultinomialProbitModel.hpp:32-127 (+ .cpp): choice
data with subject-level predictors (one coefficient vector per choice,
choice 0 as reference) and optional choice-level predictors (one shared
coefficient vector); latent utilities u_i ~ N(eta_i, Sigma) imputed by a
truncated-MVN Gibbs pass (`impute_u_Gibbs`), then the coefficient draw is
a conjugate Gaussian regression on the complete-data sufstats (xtx/xty
accumulated in `update_suf`).

TPU design notes (not a translation):
  * the per-observation utility Gibbs is vectorized across ALL
    observations at once — each inner step updates utility column m for
    every i simultaneously from its truncated-normal full conditional
    (fixed M-trip loop, M is a static shape);
  * the coefficient block solve exploits the block structure of Phi'Phi
    (subject blocks share a single X'X) instead of materializing the
    [n*M, D] stacked design;
  * the utility covariance is the identity (the standard identified MNP
    scaling; the reference ships an SpdParams utility covariance but its
    scale is not likelihood-identified — we pin it rather than sample an
    unidentified parameter).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from boom_tpu import dists


@dataclasses.dataclass(frozen=True)
class MultinomialProbit:
    """State keys: u [n, M] latent utilities, b [D] stacked coefficients
    with D = (M-1)*p_subject + p_choice (choice 0's subject block pinned
    at zero for identification, reference `make_beta`)."""

    x: jax.Array  # [n, p] subject predictors
    choice: jax.Array  # [n] ints in [0, M)
    num_choices: int
    choice_x: jax.Array | None = None  # [n, M, pc] choice predictors
    prior_sd: float = 10.0
    gibbs_passes: int = 2

    @property
    def _dims(self):
        p = self.x.shape[1]
        pc = 0 if self.choice_x is None else self.choice_x.shape[2]
        return p, pc, (self.num_choices - 1) * p + pc

    def _eta(self, b):
        """[n, M] linear predictor. Subject block m>=1 occupies
        b[(m-1)p:(m)p]; the choice block is the tail."""
        n = self.x.shape[0]
        p, pc, _ = self._dims
        m = self.num_choices
        bs = jnp.concatenate(
            [jnp.zeros((1, p), b.dtype),
             b[: (m - 1) * p].reshape(m - 1, p)], axis=0)  # [M, p]
        eta = self.x @ bs.T  # [n, M]
        if pc:
            eta = eta + jnp.einsum("nmc,c->nm", self.choice_x,
                                   b[(m - 1) * p:])
        return eta

    def init_state(self, key):
        n = self.x.shape[0]
        m = self.num_choices
        _, _, d = self._dims
        onehot = jax.nn.one_hot(self.choice, m, dtype=self.x.dtype)
        return {"b": jnp.zeros((d,), self.x.dtype),
                "u": 2.0 * onehot - 1.0}

    def _impute_u(self, key, u, eta):
        """Truncated-normal Gibbs on utilities (impute_u_Gibbs analog):
        the chosen column stays the max. Identity utility covariance =>
        each column's full conditional is TN(eta_m, 1) with bounds from
        the current other columns."""
        n, m = u.shape
        chosen = self.choice
        col_ids = jnp.arange(m)
        for it in range(self.gibbs_passes):
            for j in range(m):
                kj = jax.random.fold_in(key, it * m + j)
                is_chosen = chosen == j
                # max over other columns (for the chosen-column draw)
                masked = jnp.where(col_ids[None, :] == j, -jnp.inf, u)
                other_max = jnp.max(masked, axis=1)
                u_chosen = u[jnp.arange(n), chosen]
                lo = jnp.where(is_chosen, other_max, -jnp.inf)
                hi = jnp.where(is_chosen, jnp.inf, u_chosen)
                draw = dists.trun_normal.sample(
                    kj, eta[:, j], 1.0, lo=lo, hi=hi)
                u = u.at[:, j].set(draw)
        return u

    def kernel(self):
        n, p = self.x.shape
        m = self.num_choices
        _, pc, d = self._dims
        xtx = self.x.T @ self.x  # shared subject block
        dtype = self.x.dtype
        # static pieces of Phi'Phi
        prec0 = jnp.zeros((d, d), dtype)
        for j in range(m - 1):
            prec0 = jax.lax.dynamic_update_slice(
                prec0, xtx, (j * p, j * p))
        if pc:
            cx = self.choice_x  # [n, M, pc]
            # cross blocks: sum_i x_i c_{i,m+1}' for each subject block
            cross = jnp.einsum("ni,nmc->mic", self.x, cx[:, 1:, :])
            for j in range(m - 1):
                prec0 = jax.lax.dynamic_update_slice(
                    prec0, cross[j], (j * p, (m - 1) * p))
                prec0 = jax.lax.dynamic_update_slice(
                    prec0, cross[j].T, ((m - 1) * p, j * p))
            cc = jnp.einsum("nmc,nmd->cd", cx, cx)
            prec0 = jax.lax.dynamic_update_slice(
                prec0, cc, ((m - 1) * p, (m - 1) * p))
        omega0 = jnp.eye(d, dtype=dtype) / self.prior_sd**2

        def sweep(key, state):
            ku, kb = jax.random.split(key)
            eta = self._eta(state["b"])
            u = self._impute_u(ku, state["u"], eta)
            # Phi'u with the same block structure
            rhs_subject = (self.x.T @ u[:, 1:]).T.reshape(-1)  # [(M-1)p]
            if pc:
                rhs_choice = jnp.einsum("nmc,nm->c", self.choice_x, u)
                rhs = jnp.concatenate([rhs_subject, rhs_choice])
            else:
                rhs = rhs_subject
            prec = omega0 + prec0
            chol = jnp.linalg.cholesky(prec)
            mean = jax.scipy.linalg.cho_solve((chol, True), rhs)
            b = dists.mvn.sample_prec(kb, mean, prec_chol=chol)
            return {"b": b, "u": u}

        return sweep

    def beta_subject(self, state):
        """[M, p] per-choice subject coefficients (row 0 = reference)."""
        p, _, _ = self._dims
        m = self.num_choices
        return jnp.concatenate(
            [jnp.zeros((1, p), state["b"].dtype),
             state["b"][: (m - 1) * p].reshape(m - 1, p)], axis=0)

    def beta_choice(self, state):
        p, pc, _ = self._dims
        return state["b"][(self.num_choices - 1) * p:]

    def choice_probs(self, key, state, x_new, choice_x_new=None,
                     num_sims: int = 512):
        """Monte-Carlo choice probabilities P(argmax_m u = m | x) for new
        subjects (the MNP likelihood has no closed form; the reference
        evaluates it the same way)."""
        model = dataclasses.replace(
            self, x=x_new,
            choice=jnp.zeros((x_new.shape[0],), jnp.int32),
            choice_x=choice_x_new)
        eta = model._eta(state["b"])  # [n, M]
        eps = jax.random.normal(
            key, (num_sims,) + eta.shape, eta.dtype)
        winners = jnp.argmax(eta[None] + eps, axis=-1)  # [S, n]
        return jnp.mean(
            jax.nn.one_hot(winners, self.num_choices, dtype=eta.dtype),
            axis=0)

    @staticmethod
    def simulate(key, n, num_choices, beta_subject, seed_x=None):
        """Simulate subject-predictor choice data from known utilities."""
        kx, ke = jax.random.split(key)
        beta_subject = jnp.asarray(beta_subject)  # [M, p]
        p = beta_subject.shape[1]
        x = jnp.concatenate(
            [jnp.ones((n, 1)), jax.random.normal(kx, (n, p - 1))], axis=1)
        eta = x @ beta_subject.T
        u = eta + jax.random.normal(ke, eta.shape)
        return x, jnp.argmax(u, axis=1)
