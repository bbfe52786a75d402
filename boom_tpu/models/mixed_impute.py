"""Mixed-data imputation with atoms, clustering, and error correction.

Reference: Models/Impute/MixedDataImputer.hpp:612 and
MixedDataImputerWithErrorCorrection.hpp:310 (+ the python front end
Interfaces/python/impute). The reference model:

  * each row belongs to a latent CLUSTER; per cluster there is a
    "row model" with one scalar model per variable;
  * categorical variables get per-cluster multinomials over levels;
  * numeric variables are SEMICONTINUOUS: a per-cluster multinomial
    chooses between a set of known ATOMS (frequently-repeated special
    values like 0 or 99999) and an implicit "numeric" category;
  * the numeric components are copula-transformed (normal scores) and
    jointly modeled by a multivariate regression on the dummy-encoded
    categorical variables;
  * the error-correction variant lets an OBSERVED value disagree with
    the truth: with per-variable error probability the observation is
    garbage, so even observed cells get re-imputed truths.

TPU-native design: all per-row work (cluster draws, truth draws, latent
Gaussian conditionals) is batched over the whole frame; level/atom
axes are padded to static maxima with -inf masking; one Gibbs sweep is
a single jitted program.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from boom_tpu import dists
from boom_tpu.models.impute import normal_scores

_NEG = -1e30


def _masked_dirichlet(key, counts, mask, prior=1.0):
    """Dirichlet draw over a padded axis: gamma draws on valid cells,
    zeros elsewhere, normalized."""
    g = jax.random.gamma(key, counts + prior)
    g = jnp.where(mask, g, 0.0)
    return g / jnp.maximum(jnp.sum(g, -1, keepdims=True), 1e-30)


@dataclasses.dataclass(frozen=True)
class MixedDataImputer:
    """Gibbs imputer for a frame of numeric + categorical columns.

    numeric: [n, d_num] observed numeric values (anything at missing).
    numeric_observed: [n, d_num] bool.
    categorical: [n, d_cat] int level codes (anything at missing).
    cat_observed: [n, d_cat] bool.
    num_levels: per-categorical-variable level counts (static).
    atoms: [d_num, A] padded atom values; atom_mask [d_num, A] marks
      real atoms (reference NumericScalarModel's atom set).
    num_clusters: mixture components over rows (reference num_clusters).
    error_correction: if True, observed cells may be wrong: per variable
      an error probability eps_v ~ Beta(a, b); an erroneous cell's
      observation is uniform garbage, so its truth is re-imputed
      (reference MixedDataImputerWithErrorCorrection).
    """

    numeric: jax.Array
    numeric_observed: jax.Array
    categorical: jax.Array
    cat_observed: jax.Array
    num_levels: tuple
    atoms: jax.Array | None = None
    atom_mask: jax.Array | None = None
    num_clusters: int = 1
    error_correction: bool = False
    error_prior_a: float = 1.0
    error_prior_b: float = 19.0
    wishart_df: float | None = None

    @staticmethod
    def from_frame(numeric, categorical, num_levels, atoms=None,
                   num_clusters=1, **kw):
        """Build from arrays containing NaN (numeric) / negative codes
        (categorical) at missing cells. atoms: list of per-variable
        lists of atom values."""
        numeric = jnp.asarray(numeric, jnp.result_type(float))
        categorical = jnp.asarray(categorical, jnp.int32)
        num_obs = jnp.isfinite(numeric)
        cat_obs = categorical >= 0
        d_num = numeric.shape[1]
        if atoms is None:
            atom_arr = jnp.zeros((d_num, 1))
            atom_msk = jnp.zeros((d_num, 1), bool)
        else:
            amax = max(1, max(len(a) for a in atoms))
            atom_arr = np.zeros((d_num, amax))
            atom_msk = np.zeros((d_num, amax), bool)
            for v, a in enumerate(atoms):
                atom_arr[v, :len(a)] = a
                atom_msk[v, :len(a)] = True
            atom_arr = jnp.asarray(atom_arr)
            atom_msk = jnp.asarray(atom_msk)
        return MixedDataImputer(
            numeric=jnp.where(num_obs, numeric, 0.0),
            numeric_observed=num_obs,
            categorical=jnp.where(cat_obs, categorical, 0),
            cat_observed=cat_obs, num_levels=tuple(num_levels),
            atoms=atom_arr, atom_mask=atom_msk,
            num_clusters=num_clusters, **kw)

    # -- static structure ----------------------------------------------------
    @property
    def n(self):
        return self.numeric.shape[0]

    @property
    def d_num(self):
        return self.numeric.shape[1]

    @property
    def d_cat(self):
        return self.categorical.shape[1]

    @property
    def l_max(self):
        return max(self.num_levels) if self.num_levels else 1

    @property
    def a_max(self):
        return self.atoms.shape[1]

    @property
    def enc_dim(self):
        # one-hot (all levels) per variable + intercept
        return 1 + sum(self.num_levels)

    @property
    def _level_mask(self):
        m = np.zeros((self.d_cat, self.l_max), bool)
        for v, nl in enumerate(self.num_levels):
            m[v, :nl] = True
        return jnp.asarray(m)

    @property
    def _atom_type_mask(self):
        """[d_num, A+1] valid truth types per numeric variable (atoms +
        final 'numeric' category)."""
        return jnp.concatenate(
            [self.atom_mask, jnp.ones((self.d_num, 1), bool)], axis=1)

    def _observed_atom_index(self):
        """[n, d_num] int: which atom each OBSERVED value equals, A (=
        numeric) when none, -1 when missing (reference atom_index)."""
        eq = jnp.isclose(self.numeric[:, :, None],
                         self.atoms[None, :, :], rtol=1e-6, atol=1e-9)
        eq = eq & self.atom_mask[None, :, :]
        idx = jnp.where(jnp.any(eq, -1), jnp.argmax(eq, -1),
                        self.a_max)
        return jnp.where(self.numeric_observed, idx, -1)

    def _scores(self):
        """Copula (normal-scores) transform of the non-atom observed
        numeric values, plus per-variable sorted lookup tables for the
        inverse transform."""
        obs_idx = self._observed_atom_index()
        is_numeric_obs = obs_idx == self.a_max
        cols = []
        for v in range(self.d_num):
            cols.append(normal_scores(self.numeric[:, v],
                                      is_numeric_obs[:, v]))
        return jnp.stack(cols, 1), is_numeric_obs

    def _encode(self, cats):
        """[n, enc_dim] one-hot encoding with intercept."""
        parts = [jnp.ones((cats.shape[0], 1))]
        for v, nl in enumerate(self.num_levels):
            parts.append(jax.nn.one_hot(cats[:, v], nl))
        return jnp.concatenate(parts, 1)

    # -- state ----------------------------------------------------------------
    def init_state(self, key):
        keys = jax.random.split(key, 8)
        k = self.num_clusters
        z_scores, is_num_obs = self._scores()
        obs_idx = self._observed_atom_index()
        state = {
            "cluster": jax.random.randint(keys[0], (self.n,), 0, k),
            "pi": jnp.full((k,), 1.0 / k),
            # per-cluster per-variable level probs [K, d_cat, L]
            "theta": _masked_dirichlet(
                keys[1], jnp.zeros((k, self.d_cat, self.l_max)),
                self._level_mask[None]),
            # per-cluster atom-type probs [K, d_num, A+1]
            "tau": _masked_dirichlet(
                keys[2], jnp.zeros((k, self.d_num, self.a_max + 1)),
                self._atom_type_mask[None]),
            # truth states
            "true_cat": self.categorical,
            "atom_type": jnp.where(obs_idx >= 0, obs_idx, self.a_max),
            "y_z": z_scores,  # latent Gaussian numeric values
            # regression of y_z on encoded categoricals
            "b_mat": jnp.zeros((self.enc_dim, self.d_num)),
            "sigma": jnp.eye(self.d_num),
        }
        if self.error_correction:
            state["eps_cat"] = jnp.full((self.d_cat,), 0.05)
            state["eps_num"] = jnp.full((self.d_num,), 0.05)
        return state

    # -- sweep -----------------------------------------------------------------
    def kernel(self):
        lvl_mask = self._level_mask
        type_mask = self._atom_type_mask
        obs_idx = self._observed_atom_index()
        z_obs_scores, is_num_obs = self._scores()
        n, k = self.n, self.num_clusters

        def sweep(key, state):
            keys = jax.random.split(key, 12)
            out = dict(state)
            sig_inv = jnp.linalg.inv(
                state["sigma"] + 1e-8 * jnp.eye(self.d_num))

            # ---- 1. cluster assignments (reference impute_row_cluster)
            # theta -> [d_cat, L, K]; gather the current truth's prob per
            # (row, variable, cluster)
            theta_vlk = jnp.moveaxis(state["theta"], 0, 2)
            th_vals = theta_vlk[jnp.arange(self.d_cat)[None, :],
                                state["true_cat"], :]  # [n, d_cat, K]
            lp_cat = jnp.sum(jnp.log(jnp.maximum(th_vals, 1e-30)), 1)
            tau_vak = jnp.moveaxis(state["tau"], 0, 2)
            tau_vals = tau_vak[jnp.arange(self.d_num)[None, :],
                               state["atom_type"], :]  # [n, d_num, K]
            lp_atom = jnp.sum(jnp.log(jnp.maximum(tau_vals, 1e-30)), 1)
            logits = jnp.log(jnp.maximum(state["pi"], 1e-30))[None] \
                + lp_cat + lp_atom
            cluster = jax.random.categorical(keys[0], logits, axis=-1)
            out["cluster"] = cluster

            # ---- 2. true categories per variable (Gibbs over variables;
            # includes the numeric-regression feedback term: reference
            # RowModel::impute_categorical conditions on numeric data)
            true_cat = state["true_cat"]
            resid = state["y_z"] - self._encode(true_cat) @ state["b_mat"]
            ck = jax.random.split(keys[1], max(self.d_cat, 1))
            for v in range(self.d_cat):
                nl = self.num_levels[v]
                off = 1 + sum(self.num_levels[:v])
                b_v = state["b_mat"][off:off + nl]  # [nl, d_num]
                cur = true_cat[:, v]
                # residual with variable v's contribution removed
                r0 = resid + b_v[cur]  # [n, d_num]
                # candidate residuals per level: r0 - b_v[l]
                cand = r0[:, None, :] - b_v[None, :, :]  # [n, nl, d_num]
                quad = -0.5 * jnp.einsum(
                    "nlp,pq,nlq->nl", cand, sig_inv, cand)
                lp = jnp.log(jnp.maximum(
                    state["theta"][cluster, v, :nl], 1e-30)) + quad
                if self.error_correction:
                    e = state["eps_cat"][v]
                    same = (jnp.arange(nl)[None, :]
                            == self.categorical[:, v][:, None])
                    lp_err = jnp.where(
                        same, jnp.log1p(-e + e / nl),
                        jnp.log(jnp.maximum(e / nl, 1e-30)))
                    lp = lp + jnp.where(self.cat_observed[:, v][:, None],
                                        lp_err, 0.0)
                    new_v = jax.random.categorical(ck[v], lp, -1)
                else:
                    new_v = jnp.where(
                        self.cat_observed[:, v],
                        cur, jax.random.categorical(ck[v], lp, -1))
                resid = r0 - b_v[new_v]
                true_cat = true_cat.at[:, v].set(new_v)
            out["true_cat"] = true_cat

            # ---- 3. atom types (truth) per numeric variable
            tau_row = state["tau"][cluster]  # [n, d_num, A+1]
            lp_type = jnp.log(jnp.maximum(tau_row, 1e-30))
            lp_type = jnp.where(type_mask[None], lp_type, _NEG)
            if self.error_correction:
                # observed value may be erroneous: truth type t vs
                # observation o: match w.p. (1-e)+garbage, else garbage
                e = state["eps_num"][None, :, None]
                o = obs_idx[:, :, None]
                t_idx = jnp.arange(self.a_max + 1)[None, None, :]
                match = (t_idx == o)
                n_types = jnp.sum(type_mask, -1)[None, :, None]
                lp_obs = jnp.where(
                    match, jnp.log1p(-e + e / n_types),
                    jnp.log(jnp.maximum(e / n_types, 1e-30)))
                lp_type = lp_type + jnp.where(
                    (o >= 0), lp_obs, 0.0)
                atom_type = jax.random.categorical(keys[2], lp_type, -1)
            else:
                samp = jax.random.categorical(keys[2], lp_type, -1)
                atom_type = jnp.where(obs_idx >= 0, obs_idx, samp)
            out["atom_type"] = atom_type

            # ---- 4. latent numeric values: trusted cells keep their
            # copula scores; everything else drawn from the regression
            # conditional given the row's trusted cells
            trusted = is_num_obs & (atom_type == self.a_max)
            if self.error_correction:
                trusted = trusted & (obs_idx == atom_type)
            mu = self._encode(true_cat) @ state["b_mat"]  # [n, d_num]

            def impute_row(kk, mu_row, z_row, trust_row):
                # y ~ N(mu, Sigma) conditioned (to 1e-4 precision) on the
                # trusted coordinates: soft-evidence trick with a huge
                # diagonal precision on trusted cells
                d_big = jnp.where(trust_row, 1e8, 0.0)
                q = sig_inv + jnp.diag(d_big)
                b = sig_inv @ mu_row + d_big * z_row
                chol = jnp.linalg.cholesky(q)
                m = jax.scipy.linalg.cho_solve((chol, True), b)
                noise = jax.scipy.linalg.solve_triangular(
                    chol.T, jax.random.normal(kk, (self.d_num,)),
                    lower=False)
                return m + noise

            rk = jax.random.split(keys[3], n)
            y_z = jax.vmap(impute_row)(rk, mu, z_obs_scores, trusted)
            y_z = jnp.where(trusted, z_obs_scores, y_z)
            out["y_z"] = y_z

            # ---- 5. conjugate parameter draws
            # pi | clusters
            cnt = jax.ops.segment_sum(jnp.ones((n,)), cluster, k)
            out["pi"] = _masked_dirichlet(
                keys[4], cnt[None], jnp.ones((1, k), bool))[0]
            # theta | true categories
            onehot_c = jax.nn.one_hot(cluster, k)  # [n, K]
            oh_lvl = jax.nn.one_hot(true_cat, self.l_max)  # [n,d_cat,L]
            counts_theta = jnp.einsum("nk,nvl->kvl", onehot_c, oh_lvl)
            out["theta"] = _masked_dirichlet(
                keys[5], counts_theta, lvl_mask[None])
            # tau | atom types
            oh_t = jax.nn.one_hot(atom_type, self.a_max + 1)
            counts_tau = jnp.einsum("nk,nva->kva", onehot_c, oh_t)
            out["tau"] = _masked_dirichlet(keys[6], counts_tau,
                                           type_mask[None])
            # error probabilities
            if self.error_correction:
                err_c = (true_cat != self.categorical) & self.cat_observed
                n_obs_c = jnp.sum(self.cat_observed, 0)
                e_cnt = jnp.sum(err_c, 0)
                out["eps_cat"] = dists.beta.sample(
                    keys[7], self.error_prior_a + e_cnt,
                    self.error_prior_b + n_obs_c - e_cnt)
                err_n = (atom_type != obs_idx) & (obs_idx >= 0)
                n_obs_n = jnp.sum(obs_idx >= 0, 0)
                en_cnt = jnp.sum(err_n, 0)
                out["eps_num"] = dists.beta.sample(
                    keys[8], self.error_prior_a + en_cnt,
                    self.error_prior_b + n_obs_n - en_cnt)

            # (B, Sigma) | complete numeric data: matrix-normal /
            # inverse-Wishart conjugate draw
            x_enc = self._encode(true_cat)
            xtx = x_enc.T @ x_enc + 0.1 * jnp.eye(self.enc_dim)
            xty = x_enc.T @ y_z
            b_hat = jnp.linalg.solve(xtx, xty)
            resid_b = y_z - x_enc @ b_hat
            df0 = (self.wishart_df if self.wishart_df is not None
                   else self.d_num + 2.0)
            sigma = dists.inverse_wishart.sample(
                keys[9], df0 + n,
                jnp.eye(self.d_num) + resid_b.T @ resid_b)
            out["sigma"] = sigma
            # B | Sigma: rows ~ MVN; draw via matrix-normal
            xtx_chol = jnp.linalg.cholesky(xtx)
            zmat = jax.random.normal(keys[10],
                                     (self.enc_dim, self.d_num))
            sig_chol = jnp.linalg.cholesky(
                sigma + 1e-8 * jnp.eye(self.d_num))
            b_noise = jax.scipy.linalg.solve_triangular(
                xtx_chol.T, zmat, lower=False) @ sig_chol.T
            out["b_mat"] = b_hat + b_noise
            return out

        return sweep

    # -- read-out ---------------------------------------------------------------
    def imputed_frame(self, state):
        """(numeric [n, d_num], categorical [n, d_cat]) with truths:
        atoms where the truth type is an atom, inverse-copula numeric
        values where the truth is numeric."""
        _, is_num_obs = self._scores()
        atom_type = state["atom_type"]
        num_out = jnp.zeros_like(self.numeric)
        for v in range(self.d_num):
            vals = jnp.where(is_num_obs[:, v], self.numeric[:, v], jnp.nan)
            svals = jnp.sort(vals)  # NaNs to the end
            n_obs = jnp.sum(is_num_obs[:, v])
            u = jax.scipy.stats.norm.cdf(state["y_z"][:, v])
            pos = jnp.clip(u * n_obs, 0.0, n_obs - 1.0)
            lo = jnp.floor(pos).astype(jnp.int32)
            hi = jnp.minimum(lo + 1, (n_obs - 1).astype(jnp.int32))
            frac = pos - lo
            numeric_val = (1 - frac) * svals[lo] + frac * svals[hi]
            t = atom_type[:, v]
            atom_val = self.atoms[v][jnp.clip(t, 0, self.a_max - 1)]
            col = jnp.where(t == self.a_max, numeric_val, atom_val)
            # trusted observed cells pass through exactly (no copula
            # round-trip): observed, numeric truth, and (without error
            # correction) the observation itself is the truth
            trusted = is_num_obs[:, v] & (t == self.a_max)
            col = jnp.where(trusted, self.numeric[:, v], col)
            num_out = num_out.at[:, v].set(col)
        return num_out, state["true_cat"]
