"""Dirichlet-process mixtures via truncated stick-breaking (blocked Gibbs).

Reference: Models/Mixtures/DirichletProcessMixture.hpp:79
(DirichletProcessMixtureModel), DirichletProcessMvnModel (:34), with
samplers DirichletProcessCollapsedGibbsSampler / DirichletProcessSliceSampler
/ SplitMerge. The reference's samplers grow/shrink the component list
dynamically — impossible under fixed shapes — so the TPU-native design is
the Ishwaran-James (2001) blocked Gibbs on a truncation of the
stick-breaking representation (SURVEY.md §7 phase 6: "fixed max-cluster
truncation ... to stay fixed-shape"):

    v_k ~ Beta(1, alpha), w_k = v_k prod_{j<k}(1 - v_j), k < K_max
    z_i ~ Categorical(w),  y_i | z_i ~ component(theta_{z_i})

Every update is a fixed-shape batched op: indicators are one categorical
over K_max, sticks are K_max Beta draws from suffstat tail sums, component
params are conjugate draws batched over K_max, and the concentration
alpha gets its conjugate Gamma update given the sticks (Escobar-West
style). Truncation error decays geometrically in K_max.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from boom_tpu import dists
from boom_tpu.models.conjugate import (
    GaussianSuf,
    MvnSuf,
    gaussian_mean_var_draw,
    mvn_mean_draw,
    mvn_precision_draw,
)


def stick_breaking_weights(v):
    """[..., K] stick lengths -> mixture weights (last stick absorbs the
    remainder so weights sum to one at the truncation). Dtype-aware
    clipping: naive 1 - 1e-12 rounds to exactly 1 in float32 and produces
    log1p(-1) = -inf -> NaN weights."""
    eps = jnp.finfo(v.dtype).eps
    v = jnp.clip(v, jnp.finfo(v.dtype).tiny, 1.0 - eps)
    log1mv = jnp.log1p(-v)
    prior_cum = jnp.cumsum(log1mv, axis=-1) - log1mv  # sum_{j<k}
    logw = jnp.log(v) + prior_cum
    # last weight = remainder prod_{j<K-1}(1 - v_j)
    logw = logw.at[..., -1].set(prior_cum[..., -1])
    return jnp.exp(logw)


def draw_sticks(key, counts, alpha):
    """v_k | z ~ Beta(1 + n_k, alpha + sum_{j>k} n_j), batched over K."""
    tail = jnp.cumsum(counts[..., ::-1], -1)[..., ::-1] - counts
    return dists.beta.sample(key, 1.0 + counts, alpha + tail)


def draw_concentration(key, v, prior_shape=1.0, prior_rate=1.0):
    """alpha | v ~ Gamma(a + K - 1, b - sum_{k<K-1} log(1 - v_k))
    (conjugate under the stick-breaking Beta(1, alpha) likelihood)."""
    k = v.shape[-1]
    eps = jnp.finfo(v.dtype).eps
    s = jnp.sum(jnp.log1p(-jnp.clip(v[..., :-1], 0.0, 1.0 - eps)), -1)
    return dists.gamma.sample(key, prior_shape + k - 1.0,
                              prior_rate - s)


@dataclasses.dataclass(frozen=True)
class DpGaussianMixture:
    """DP mixture of univariate Gaussians with NIX component priors
    (reference DirichletProcessMixtureModel with Gaussian components)."""

    y: jax.Array  # [n]
    max_components: int = 20
    alpha_shape: float = 1.0  # Gamma prior on concentration
    alpha_rate: float = 1.0
    mean_guess: float = 0.0
    mean_nobs: float = 0.01
    sigma_df: float = 1.0
    sigma_guess: float = 1.0

    def init_state(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        k = self.max_components
        qs = jax.random.uniform(k1, (k,), self.y.dtype, 0.02, 0.98)
        mu = jnp.quantile(self.y, qs)
        sigsq = jnp.full((k,), jnp.var(self.y))
        alpha = jnp.asarray(1.0, self.y.dtype)
        v = dists.beta.sample(k2, jnp.ones(k), alpha * jnp.ones(k))
        return {"mu": mu, "sigsq": sigsq, "v": v, "alpha": alpha}

    def kernel(self):
        k_max = self.max_components

        def sweep(key, state):
            kz, kv, ka, kc = jax.random.split(key, 4)
            w = stick_breaking_weights(state["v"])
            logits = (dists.normal.logpdf(
                self.y[:, None], state["mu"][None, :],
                jnp.sqrt(state["sigsq"])[None, :])
                + jnp.log(jnp.clip(w, 1e-300, None))[None, :])
            z = jax.random.categorical(kz, logits, axis=-1)
            onehot = jax.nn.one_hot(z, k_max, dtype=self.y.dtype)
            counts = onehot.sum(0)
            suf = GaussianSuf(n=counts, sum=onehot.T @ self.y,
                              sumsq=onehot.T @ (self.y * self.y))
            mu, sigsq = gaussian_mean_var_draw(
                kc, suf, self.mean_guess, self.mean_nobs,
                self.sigma_df, self.sigma_guess**2)
            v = draw_sticks(kv, counts, state["alpha"])
            alpha = draw_concentration(ka, v, self.alpha_shape,
                                       self.alpha_rate)
            return {"mu": mu, "sigsq": sigsq, "v": v, "alpha": alpha}

        return sweep

    def occupied_components(self, state, threshold=0):
        """Number of clusters with > threshold members at the current
        indicator imputation (an analysis helper)."""
        w = stick_breaking_weights(state["v"])
        logits = (dists.normal.logpdf(
            self.y[:, None], state["mu"][None, :],
            jnp.sqrt(state["sigsq"])[None, :])
            + jnp.log(jnp.clip(w, 1e-300, None))[None, :])
        z = jnp.argmax(logits, -1)
        counts = jnp.bincount(z, length=self.max_components)
        return jnp.sum(counts > threshold)


@dataclasses.dataclass(frozen=True)
class DpMvnMixture:
    """DP mixture of multivariate Gaussians (reference
    DirichletProcessMvnModel, DirichletProcessMixture.hpp:34) with
    Normal/Wishart component priors; blocked Gibbs as above, component
    draws batched over K_max via vmap."""

    y: jax.Array  # [n, d]
    max_components: int = 20
    alpha_shape: float = 1.0
    alpha_rate: float = 1.0
    # prior weight on the component-mean prior N(data_mean, data_cov /
    # mean_nobs): ~1 keeps empty-component birth proposals on data scale
    # (a too-diffuse prior makes cluster birth nearly impossible — the
    # same tuning BOOM's DirichletProcessMvnModel docs warn about)
    mean_nobs: float = 1.0
    wishart_df: float | None = None  # default d + 2

    @property
    def dim(self):
        return self.y.shape[1]

    def init_state(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        k, d = self.max_components, self.dim
        idx = jax.random.choice(k1, self.y.shape[0], (k,), replace=False)
        mu = self.y[idx]
        # start components tighter than the marginal data covariance
        # (roughly 1/k of the volume each) so the indicator draw can
        # separate clusters instead of one broad component absorbing all
        scale = float(k) ** (2.0 / d)
        siginv = jnp.broadcast_to(
            scale * jnp.linalg.inv(jnp.cov(self.y.T) + 1e-6 * jnp.eye(d)),
            (k, d, d))
        alpha = jnp.asarray(1.0, self.y.dtype)
        v = dists.beta.sample(k2, jnp.ones(k), alpha * jnp.ones(k))
        return {"mu": mu, "siginv": siginv, "v": v, "alpha": alpha}

    def kernel(self):
        k_max, d = self.max_components, self.dim
        df = self.wishart_df or (d + 2.0)
        data_mean = jnp.mean(self.y, 0)
        data_cov = jnp.cov(self.y.T) + 1e-6 * jnp.eye(d)
        prior_scatter = data_cov * df

        def sweep(key, state):
            kz, kv, ka, km, kp = jax.random.split(key, 5)
            w = stick_breaking_weights(state["v"])
            logp = jax.vmap(
                lambda m, si: dists.mvn.logpdf_prec(self.y, m, si),
                out_axes=1)(state["mu"], state["siginv"])  # [n, K]
            logits = logp + jnp.log(jnp.clip(w, 1e-300, None))[None, :]
            z = jax.random.categorical(kz, logits, axis=-1)
            onehot = jax.nn.one_hot(z, k_max, dtype=self.y.dtype)
            counts = onehot.sum(0)  # [K]
            sums = onehot.T @ self.y  # [K, d]
            sumsq = jnp.einsum("nk,ni,nj->kij", onehot, self.y, self.y)
            suf = MvnSuf(n=counts, sum=sums, sumsq=sumsq)
            mu = jax.vmap(
                lambda k_, s, si: mvn_mean_draw(
                    k_, s, si, data_mean,
                    self.mean_nobs * jnp.linalg.inv(data_cov)))(
                jax.random.split(km, k_max), suf, state["siginv"])
            siginv = jax.vmap(
                lambda k_, s, m: mvn_precision_draw(
                    k_, s, m, df, prior_scatter))(
                jax.random.split(kp, k_max), suf, mu)
            v = draw_sticks(kv, counts, state["alpha"])
            alpha = draw_concentration(ka, v, self.alpha_shape,
                                       self.alpha_rate)
            return {"mu": mu, "siginv": siginv, "v": v, "alpha": alpha}

        return sweep


# ---------------------------------------------------------------------------
# Collapsed (CRP) Gibbs + split-merge — reference
# DirichletProcessMvnCollapsedGibbsSampler.hpp:35, SplitMerge.hpp
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class DpMvnCollapsed:
    """DP mixture of MVNs with the component parameters INTEGRATED OUT
    under a conjugate Normal-inverse-Wishart base measure: per-
    observation CRP Gibbs over cluster labels via posterior-predictive
    multivariate-t densities, plus optional Jain-Neal random split-merge
    moves to hop between cluster configurations that one-at-a-time
    Gibbs crosses slowly (reference
    DirichletProcessMvnCollapsedGibbsSampler + SplitMerge.hpp).

    TPU form: fixed K_max label slots; the per-observation sweep is a
    lax.scan carrying cluster sufficient statistics with rank-1
    updates; the predictive densities over slots vmap. State is only
    the label vector (everything else is collapsed).
    """

    y: jax.Array  # [n, d]
    max_components: int = 20
    alpha: float = 1.0
    kappa0: float = 1.0
    nu0: float | None = None  # default d + 2
    split_merge_moves: int = 1

    @property
    def dim(self):
        return self.y.shape[1]

    @property
    def _nu0(self):
        return self.nu0 if self.nu0 is not None else self.dim + 2.0

    @property
    def _yc(self):
        """Internally the data are CENTERED at the global mean: the CRP
        clustering is translation-covariant, and centering avoids the
        f32 catastrophic cancellation in scatter - n ybar ybar' that
        otherwise merges well-separated clusters at TPU precision."""
        return self.y - jnp.mean(self.y, 0)

    def _psi0(self):
        return jnp.cov(self.y.T).reshape(self.dim, self.dim) + 1e-6 * \
            jnp.eye(self.dim)

    def _mu0(self):
        return jnp.zeros((self.dim,), self.y.dtype)

    def init_state(self, key):
        # start from a handful of random clusters
        z = jax.random.randint(key, (self.y.shape[0],), 0,
                               min(4, self.max_components))
        return {"z": z}

    # -- NIW predictive / marginal machinery --------------------------------
    def _posterior_niw(self, count, total, scatter):
        """NIW posterior hyperparameters given cluster sufstats."""
        d = self.dim
        mu0, k0, nu0 = self._mu0(), self.kappa0, self._nu0
        kn = k0 + count
        mun = (k0 * mu0 + total) / kn
        ybar = total / jnp.maximum(count, 1e-12)
        dev = ybar - mu0
        s_cluster = scatter - jnp.outer(total, total) / jnp.maximum(
            count, 1e-12)
        s_cluster = jnp.where(count > 0.5, s_cluster, jnp.zeros((d, d)))
        psin = (self._psi0() + s_cluster
                + jnp.where(count > 0.5,
                            (k0 * count / kn) * jnp.outer(dev, dev),
                            jnp.zeros((d, d))))
        nun = nu0 + count
        return mun, kn, nun, psin

    def _log_predictive(self, y_i, count, total, scatter):
        """log p(y_i | cluster members) — multivariate-t (Murphy 2007
        conjugate NIW predictive)."""
        d = self.dim
        mun, kn, nun, psin = self._posterior_niw(count, total, scatter)
        df = nun - d + 1.0
        scale = psin * (kn + 1.0) / (kn * df)
        chol = jnp.linalg.cholesky(scale + 1e-10 * jnp.eye(d))
        sol = jax.scipy.linalg.solve_triangular(chol, y_i - mun,
                                                lower=True)
        maha = jnp.sum(sol * sol)
        logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol)))
        return (jax.scipy.special.gammaln(0.5 * (df + d))
                - jax.scipy.special.gammaln(0.5 * df)
                - 0.5 * d * jnp.log(df * jnp.pi) - 0.5 * logdet
                - 0.5 * (df + d) * jnp.log1p(maha / df))

    def _log_marginal(self, count, total, scatter):
        """log marginal likelihood of a cluster's members under the NIW
        base (used by split-merge MH ratios)."""
        d = self.dim
        _, kn, nun, psin = self._posterior_niw(count, total, scatter)
        k0, nu0 = self.kappa0, self._nu0
        psi0 = self._psi0()

        def lmg(nu):
            i = jnp.arange(d)
            return jnp.sum(jax.scipy.special.gammaln(
                0.5 * (nu - i)))

        s0, ld0 = jnp.linalg.slogdet(psi0)
        sn, ldn = jnp.linalg.slogdet(psin)
        return (-0.5 * count * d * jnp.log(jnp.pi)
                + lmg(nun) - lmg(nu0)
                + 0.5 * nu0 * ld0 - 0.5 * nun * ldn
                + 0.5 * d * (jnp.log(k0) - jnp.log(kn)))

    def _sufstats(self, z):
        k = self.max_components
        yc = self._yc
        onehot = jax.nn.one_hot(z, k, dtype=yc.dtype)
        counts = onehot.sum(0)
        totals = onehot.T @ yc
        scatters = jnp.einsum("nk,ni,nj->kij", onehot, yc, yc)
        return counts, totals, scatters

    # -- kernel ---------------------------------------------------------------
    def kernel(self):
        n, k, d = self.y.shape[0], self.max_components, self.dim

        def gibbs_pass(key, z):
            counts, totals, scatters = self._sufstats(z)

            def one_obs(carry, inp):
                counts, totals, scatters, z = carry
                i, ki = inp
                y_i = self._yc[i]
                zi = z[i]
                # remove observation i
                counts = counts.at[zi].add(-1.0)
                totals = totals.at[zi].add(-y_i)
                scatters = scatters.at[zi].add(-jnp.outer(y_i, y_i))
                lp = jax.vmap(lambda c, t, s: self._log_predictive(
                    y_i, c, t, s))(counts, totals, scatters)
                occupied = counts > 0.5
                # CRP: existing ∝ n_k * pred_k; the FIRST empty slot
                # stands in for "new cluster" with weight alpha * pred_0
                first_empty = jnp.argmax(~occupied)
                has_empty = jnp.any(~occupied)
                slot_new = jnp.where(has_empty, first_empty, -1)
                w = jnp.where(occupied,
                              jnp.log(jnp.maximum(counts, 1e-12)),
                              -jnp.inf)
                w = jnp.where(
                    (jnp.arange(k) == slot_new) & has_empty,
                    jnp.log(self.alpha), w)
                zi_new = jax.random.categorical(ki, w + lp)
                counts = counts.at[zi_new].add(1.0)
                totals = totals.at[zi_new].add(y_i)
                scatters = scatters.at[zi_new].add(jnp.outer(y_i, y_i))
                z = z.at[i].set(zi_new)
                return (counts, totals, scatters, z), None

            keys = jax.random.split(key, n)
            (_, _, _, z), _ = jax.lax.scan(
                one_obs, (counts, totals, scatters, z),
                (jnp.arange(n), keys))
            return z

        def split_merge(key, z):
            """One Jain-Neal split-merge MH move with SEQUENTIAL-
            ALLOCATION proposals (Jain & Neal 2004; reference
            SplitMerge.hpp): each non-anchor member is allocated to one
            of the two anchor-seeded clusters with probability
            proportional to count x conjugate predictive, accumulating
            the proposal density q. A naive random split is rejected
            with probability ~1 once clusters hold tens of points;
            sequential allocation keeps acceptance usable, which is
            what lets the sampler escape merged modes."""
            k1, k2, k3, k4 = jax.random.split(key, 4)
            yc = self._yc
            i = jax.random.randint(k1, (), 0, n)
            j_raw = jax.random.randint(k2, (), 0, n - 1)
            j = jnp.where(j_raw >= i, j_raw + 1, j_raw)
            zi, zj = z[i], z[j]
            same = zi == zj
            counts, totals, scatters = self._sufstats(z)
            idx_n = jnp.arange(n)
            in_set = (z == zi) | (z == zj)
            scan_mask = in_set & (idx_n != i) & (idx_n != j)
            # merge case: the reverse split must reproduce the CURRENT
            # A/B membership, so those choices are forced
            forced_a = z == zi

            def seed(anchor):
                y_a = yc[anchor]
                return (jnp.ones((), yc.dtype), y_a,
                        jnp.outer(y_a, y_a))

            def alloc(carry, inp):
                ca, ta, sa, cb, tb, sb, logq, assign_a = carry
                m, km = inp
                y_m = yc[m]
                lp_a = (jnp.log(ca)
                        + self._log_predictive(y_m, ca, ta, sa))
                lp_b = (jnp.log(cb)
                        + self._log_predictive(y_m, cb, tb, sb))
                lse = jnp.logaddexp(lp_a, lp_b)
                pick_a = jnp.where(
                    same,
                    jnp.log(jax.random.uniform(km, (), yc.dtype))
                    < (lp_a - lse),
                    forced_a[m])
                logq_m = jnp.where(pick_a, lp_a - lse, lp_b - lse)
                active = scan_mask[m]
                logq = logq + jnp.where(active, logq_m, 0.0)
                upd = jnp.where(active & pick_a, 1.0, 0.0)
                ca = ca + upd
                ta = ta + upd * y_m
                sa = sa + upd * jnp.outer(y_m, y_m)
                updb = jnp.where(active & ~pick_a, 1.0, 0.0)
                cb = cb + updb
                tb = tb + updb * y_m
                sb = sb + updb * jnp.outer(y_m, y_m)
                assign_a = assign_a.at[m].set(active & pick_a)
                return (ca, ta, sa, cb, tb, sb, logq, assign_a), None

            carry0 = seed(i) + seed(j) + (
                jnp.zeros((), yc.dtype), jnp.zeros((n,), bool))
            (ca, ta, sa, cb, tb, sb, logq, assign_a), _ = jax.lax.scan(
                alloc, carry0, (idx_n, jax.random.split(k3, n)))
            assign_a = assign_a.at[i].set(True)

            occupied = counts > 0.5
            has_empty = jnp.any(~occupied)
            new_slot = jnp.argmax(~occupied)
            lg = jax.scipy.special.gammaln

            # ---------- SPLIT (same cluster): A -> new slot ------------
            cnt_all = counts[zi]
            log_ratio_split = (
                jnp.log(self.alpha) + lg(ca) + lg(cb) - lg(cnt_all)
                + self._log_marginal(ca, ta, sa)
                + self._log_marginal(cb, tb, sb)
                - self._log_marginal(cnt_all, totals[zi], scatters[zi])
                - logq)
            z_split = jnp.where(assign_a & in_set, new_slot, z)
            ok_split = same & has_empty

            # ---------- MERGE (different clusters) ----------------------
            cnt_ab = counts[zi] + counts[zj]
            log_ratio_merge = (
                -jnp.log(self.alpha) + lg(cnt_ab)
                - lg(counts[zi]) - lg(counts[zj])
                + self._log_marginal(cnt_ab, totals[zi] + totals[zj],
                                     scatters[zi] + scatters[zj])
                - self._log_marginal(counts[zi], totals[zi],
                                     scatters[zi])
                - self._log_marginal(counts[zj], totals[zj],
                                     scatters[zj])
                + logq)  # q of the reverse (forced) split
            z_merge = jnp.where(z == zi, zj, z)

            log_ratio = jnp.where(same, log_ratio_split, log_ratio_merge)
            valid = jnp.where(same, ok_split, True)
            z_prop = jnp.where(same, z_split, z_merge)
            accept = valid & (jnp.log(jax.random.uniform(k4, ()))
                              < log_ratio)
            return jnp.where(accept, z_prop, z)

        def sweep(key, state):
            kg, ks = jax.random.split(key)
            z = gibbs_pass(kg, state["z"])
            for r in range(self.split_merge_moves):
                z = split_merge(jax.random.fold_in(ks, r), z)
            return {"z": z}

        return sweep

    def num_clusters(self, state):
        counts, _, _ = self._sufstats(state["z"])
        return jnp.sum(counts > 0.5)

    def cluster_means(self, state):
        """Posterior-mean cluster centers for occupied slots (on the
        original data scale)."""
        counts, totals, _ = self._sufstats(state["z"])
        centers = (totals / jnp.maximum(counts, 1e-12)[:, None]
                   + jnp.mean(self.y, 0)[None, :])
        return centers, counts
