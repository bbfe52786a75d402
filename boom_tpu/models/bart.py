"""BART: Bayesian additive regression trees, fixed-shape TPU form.

Reference: Models/Bart — Bart.hpp (sum-of-trees base), GaussianBartModel,
PosteriorSamplers/BartPosteriorSampler (tree birth/death/swap MH with
conjugate leaf-mean marginalization) + Logit/Probit/Poisson variants.

SURVEY.md §7 flags BART's pointer trees as the worst fixed-shape case;
the TPU design is array-encoded heaps:

  * each of M trees is a complete-binary-tree array of max depth D:
    feature [M, NN], threshold [M, NN], internal [M, NN] (heap index,
    root = 1, children 2j / 2j+1); a node is a LEAF iff its parent is
    internal (or it is the root) and it is not internal itself.
  * evaluation descends exactly D gather steps for every observation in
    parallel (no data-dependent control flow).
  * one Gibbs sweep = for each tree: partial residuals, one grow/prune
    MH move with the leaf means integrated out (the standard BART
    marginal-likelihood ratio, same math as the reference's
    Bart::MhTreeSampler), then conjugate leaf-value draws; then a
    scaled-inv-chisq sigma^2 draw.
  * "choose a random eligible node" is a categorical over the fixed node
    axis with -inf logits on ineligible nodes.

Default hyperparameters follow Chipman-George-McCulloch (1998/2010):
split prior a (1+depth)^-b with a=.95, b=2; leaf sd sigma_mu =
(max(y)-min(y)) / (2 k sqrt(M)) with k=2.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from boom_tpu import dists


def _num_nodes(depth):
    return 1 << (depth + 1)  # heap array size (index 0 unused)


@dataclasses.dataclass(frozen=True)
class BartConfig:
    num_trees: int = 50
    max_depth: int = 4
    split_alpha: float = 0.95
    split_beta: float = 2.0
    k: float = 2.0
    sigma_df: float = 3.0
    sigma_quantile_guess: float = 0.9
    num_cut_candidates: int = 64


def assign_leaves(tree, x):
    """Leaf heap-index for each row of x. tree: dict of per-node arrays
    (feature, threshold, internal); x: [n, p]. Exactly max_depth gather
    steps (vectorized over n)."""
    n = x.shape[0]
    idx = jnp.ones((n,), jnp.int32)

    depth = tree["depth"]
    for _ in range(depth):
        feat = tree["feature"][idx]
        thr = tree["threshold"][idx]
        go_right = x[jnp.arange(n), feat] > thr
        child = 2 * idx + jnp.asarray(go_right, jnp.int32)
        idx = jnp.where(tree["internal"][idx], child, idx)
    return idx


def leaf_mask(internal, depth):
    """Boolean [NN]: node is a current leaf (not internal, parent
    internal or root)."""
    nn = internal.shape[0]
    idx = jnp.arange(nn)
    parent_internal = internal[jnp.maximum(idx // 2, 1)]
    in_range = (idx >= 1) & (idx < nn)
    is_root = idx == 1
    reachable = is_root | parent_internal
    return in_range & reachable & ~internal


def _depth_of(idx):
    """floor(log2(idx)) for heap indices (0 for root=1)."""
    return (jnp.log2(jnp.maximum(idx, 1).astype(jnp.float32))).astype(
        jnp.int32)


@dataclasses.dataclass(frozen=True)
class GaussianBart:
    """y = sum_m g(x; T_m, mu_m) + eps, eps ~ N(0, sigsq) (reference
    GaussianBartModel + BartPosteriorSampler). State: trees (stacked
    arrays), leaf values, sigsq."""

    x: jax.Array  # [n, p]
    y: jax.Array  # [n]
    config: BartConfig = BartConfig()

    @property
    def _nn(self):
        return _num_nodes(self.config.max_depth)

    def _cuts(self):
        """[p, C] candidate cutpoints per feature (data quantiles)."""
        qs = jnp.linspace(0.02, 0.98, self.config.num_cut_candidates)
        return jax.vmap(lambda col: jnp.quantile(col, qs))(self.x.T)

    def _sigma_mu(self):
        spread = jnp.max(self.y) - jnp.min(self.y)
        return spread / (2.0 * self.config.k
                         * jnp.sqrt(float(self.config.num_trees)))

    def _sigma_prior_ss(self):
        # prior guess: sigma such that P(sigma < sd(y)) = q
        return self.config.sigma_df * (0.9 * jnp.std(self.y)) ** 2

    def init_state(self, key):
        m, nn = self.config.num_trees, self._nn
        return {
            "feature": jnp.zeros((m, nn), jnp.int32),
            "threshold": jnp.zeros((m, nn)),
            "internal": jnp.zeros((m, nn), bool),
            "leaf_value": jnp.zeros((m, nn)),
            "sigsq": jnp.var(self.y) * 0.5,
        }

    def predict(self, state, x=None):
        x = self.x if x is None else x
        cfg = self.config

        def one_tree(feature, threshold, internal, leaf_value):
            tree = {"feature": feature, "threshold": threshold,
                    "internal": internal, "depth": cfg.max_depth}
            idx = assign_leaves(tree, x)
            return leaf_value[idx]

        contribs = jax.vmap(one_tree)(
            state["feature"], state["threshold"], state["internal"],
            state["leaf_value"])  # [M, n]
        return jnp.sum(contribs, 0)

    # -- marginal likelihood of a leaf partition ----------------------------
    def _leaf_marginal(self, prec, b):
        """log marginal of the leaf's (weighted) residuals with mu ~
        N(0, sigma_mu^2) integrated out, in precision form: prec =
        sum_i w_i, b = sum_i w_i r_i over the leaf (w_i = 1/variance_i).
        Heteroscedastic weights are what the logit/Poisson latent
        mixtures produce; the Gaussian case is w_i = 1/sigsq. Only the
        data-dependent terms are returned (the quadratic form and the
        log-det piece)."""
        smu2 = self._sigma_mu() ** 2
        return (0.5 * b * b / (prec + 1.0 / smu2)
                - 0.5 * jnp.log1p(smu2 * prec))

    def _split_prior_log(self, depth):
        cfg = self.config
        return jnp.log(cfg.split_alpha) - cfg.split_beta * jnp.log1p(
            jnp.asarray(depth, jnp.result_type(float)))

    def _tree_move(self, key, tree_feature, tree_threshold, tree_internal,
                   resid, w, cuts):
        """One grow-or-prune MH move on a single tree given partial
        residuals with per-observation precisions w (= 1/variance;
        heteroscedastic for the DA families). Returns updated
        (feature, threshold, internal)."""
        cfg = self.config
        nn = self._nn
        x, n = self.x, self.x.shape[0]
        k_move, k_node, k_feat, k_cut, k_acc = jax.random.split(key, 5)

        tree = {"feature": tree_feature, "threshold": tree_threshold,
                "internal": tree_internal, "depth": cfg.max_depth}
        leaf_idx = assign_leaves(tree, x)  # [n]
        n_leaf = jax.ops.segment_sum(jnp.ones((n,)), leaf_idx, nn)
        prec_leaf = jax.ops.segment_sum(w, leaf_idx, nn)
        b_leaf = jax.ops.segment_sum(w * resid, leaf_idx, nn)

        leaves = leaf_mask(tree_internal, cfg.max_depth)
        node_idx = jnp.arange(nn)
        depth = _depth_of(node_idx)
        # grow candidates: leaves above max depth with >= 5 obs
        can_grow = leaves & (depth < cfg.max_depth) & (n_leaf >= 5.0)
        # prune candidates: internal nodes whose children are both leaves
        child_l = jnp.clip(2 * node_idx, 0, nn - 1)
        child_r = jnp.clip(2 * node_idx + 1, 0, nn - 1)
        can_prune = (tree_internal & leaves[child_l] & leaves[child_r])

        n_grow = jnp.sum(can_grow)
        n_prune = jnp.sum(can_prune)
        do_grow = (jax.random.uniform(k_move, ()) < 0.5) | (n_prune == 0)
        do_grow = do_grow & (n_grow > 0)
        do_prune = ~do_grow & (n_prune > 0)

        # --- GROW proposal -------------------------------------------------
        glogits = jnp.where(can_grow, 0.0, -jnp.inf)
        gnode = jax.random.categorical(k_node, glogits)
        gfeat = jax.random.randint(k_feat, (), 0, x.shape[1],
                                   dtype=jnp.int32)
        gcut_i = jax.random.randint(k_cut, (), 0, cfg.num_cut_candidates)
        gthr = cuts[gfeat, gcut_i]
        in_node = leaf_idx == gnode
        right = in_node & (x[:, gfeat] > gthr)
        left = in_node & ~right
        nl, nr = jnp.sum(jnp.where(left, 1.0, 0.0)), jnp.sum(
            jnp.where(right, 1.0, 0.0))
        pl_prec = jnp.sum(jnp.where(left, w, 0.0))
        pr_prec = jnp.sum(jnp.where(right, w, 0.0))
        bl = jnp.sum(jnp.where(left, w * resid, 0.0))
        br = jnp.sum(jnp.where(right, w * resid, 0.0))
        d_g = _depth_of(gnode)
        # MH log ratio: marginal-likelihood change + tree prior + proposal
        ll_grow = (self._leaf_marginal(pl_prec, bl)
                   + self._leaf_marginal(pr_prec, br)
                   - self._leaf_marginal(prec_leaf[gnode], b_leaf[gnode]))
        lp_split = self._split_prior_log(d_g)
        lp_nosplit_children = 2.0 * jnp.log1p(
            -jnp.exp(self._split_prior_log(d_g + 1)))
        prior_grow = (lp_split + lp_nosplit_children
                      - jnp.log1p(-jnp.exp(lp_split)))
        # proposal correction: q(prune)/q(grow); number of prunable nodes
        # after growing = n_prune' (approximate with n_prune + 1, the
        # standard CGM implementation's bookkeeping)
        q_corr = (jnp.log(jnp.maximum(n_grow, 1.0))
                  - jnp.log(jnp.maximum(n_prune + 1.0, 1.0)))
        log_alpha_grow = ll_grow + prior_grow + q_corr
        accept_grow = (jnp.log(jax.random.uniform(k_acc, ()))
                       < log_alpha_grow) & do_grow & (nl >= 1) & (nr >= 1)

        # --- PRUNE proposal ------------------------------------------------
        plogits = jnp.where(can_prune, 0.0, -jnp.inf)
        pnode = jax.random.categorical(k_node, plogits)
        pl, pr = 2 * pnode, 2 * pnode + 1
        d_p = _depth_of(pnode)
        ll_prune = (self._leaf_marginal(
            prec_leaf[pl] + prec_leaf[pr], b_leaf[pl] + b_leaf[pr])
            - self._leaf_marginal(prec_leaf[pl], b_leaf[pl])
            - self._leaf_marginal(prec_leaf[pr], b_leaf[pr]))
        lp_split_p = self._split_prior_log(d_p)
        lp_nosplit_children_p = 2.0 * jnp.log1p(
            -jnp.exp(self._split_prior_log(d_p + 1)))
        prior_prune = (jnp.log1p(-jnp.exp(lp_split_p)) - lp_split_p
                       - lp_nosplit_children_p)
        q_corr_p = (jnp.log(jnp.maximum(n_prune, 1.0))
                    - jnp.log(jnp.maximum(n_grow + 1.0, 1.0)))
        log_alpha_prune = ll_prune + prior_prune + q_corr_p
        accept_prune = (jnp.log(jax.random.uniform(k_acc, ()))
                        < log_alpha_prune) & do_prune

        # --- apply ----------------------------------------------------------
        feature = jnp.where(
            accept_grow, tree_feature.at[gnode].set(gfeat), tree_feature)
        threshold = jnp.where(
            accept_grow, tree_threshold.at[gnode].set(gthr),
            tree_threshold)
        internal = jnp.where(
            accept_grow, tree_internal.at[gnode].set(True), tree_internal)
        internal = jnp.where(
            accept_prune, internal.at[pnode].set(False), internal)
        return feature, threshold, internal

    def _tree_sweep(self, key, state, z, w):
        """Shared sum-of-trees Gibbs pass over pseudo-response z with
        per-observation precisions w: per tree, one grow/prune MH move
        (leaf means marginalized) then conjugate leaf-value draws — the
        engine behind every BART family (reference
        BartPosteriorSamplerBase + per-family subclasses)."""
        cfg = self.config
        nn = self._nn
        cuts = self._cuts()
        m = cfg.num_trees
        keys = jax.random.split(key, m)
        smu2 = self._sigma_mu() ** 2

        def one_tree(carry, inp):
            state_trees, fit_total = carry
            tm, tk = inp
            k_move, k_leaf = jax.random.split(tk)
            feature = state_trees["feature"][tm]
            threshold = state_trees["threshold"][tm]
            internal = state_trees["internal"][tm]
            leaf_value = state_trees["leaf_value"][tm]

            tree = {"feature": feature, "threshold": threshold,
                    "internal": internal, "depth": cfg.max_depth}
            fit_m = leaf_value[assign_leaves(tree, self.x)]
            resid = z - (fit_total - fit_m)

            feature, threshold, internal = self._tree_move(
                k_move, feature, threshold, internal, resid, w, cuts)

            # conjugate leaf draws on the (possibly new) topology
            tree = {"feature": feature, "threshold": threshold,
                    "internal": internal, "depth": cfg.max_depth}
            leaf_idx = assign_leaves(tree, self.x)
            prec_leaf = jax.ops.segment_sum(w, leaf_idx, nn)
            b_leaf = jax.ops.segment_sum(w * resid, leaf_idx, nn)
            post_var = 1.0 / (prec_leaf + 1.0 / smu2)
            post_mean = post_var * b_leaf
            zdraw = jax.random.normal(k_leaf, (nn,), post_mean.dtype)
            new_leaf_value = jnp.where(
                leaf_mask(internal, cfg.max_depth),
                post_mean + jnp.sqrt(post_var) * zdraw, 0.0)

            fit_m_new = new_leaf_value[leaf_idx]
            state_trees = {
                "feature": state_trees["feature"].at[tm].set(feature),
                "threshold": state_trees["threshold"].at[tm].set(
                    threshold),
                "internal": state_trees["internal"].at[tm].set(internal),
                "leaf_value": state_trees["leaf_value"].at[tm].set(
                    new_leaf_value),
            }
            return (state_trees, fit_total - fit_m + fit_m_new), None

        trees = {k: state[k] for k in
                 ("feature", "threshold", "internal", "leaf_value")}
        fit_total = self.predict(state)
        (trees, fit_total), _ = jax.lax.scan(
            one_tree, (trees, fit_total), (jnp.arange(m), keys))
        return trees, fit_total

    def kernel(self):
        cfg = self.config
        n = self.x.shape[0]

        def sweep(key, state):
            k_trees, k_sig = jax.random.split(key)
            w = jnp.full((n,), 1.0 / state["sigsq"])
            trees, fit_total = self._tree_sweep(k_trees, state, self.y, w)
            resid = self.y - fit_total
            df = cfg.sigma_df + n
            ss = self._sigma_prior_ss() + jnp.sum(resid * resid)
            sigsq = dists.scaled_inv_chisq.sample(k_sig, df, ss / df)
            return {**trees, "sigsq": sigsq}

        return sweep

    @staticmethod
    def simulate_friedman(key, n, p=10, sd=1.0):
        """The Friedman (1991) benchmark surface used throughout the BART
        literature (and the reference's Bart tests)."""
        kx, ke = jax.random.split(key)
        x = jax.random.uniform(kx, (n, p))
        f = (10.0 * jnp.sin(jnp.pi * x[:, 0] * x[:, 1])
             + 20.0 * (x[:, 2] - 0.5) ** 2
             + 10.0 * x[:, 3] + 5.0 * x[:, 4])
        y = f + sd * jax.random.normal(ke, (n,))
        return x, y, f


@dataclasses.dataclass(frozen=True)
class LogitBart:
    """Binary BART: y_i in {0,1}, P(y=1) = logistic(G(x_i)) with G the
    sum of trees (reference Models/Bart/LogitBartModel.hpp:31 +
    LogitBartPosteriorSampler). The data augmentation is the same
    finite normal-mixture approximation to the logistic the GLM
    composites use (NOT Polya-Gamma, matching the reference's
    NormalMixtureApproximation): impute truncated-logistic utilities and
    mixture components, then run the weighted Gaussian tree engine on the
    latent utilities with per-observation mixture variances."""

    x: jax.Array  # [n, p]
    y: jax.Array  # [n] in {0, 1}
    config: BartConfig = BartConfig()

    _nn = GaussianBart._nn
    _cuts = GaussianBart._cuts
    _split_prior_log = GaussianBart._split_prior_log
    _leaf_marginal = GaussianBart._leaf_marginal
    _tree_move = GaussianBart._tree_move
    _tree_sweep = GaussianBart._tree_sweep
    predict = GaussianBart.predict

    def _sigma_mu(self):
        # latent-logistic scale: G(x) in +-3 covers probabilities
        # 0.05..0.95 (the CGM binary-BART convention, k = config.k)
        return 3.0 / (self.config.k
                      * jnp.sqrt(float(self.config.num_trees)))

    def init_state(self, key):
        m, nn = self.config.num_trees, self._nn
        return {
            "feature": jnp.zeros((m, nn), jnp.int32),
            "threshold": jnp.zeros((m, nn)),
            "internal": jnp.zeros((m, nn), bool),
            "leaf_value": jnp.zeros((m, nn)),
        }

    def kernel(self):
        from boom_tpu.models.glm import _mixture_tables as tables
        from boom_tpu.models.glm.logit import impute_logit_latent
        from boom_tpu.models.glm.ssvs import sample_mixture_indicator

        s_tab = jnp.asarray(tables.LOGISTIC_SDS)
        w_tab = jnp.asarray(tables.LOGISTIC_WEIGHTS)

        def sweep(key, state):
            k_z, k_c, k_trees = jax.random.split(key, 3)
            eta = self.predict(state)
            z = impute_logit_latent(k_z, eta, self.y)
            comp = sample_mixture_indicator(
                k_c, z - eta, w_tab, jnp.zeros_like(s_tab), s_tab)
            w = 1.0 / s_tab[comp] ** 2
            trees, _ = self._tree_sweep(k_trees, state, z, w)
            return trees

        return sweep

    def predict_prob(self, state, x=None):
        return jax.nn.sigmoid(self.predict(state, x))


@dataclasses.dataclass(frozen=True)
class ProbitBart:
    """Binary BART with a probit link via Albert-Chib truncated-normal
    augmentation (reference Models/Bart/ProbitBartModel.hpp +
    BinomialProbitDataImputer)."""

    x: jax.Array
    y: jax.Array  # [n] in {0, 1}
    config: BartConfig = BartConfig()

    _nn = GaussianBart._nn
    _cuts = GaussianBart._cuts
    _split_prior_log = GaussianBart._split_prior_log
    _leaf_marginal = GaussianBart._leaf_marginal
    _tree_move = GaussianBart._tree_move
    _tree_sweep = GaussianBart._tree_sweep
    predict = GaussianBart.predict
    init_state = LogitBart.init_state

    def _sigma_mu(self):
        return 3.0 / (self.config.k
                      * jnp.sqrt(float(self.config.num_trees)))

    def kernel(self):
        from boom_tpu.models.glm.probit import impute_probit_latent

        n = self.x.shape[0]

        def sweep(key, state):
            k_z, k_trees = jax.random.split(key)
            eta = self.predict(state)
            z = impute_probit_latent(k_z, eta, self.y)
            trees, _ = self._tree_sweep(k_trees, state, z,
                                        jnp.ones((n,), z.dtype))
            return trees

        return sweep

    def predict_prob(self, state, x=None):
        return jax.scipy.stats.norm.cdf(self.predict(state, x))


@dataclasses.dataclass(frozen=True)
class PoissonBart:
    """Count BART: y_i ~ Poisson(exposure_i * exp(G(x_i))) (reference
    Models/Bart/PoissonBartModel.hpp + PoissonBartPosteriorSampler).
    Augmentation follows the GLM Poisson composite: inter-arrival /
    truncated-Gumbel latents against the EM-fitted mixture tables,
    collapsed to one pseudo-observation per row by precision weighting,
    then the weighted Gaussian tree engine on the log-rate scale."""

    x: jax.Array
    y: jax.Array  # [n] counts
    exposure: jax.Array | None = None
    config: BartConfig = BartConfig()

    _nn = GaussianBart._nn
    _cuts = GaussianBart._cuts
    _split_prior_log = GaussianBart._split_prior_log
    _leaf_marginal = GaussianBart._leaf_marginal
    _tree_move = GaussianBart._tree_move
    _tree_sweep = GaussianBart._tree_sweep
    predict = GaussianBart.predict
    init_state = LogitBart.init_state

    @property
    def _log_exposure(self):
        if self.exposure is None:
            return jnp.zeros(self.y.shape, jnp.result_type(float))
        return jnp.log(jnp.asarray(self.exposure))

    def _sigma_mu(self):
        # log-rate scale spread from the observed counts
        ylog = jnp.log1p(jnp.asarray(self.y, jnp.result_type(float)))
        spread = jnp.maximum(jnp.max(ylog) - jnp.min(ylog), 1.0)
        return spread / (2.0 * self.config.k
                         * jnp.sqrt(float(self.config.num_trees)))

    def kernel(self):
        from boom_tpu.models.glm import _mixture_tables as tables
        from boom_tpu.models.glm.poisson import (
            _neg_log_gamma_table,
            impute_poisson_latent,
        )
        from boom_tpu.models.glm.ssvs import sample_mixture_indicator

        gw = jnp.asarray(tables.GUMBEL_WEIGHTS)
        gm = jnp.asarray(tables.GUMBEL_MEANS)
        gs = jnp.asarray(tables.GUMBEL_SDS)
        w_tab, m_tab, s_tab = _neg_log_gamma_table(self.y)

        def sweep(key, state):
            k_z, k1, k2, k_trees = jax.random.split(key, 4)
            eta = self.predict(state)
            log_lam = eta + self._log_exposure
            nlt1, nlt2 = impute_poisson_latent(k_z, log_lam, self.y)
            c1 = sample_mixture_indicator(k1, nlt1 - log_lam, gw, gm, gs)
            z1 = nlt1 - self._log_exposure - gm[c1]
            v1 = gs[c1] ** 2
            r2 = (nlt2 - log_lam)[..., None]
            lp = (jnp.log(jnp.maximum(w_tab, 1e-300)) - jnp.log(s_tab)
                  - 0.5 * ((r2 - m_tab) / s_tab) ** 2)
            c2 = jax.random.categorical(k2, lp, axis=-1)
            m2 = jnp.take_along_axis(m_tab, c2[..., None], -1)[..., 0]
            s2 = jnp.take_along_axis(s_tab, c2[..., None], -1)[..., 0]
            z2 = nlt2 - self._log_exposure - m2
            prec = 1.0 / v1 + jnp.where(self.y > 0, 1.0 / s2**2, 0.0)
            num = z1 / v1 + jnp.where(self.y > 0, z2 / s2**2, 0.0)
            trees, _ = self._tree_sweep(k_trees, state, num / prec, prec)
            return trees

        return sweep

    def predict_rate(self, state, x=None):
        return jnp.exp(self.predict(state, x))
