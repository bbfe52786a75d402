"""Item response theory: 2PL binary items and the partial credit model.

Reference: Models/IRT — IrtModel.hpp, Subject/Item classes,
PartialCreditModel.hpp, with DAFE/RWM/slice subject+item samplers in
Models/IRT/PosteriorSamplers.

TPU form: all subjects' abilities update in ONE vectorized slice pass
(independent conditionals given items), all items' parameters likewise
given abilities; the [N, J] response-probability matrices are single
batched ops. Missing responses are a mask.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from boom_tpu import dists
from boom_tpu.inference.kernels.slice import slice_step


@dataclasses.dataclass(frozen=True)
class TwoPl:
    """2PL: P(y_ij = 1) = sigmoid(a_j (theta_i - b_j)); theta ~ N(0,1),
    log a ~ N(0, .5^2), b ~ N(0, 2^2). State: theta [N], log_a [J],
    b [J]."""

    responses: jax.Array  # [N, J] in {0, 1}
    observed: jax.Array | None = None  # [N, J] bool

    @property
    def _obs(self):
        if self.observed is None:
            return jnp.ones(self.responses.shape, bool)
        return self.observed

    def init_state(self, key):
        n, j = self.responses.shape
        k1 = key
        score = jnp.sum(jnp.where(self._obs, self.responses, 0.0), 1)
        nn = jnp.maximum(jnp.sum(self._obs, 1), 1.0)
        theta0 = jax.scipy.special.logit(
            jnp.clip(score / nn, 0.05, 0.95)) * 0.5
        return {"theta": theta0, "log_a": jnp.zeros((j,)),
                "b": jnp.zeros((j,))}

    def _loglik_matrix(self, theta, log_a, b):
        eta = jnp.exp(log_a)[None, :] * (theta[:, None] - b[None, :])
        ll = (self.responses * jax.nn.log_sigmoid(eta)
              + (1.0 - self.responses) * jax.nn.log_sigmoid(-eta))
        return jnp.where(self._obs, ll, 0.0)

    def kernel(self):
        def sweep(key, state):
            kt, ka, kb = jax.random.split(key, 3)

            def theta_target(th):
                ll = self._loglik_matrix(th, state["log_a"], state["b"])
                return jnp.sum(ll, 1) - 0.5 * th * th

            theta = slice_step(kt, state["theta"], theta_target,
                               width=1.0)

            def a_target(la):
                ll = self._loglik_matrix(theta, la, state["b"])
                return jnp.sum(ll, 0) - 0.5 * (la / 0.5) ** 2

            log_a = slice_step(ka, state["log_a"], a_target, width=0.5)

            def b_target(bb):
                ll = self._loglik_matrix(theta, log_a, bb)
                return jnp.sum(ll, 0) - 0.5 * (bb / 2.0) ** 2

            b = slice_step(kb, state["b"], b_target, width=1.0)
            return {"theta": theta, "log_a": log_a, "b": b}

        return sweep

    @staticmethod
    def simulate(key, n, j, a_spread=0.4):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        theta = jax.random.normal(k1, (n,))
        a = jnp.exp(a_spread * jax.random.normal(k2, (j,)))
        b = 1.5 * jax.random.normal(k3, (j,))
        p = jax.nn.sigmoid(a[None, :] * (theta[:, None] - b[None, :]))
        y = jnp.asarray(jax.random.uniform(k4, (n, j)) < p, jnp.float64)
        return y, theta, a, b


@dataclasses.dataclass(frozen=True)
class PartialCredit:
    """Partial credit model for ordered categories 0..M-1 (reference
    PartialCreditModel.hpp): P(y_ij = m) prop exp(sum_{l<=m}
    (theta_i - delta_jl)) with delta_j0 = 0. State: theta [N],
    delta [J, M-1]."""

    responses: jax.Array  # [N, J] ints in [0, M)
    num_categories: int

    def init_state(self, key):
        n, j = self.responses.shape
        m = self.num_categories
        score = jnp.mean(jnp.asarray(self.responses,
                                     jnp.result_type(float)), 1)
        theta0 = (score - jnp.mean(score)) / (jnp.std(score) + 1e-6)
        return {"theta": theta0, "delta": jnp.zeros((j, m - 1))}

    def _category_logits(self, theta, delta):
        """[N, J, M] unnormalized log probabilities."""
        m = self.num_categories
        # cum_m = sum_{l<=m} (theta - delta_l); category 0 -> 0
        steps = theta[:, None, None] - delta[None, :, :]  # [N, J, M-1]
        cum = jnp.cumsum(steps, axis=-1)
        zeros = jnp.zeros(cum.shape[:-1] + (1,), cum.dtype)
        return jnp.concatenate([zeros, cum], axis=-1)

    def loglik(self, theta, delta):
        logits = self._category_logits(theta, delta)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return jnp.take_along_axis(
            logp, self.responses[:, :, None], -1)[..., 0]

    def kernel(self):
        j_items = self.responses.shape[1]
        m = self.num_categories

        def sweep(key, state):
            kt, kd = jax.random.split(key)

            def theta_target(th):
                return (jnp.sum(self.loglik(th, state["delta"]), 1)
                        - 0.5 * th * th)

            theta = slice_step(kt, state["theta"], theta_target,
                               width=1.0)

            # update delta one category-step at a time (vectorized over
            # items; steps within an item are correlated so scan them)
            def step_one(delta, inp):
                l_idx, k = inp

                def d_target(dl):
                    d_all = jax.lax.dynamic_update_index_in_dim(
                        delta, dl, l_idx, axis=1)
                    return (jnp.sum(self.loglik(theta, d_all), 0)
                            - 0.5 * (dl / 2.0) ** 2)

                dl_new = slice_step(k, delta[:, l_idx], d_target,
                                    width=1.0)
                return jax.lax.dynamic_update_index_in_dim(
                    delta, dl_new, l_idx, axis=1), None

            delta, _ = jax.lax.scan(
                step_one, state["delta"],
                (jnp.arange(m - 1), jax.random.split(kd, m - 1)))
            return {"theta": theta, "delta": delta}

        return sweep

    @staticmethod
    def simulate(key, n, j, m):
        k1, k2, k3 = jax.random.split(key, 3)
        theta = jax.random.normal(k1, (n,))
        delta = jnp.sort(1.2 * jax.random.normal(k2, (j, m - 1)), axis=1)
        steps = theta[:, None, None] - delta[None, :, :]
        cum = jnp.cumsum(steps, axis=-1)
        zeros = jnp.zeros(cum.shape[:-1] + (1,), cum.dtype)
        logits = jnp.concatenate([zeros, cum], axis=-1)
        y = jax.random.categorical(k3, logits, axis=-1)
        return y, theta, delta


@dataclasses.dataclass(frozen=True)
class IrtModel:
    """Multi-subscale IRT framework — the reference's IrtModel with its
    Subject/Item object graph re-expressed as fixed-shape arrays.

    Reference: Models/IRT/IrtModel.hpp:34-100 (subscale-named model
    holding SubjectSet + ItemSet, MVN/MvReg subject prior via
    set_subject_prior), Subject.hpp:34-80 (per-subject Theta vector,
    one ability PER SUBSCALE, optional background covariates x_),
    Item.hpp:29-52 (each item assesses one or more subscales via an
    Indicators vector, graded responses with maxscore+1 levels), and
    the subject/item samplers in Models/IRT/PosteriorSamplers (the
    slice variants; the DAFE augmentation is replaced by direct
    vectorized slice updates, which need no augmentation table).

    Model: for item j with discrimination a_j, step cutpoints
    delta_{j,1..L-1}, and subscale indicator row load_j,

        comp_ij = load_j . theta_i          (sum of assessed abilities)
        P(y_ij = m) prop exp( sum_{l<=m} (a_j comp_ij - delta_jl) )

    — the partial-credit form; binary items (2 levels) reduce to the
    2PL. Subject prior: theta_i ~ MVN(B x_i, Sigma) (the MvReg subject
    prior; without covariates, MVN(0, Sigma)), Sigma ~ IW.
    Identification: the FIRST item of each subscale is an anchor with
    a_j fixed at 1, which pins each subscale's scale so Sigma may be a
    free covariance (sampled conjugately) rather than a constrained
    correlation.

    All subjects' abilities update in one [N]-lane slice pass per
    subscale; all items' parameters in [J]-lane passes; the [N, J, L]
    category-logit tensor is a single batched op.

    State: theta [N, S], log_a [J] (anchors masked), delta [J, L-1],
    Sigma [S, S], and B [S, P] when covariates are given.
    """

    responses: jax.Array  # [N, J] ints in [0, num_levels)
    loadings: jax.Array  # [J, S] 0/1 subscale indicators
    num_levels: int  # max levels over items (pad ragged items)
    item_levels: jax.Array | None = None  # [J] ints (default all max)
    observed: jax.Array | None = None  # [N, J] bool
    x: jax.Array | None = None  # [N, P] background covariates
    sigma_df: float | None = None  # IW prior df (default S + 2)

    @property
    def _obs(self):
        if self.observed is None:
            return jnp.ones(self.responses.shape, bool)
        return self.observed

    @property
    def _levels(self):
        j = self.responses.shape[1]
        if self.item_levels is None:
            return jnp.full((j,), self.num_levels)
        return self.item_levels

    @property
    def _anchor(self):
        """[J] bool: first item of each subscale (a_j frozen at 1)."""
        loads = jnp.asarray(self.loadings)
        j, s = loads.shape
        first = jnp.argmax(loads.T, axis=1)  # [S] first loading item
        return jnp.zeros((j,), bool).at[first].set(True)

    def _category_logits(self, theta, log_a, delta):
        """[N, J, L] unnormalized log category probabilities with
        ragged item levels masked to -inf."""
        comp = theta @ jnp.asarray(self.loadings, theta.dtype).T  # [N,J]
        a = jnp.exp(log_a)
        steps = (a[None, :] * comp)[:, :, None] - delta[None, :, :]
        cum = jnp.cumsum(steps, axis=-1)  # [N, J, L-1]
        zeros = jnp.zeros(cum.shape[:-1] + (1,), cum.dtype)
        logits = jnp.concatenate([zeros, cum], axis=-1)
        cat_ok = (jnp.arange(self.num_levels)[None, :]
                  < self._levels[:, None])  # [J, L]
        return jnp.where(cat_ok[None, :, :], logits, -jnp.inf)

    def loglik_matrix(self, theta, log_a, delta):
        logits = self._category_logits(theta, log_a, delta)
        logp = jax.nn.log_softmax(logits, axis=-1)
        ll = jnp.take_along_axis(
            logp, self.responses[:, :, None], -1)[..., 0]
        return jnp.where(self._obs, ll, 0.0)

    def init_state(self, key):
        n, j = self.responses.shape
        s = jnp.asarray(self.loadings).shape[1]
        lev = jnp.asarray(self._levels, self.responses.dtype)
        frac = (jnp.sum(jnp.where(self._obs, self.responses, 0), 1)
                / jnp.maximum(jnp.sum(
                    self._obs * (lev[None, :] - 1), 1), 1))
        theta0 = jax.scipy.special.logit(
            jnp.clip(frac, 0.05, 0.95)) * 0.5
        state = {
            "theta": jnp.broadcast_to(theta0[:, None], (n, s)) + 0.0,
            "log_a": jnp.zeros((j,)),
            "delta": jnp.zeros((j, self.num_levels - 1)),
            "Sigma": jnp.eye(s),
        }
        if self.x is not None:
            state["B"] = jnp.zeros((s, self.x.shape[1]))
        return state

    def kernel(self):
        n, j = self.responses.shape
        s = jnp.asarray(self.loadings).shape[1]
        l = self.num_levels
        df0 = self.sigma_df if self.sigma_df is not None else s + 2.0
        anchor = self._anchor

        def prior_mean(state):
            if self.x is None:
                return jnp.zeros((n, s))
            return self.x @ state["B"].T

        def sweep(key, state):
            keys = jax.random.split(key, s + l + 4)
            theta, log_a, delta = (state["theta"], state["log_a"],
                                   state["delta"])
            siginv = jnp.linalg.inv(state["Sigma"])
            siginv = 0.5 * (siginv + siginv.T)
            mu = prior_mean(state)

            # 1. abilities, one [N]-lane slice pass per subscale
            for sub in range(int(s)):
                def th_target(v, sub=sub, theta=theta):
                    th = theta.at[:, sub].set(v)
                    dev = th - mu
                    lp = -0.5 * jnp.einsum(
                        "ni,ij,nj->n", dev, siginv, dev)
                    return jnp.sum(
                        self.loglik_matrix(th, log_a, delta), 1) + lp

                theta = theta.at[:, sub].set(slice_step(
                    keys[sub], theta[:, sub], th_target, width=1.0,
                    expand_iters=5, shrink_iters=10))

            # 2. discriminations ([J] lanes; anchors stay at 0)
            def a_target(v):
                ll = self.loglik_matrix(theta, v, delta)
                return jnp.sum(ll, 0) - 0.5 * (v / 0.7) ** 2

            log_a_new = slice_step(keys[s], log_a, a_target, width=0.5,
                                   expand_iters=5, shrink_iters=10)
            log_a = jnp.where(anchor, 0.0, log_a_new)

            # 3. step cutpoints, one [J]-lane pass per level
            for step_i in range(l - 1):
                def d_target(v, step_i=step_i, delta=delta):
                    d = delta.at[:, step_i].set(v)
                    ll = self.loglik_matrix(theta, log_a, d)
                    return jnp.sum(ll, 0) - 0.5 * (v / 3.0) ** 2

                delta = delta.at[:, step_i].set(slice_step(
                    keys[s + 1 + step_i], delta[:, step_i], d_target,
                    width=1.0, expand_iters=5, shrink_iters=10))

            out = dict(state)
            out["theta"], out["log_a"], out["delta"] = (theta, log_a,
                                                        delta)

            # 4. subject-prior regression B | theta, Sigma (MvReg prior,
            #    matrix-normal conjugate with a vague ridge)
            if self.x is not None:
                xtx = self.x.T @ self.x + 1e-4 * jnp.eye(
                    self.x.shape[1])
                mean_b = jnp.linalg.solve(xtx, self.x.T @ theta).T
                out["B"] = dists.matrix_normal.sample(
                    keys[s + l], mean_b, state["Sigma"],
                    jnp.linalg.inv(xtx))
                mu = self.x @ out["B"].T

            # 5. Sigma | theta (inverse Wishart; anchors fix the scale)
            dev = theta - mu
            ss = jnp.eye(s) * df0 + dev.T @ dev
            siginv_new = dists.wishart.sample(
                keys[s + l + 1], df0 + n,
                jnp.linalg.inv(0.5 * (ss + ss.T)))
            sigma = jnp.linalg.inv(siginv_new)
            out["Sigma"] = 0.5 * (sigma + sigma.T)
            return out

        return sweep

    def ability_correlations(self, state):
        """[S, S] correlation form of the ability covariance."""
        d = jnp.sqrt(jnp.diagonal(state["Sigma"]))
        return state["Sigma"] / jnp.outer(d, d)

    @staticmethod
    def simulate(key, n, items_per_scale, corr=0.6, num_levels=2,
                 a_sd=0.3):
        """Two-subscale panel with known abilities; returns
        (responses, loadings, truth dict)."""
        k1, k2, k3, k4 = jax.random.split(key, 4)
        s = 2
        j = items_per_scale * s
        cov = jnp.asarray([[1.0, corr], [corr, 1.0]])
        theta = jax.random.multivariate_normal(
            k1, jnp.zeros((s,)), cov, (n,))
        loadings = jnp.zeros((j, s)).at[
            jnp.arange(j), jnp.arange(j) // items_per_scale].set(1.0)
        log_a = a_sd * jax.random.normal(k2, (j,))
        log_a = log_a.at[0].set(0.0).at[items_per_scale].set(0.0)
        delta = (jnp.linspace(-1.0, 1.0, num_levels - 1)[None, :]
                 + 0.8 * jax.random.normal(k3, (j, 1)))
        model = IrtModel(
            responses=jnp.zeros((n, j), jnp.int32), loadings=loadings,
            num_levels=num_levels)
        logits = model._category_logits(theta, log_a, delta)
        resp = jax.random.categorical(k4, logits, axis=-1)
        return resp.astype(jnp.int32), loadings, {
            "theta": theta, "log_a": log_a, "delta": delta}
