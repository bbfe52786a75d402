"""Discrete directed graphical models with exact inference.

Reference: Models/Graphical — DirectedGraphicalModel.hpp, Clique /
JunctionTree (JunctionTree.hpp:55), NodeSetMarginalDistribution: exact
message passing for categorical DAGs.

TPU-native design: a junction tree's purpose is to pick a good
elimination order for tensor contractions — on TPU the natural engine
for that IS einsum (XLA picks fused contraction schedules). A
DiscreteBayesNet stores one CPT tensor per node; queries compile to a
single einsum over the factor tensors with evidence applied as masks.
This is exactly the junction-tree computation (variable elimination) in
its tensor form, jit-able and batchable over evidence rows.
"""

from __future__ import annotations

import dataclasses
import string
from typing import Sequence

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Node:
    name: str
    num_levels: int
    parents: tuple  # parent names, ordered as CPT leading axes
    cpt: jax.Array  # [parent levels..., num_levels]


@dataclasses.dataclass(frozen=True)
class DiscreteBayesNet:
    """Categorical DAG with exact inference via einsum contraction."""

    nodes: Sequence[Node]

    def __post_init__(self):
        names = [n.name for n in self.nodes]
        assert len(set(names)) == len(names), "duplicate node names"
        order = {n: i for i, n in enumerate(names)}
        for node in self.nodes:
            for p in node.parents:
                assert order[p] < order[node.name], (
                    f"{node.name} before parent {p}: order topologically")

    def _axes(self):
        letters = string.ascii_letters
        return {n.name: letters[i] for i, n in enumerate(self.nodes)}

    def log_joint_tensor(self):
        """Dense joint log-probability tensor (small nets only): sum of
        broadcast-reshaped CPT log tensors."""
        shape = tuple(n.num_levels for n in self.nodes)
        total = jnp.zeros(shape)
        idx = {n.name: i for i, n in enumerate(self.nodes)}
        for node in self.nodes:
            dims = [idx[p] for p in node.parents] + [idx[node.name]]
            logp = jnp.log(jnp.clip(node.cpt, 1e-300, None))
            # permute cpt axes into ascending global order, then reshape
            # with singleton axes for broadcasting
            order = sorted(range(len(dims)), key=lambda i: dims[i])
            logp = jnp.transpose(logp, order)
            sorted_dims = sorted(dims)
            view = [shape[d] if d in sorted_dims else 1
                    for d in range(len(self.nodes))]
            total = total + logp.reshape(view)
        return total

    def marginal(self, query: str, evidence: dict | None = None,
                 method: str = "auto"):
        """P(query | evidence), exact.

        method='dense' sums the full joint tensor (fastest for small
        nets; exponential memory in node count). method='elimination'
        runs variable elimination with a greedy min-fill ordering —
        cost exponential only in the induced treewidth, so large
        sparse nets (hundreds of nodes) stay tractable; this is the
        role of the reference's clique-based structure
        (Models/Graphical/CliqueFinder.hpp, junction tree). 'auto'
        picks dense for <= 12 nodes."""
        if method == "auto":
            method = "dense" if len(self.nodes) <= 12 else "elimination"
        if method == "elimination":
            return self._marginal_ve(query, evidence)
        evidence = evidence or {}
        logj = self.log_joint_tensor()
        idx = {n.name: i for i, n in enumerate(self.nodes)}
        for name, val in evidence.items():
            node = self.nodes[idx[name]]
            mask = jax.nn.one_hot(val, node.num_levels) > 0
            view = [1] * len(self.nodes)
            view[idx[name]] = node.num_levels
            logj = jnp.where(mask.reshape(view), logj, -jnp.inf)
        keep = idx[query]
        axes = tuple(i for i in range(len(self.nodes)) if i != keep)
        logm = jax.scipy.special.logsumexp(logj, axis=axes)
        return jax.nn.softmax(logm)

    # -- variable elimination -----------------------------------------
    def _factors(self, evidence):
        """Initial log factors [(vars tuple, log tensor)], with evidence
        variables sliced out (reduced, not masked)."""
        factors = []
        for node in self.nodes:
            vars_ = tuple(node.parents) + (node.name,)
            logp = jnp.log(jnp.clip(node.cpt, 1e-300, None))
            for v in vars_:
                if v in evidence:
                    ax = vars_.index(v)
                    logp = jnp.take(logp, evidence[v], axis=ax)
                    vars_ = vars_[:ax] + vars_[ax + 1:]
            factors.append((vars_, logp))
        return factors

    @staticmethod
    def _combine(f1, f2):
        """Log-space factor product with broadcast-aligned axes."""
        v1, t1 = f1
        v2, t2 = f2
        out_vars = tuple(v1) + tuple(v for v in v2 if v not in v1)
        # t1: append singleton axes for v2-only vars
        a1 = t1.reshape(t1.shape + (1,) * (len(out_vars) - len(v1)))
        # t2: permute/reshape into out_vars layout
        perm = []
        shape = []
        for v in out_vars:
            if v in v2:
                perm.append(v2.index(v))
                shape.append(t2.shape[v2.index(v)])
            else:
                shape.append(1)
        t2p = jnp.transpose(t2, perm).reshape(shape)
        return out_vars, a1 + t2p

    def _elimination_order(self, keep, factors):
        """Greedy min-fill ordering on the interaction graph of the
        current factors (the standard treewidth heuristic)."""
        neighbors = {}
        for vars_, _ in factors:
            for v in vars_:
                neighbors.setdefault(v, set()).update(
                    u for u in vars_ if u != v)
        order = []
        remaining = set(neighbors) - set(keep)
        while remaining:
            def fill_in(v):
                nb = [u for u in neighbors[v] if u in remaining
                      or u in keep]
                return sum(1 for i, a in enumerate(nb)
                           for b in nb[i + 1:]
                           if b not in neighbors[a])

            v = min(sorted(remaining), key=fill_in)
            order.append(v)
            nb = list(neighbors[v])
            for a in nb:
                neighbors[a].discard(v)
                neighbors[a].update(u for u in nb if u != a)
            del neighbors[v]
            remaining.discard(v)
        return order

    def _marginal_ve(self, query, evidence=None):
        evidence = evidence or {}
        factors = self._factors(evidence)
        for v in self._elimination_order([query], factors):
            related = [f for f in factors if v in f[0]]
            if not related:
                continue
            factors = [f for f in factors if v not in f[0]]
            prod = related[0]
            for f in related[1:]:
                prod = self._combine(prod, f)
            vars_, t = prod
            ax = vars_.index(v)
            factors.append((vars_[:ax] + vars_[ax + 1:],
                            jax.scipy.special.logsumexp(t, axis=ax)))
        # remaining factors mention only the query (or nothing)
        out = (
            (query,), jnp.zeros(
                self.nodes[[n.name for n in self.nodes].index(query)]
                .num_levels))
        for f in factors:
            out = self._combine(out, f)
        vars_, t = out
        assert vars_ == (query,), vars_
        return jax.nn.softmax(t)

    def loglik(self, assignments):
        """Log probability of full assignment rows [n, num_nodes]
        (columns in node order)."""
        total = 0.0
        idx = {n.name: i for i, n in enumerate(self.nodes)}
        for node in self.nodes:
            cols = [assignments[:, idx[p]] for p in node.parents]
            cols.append(assignments[:, idx[node.name]])
            total = total + jnp.log(jnp.clip(
                node.cpt[tuple(cols)], 1e-300, None))
        return total

    def sample(self, key, n):
        """Ancestral sampling: [n, num_nodes] integer assignments."""
        idx = {node.name: i for i, node in enumerate(self.nodes)}
        out = jnp.zeros((n, len(self.nodes)), jnp.int32)
        for node in self.nodes:
            key, k = jax.random.split(key)
            cols = tuple(out[:, idx[p]] for p in node.parents)
            probs = node.cpt[cols] if node.parents else jnp.broadcast_to(
                node.cpt, (n, node.num_levels))
            draw = jax.random.categorical(
                k, jnp.log(jnp.clip(probs, 1e-300, None)), axis=-1)
            out = out.at[:, idx[node.name]].set(draw.astype(jnp.int32))
        return out

    def with_cpts(self, cpts):
        """New net with the same structure and the given CPT tensors."""
        return DiscreteBayesNet(nodes=tuple(
            dataclasses.replace(n, cpt=c)
            for n, c in zip(self.nodes, cpts)))

    def learning_kernel(self, values, observed, prior=1.0):
        """Gibbs sampler over (missing cells, CPTs) for PARTIALLY
        observed assignment data — CPT posterior learning with evidence
        masks (the reference's Models/Graphical sits inside the model
        framework with conjugate CPD updates; this is that capability,
        not just the query engine).

        values: [n, V] int codes (arbitrary at unobserved cells);
        observed: [n, V] bool. State: {"assign": [n, V],
        "cpts": tuple of CPT tensors}. Sweep: for each node, resample
        its missing cells from the full conditional given every other
        cell (computed from the current joint tensor — exact, small
        nets), then conjugate Dirichlet CPT row draws from the
        completed data."""
        values = jnp.asarray(values, jnp.int32)
        observed = jnp.asarray(observed, bool)
        v = len(self.nodes)

        def sweep(key, state):
            assign = jnp.where(observed, values, state["assign"])
            net = self.with_cpts(state["cpts"])
            logj = net.log_joint_tensor()
            keys = jax.random.split(key, v + 1)
            for j, node in enumerate(self.nodes):
                lj = jnp.moveaxis(logj, j, -1)  # [..., S_j]
                cols = tuple(assign[:, i] for i in range(v) if i != j)
                logits = lj[cols]  # [n, S_j]
                draw = jax.random.categorical(keys[j], logits, axis=-1)
                assign = assign.at[:, j].set(jnp.where(
                    observed[:, j], assign[:, j],
                    draw.astype(jnp.int32)))
            new_net = self.with_cpts(state["cpts"]).conjugate_cpt_draws(
                keys[v], assign, prior=prior)
            return {"assign": assign,
                    "cpts": tuple(n.cpt for n in new_net.nodes)}

        return sweep

    def learning_init(self, key, values, observed):
        """Initial state for learning_kernel: missing cells uniform."""
        values = jnp.asarray(values, jnp.int32)
        observed = jnp.asarray(observed, bool)
        keys = jax.random.split(key, len(self.nodes))
        cols = []
        for j, node in enumerate(self.nodes):
            rand = jax.random.randint(
                keys[j], (values.shape[0],), 0, node.num_levels)
            cols.append(jnp.where(observed[:, j], values[:, j],
                                  rand.astype(jnp.int32)))
        return {"assign": jnp.stack(cols, axis=1),
                "cpts": tuple(n.cpt for n in self.nodes)}

    def conjugate_cpt_draws(self, key, assignments, prior=1.0):
        """Posterior CPT draws given complete data (Dirichlet rows;
        reference's conjugate CPD updates). Returns a new net."""
        from boom_tpu import dists

        idx = {node.name: i for i, node in enumerate(self.nodes)}
        new_nodes = []
        for node in self.nodes:
            key, k = jax.random.split(key)
            cols = [assignments[:, idx[p]] for p in node.parents]
            cols.append(assignments[:, idx[node.name]])
            # count tensor via scatter-add
            shape = node.cpt.shape
            flat_idx = jnp.ravel_multi_index(
                tuple(cols), shape, mode="clip")
            import math

            counts = jnp.zeros(math.prod(shape)).at[
                flat_idx].add(1.0).reshape(shape)
            cpt = dists.dirichlet.sample(k, prior + counts)
            new_nodes.append(dataclasses.replace(node, cpt=cpt))
        return DiscreteBayesNet(nodes=new_nodes)
