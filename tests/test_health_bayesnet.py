"""HealthStateModel (treatment-dependent HMM; reference
Models/HMM/HealthStateModel.hpp:80) and DiscreteBayesNet CPT learning
with missing cells."""

import jax
import jax.numpy as jnp
import numpy as np

from boom_tpu.inference.driver import run_mcmc
from boom_tpu.models.graphical import DiscreteBayesNet, Node
from boom_tpu.models.health_state import HealthStateModel


def test_health_state_recovers_treatment_effect(rng_key):
    """Treatment 1 strongly promotes moving to (and staying in) the
    healthy state; treatment 0 does the reverse."""
    s, k_treat, n, t_len = 2, 2, 60, 40
    trans = np.array([
        [[0.8, 0.2], [0.6, 0.4]],   # treatment 0: drifts to state 0
        [[0.3, 0.7], [0.1, 0.9]],   # treatment 1: drifts to state 1
    ])
    means = np.array([-2.0, 2.0])
    sds = np.array([0.7, 0.7])
    treatment = np.zeros((n, t_len), int)
    treatment[n // 2:, :] = 1  # half the panel treated
    z_true, y = HealthStateModel.simulate(
        rng_key, n, t_len, trans, means, sds, jnp.asarray(treatment))

    model = HealthStateModel(
        y=y, treatment=jnp.asarray(treatment), num_states=s,
        num_treatments=k_treat)
    res = run_mcmc(jax.random.key(1), model.kernel(), model.init_state,
                   num_draws=300, num_chains=2, burn=200,
                   extract=lambda st: {"trans": st["trans"],
                                       "mu": st["mu"]})
    d = res.stacked()
    mu_hat = np.sort(np.asarray(d["mu"]).mean(0))
    np.testing.assert_allclose(mu_hat, means, atol=0.3)
    t_hat = np.asarray(d["trans"]).mean(0)
    # state labels may be flipped; align by emission means
    order = np.argsort(np.asarray(d["mu"]).mean(0))
    t_hat = t_hat[:, order][:, :, order]
    np.testing.assert_allclose(t_hat, trans, atol=0.12)


def test_health_state_split_treatment(rng_key):
    """Split periods mix the two regimes' transition matrices; the
    sampler must still run and produce valid probabilities."""
    s, n, t_len = 2, 30, 20
    trans = np.array([
        [[0.9, 0.1], [0.5, 0.5]],
        [[0.2, 0.8], [0.1, 0.9]],
    ])
    treatment = np.ones((n, t_len), int)
    initial = np.zeros((n, t_len), int)
    frac = np.full((n, t_len), 0.5)
    z_true, y = HealthStateModel.simulate(
        rng_key, n, t_len, trans, np.array([-2.0, 2.0]),
        np.array([0.6, 0.6]), jnp.asarray(treatment))

    model = HealthStateModel(
        y=y, treatment=jnp.asarray(treatment), num_states=s,
        num_treatments=2, initial_treatment=jnp.asarray(initial),
        final_fraction=jnp.asarray(frac))
    res = run_mcmc(jax.random.key(1), model.kernel(), model.init_state,
                   num_draws=100, num_chains=2, burn=100,
                   extract=lambda st: {"trans": st["trans"]})
    t_hat = np.asarray(res.stacked()["trans"]).mean(0)
    assert t_hat.shape == (2, 2, 2)
    np.testing.assert_allclose(t_hat.sum(-1), 1.0, atol=1e-6)
    # BOTH regimes received attributed transitions (counts flowed)
    assert np.abs(t_hat[0] - t_hat[1]).max() > 0.01


def _rain_net(cpt_rain, cpt_sprinkler, cpt_wet):
    return DiscreteBayesNet(nodes=(
        Node("rain", 2, (), jnp.asarray(cpt_rain)),
        Node("sprinkler", 2, ("rain",), jnp.asarray(cpt_sprinkler)),
        Node("wet", 2, ("rain", "sprinkler"), jnp.asarray(cpt_wet)),
    ))


def test_bayesnet_cpt_learning_with_missing(rng_key):
    truth = _rain_net(
        [0.7, 0.3],
        [[0.5, 0.5], [0.9, 0.1]],
        [[[0.95, 0.05], [0.1, 0.9]], [[0.15, 0.85], [0.02, 0.98]]])
    data = truth.sample(rng_key, 3000)
    # hide 30% of cells
    mask = jax.random.uniform(jax.random.key(7), data.shape) > 0.3

    init_net = _rain_net(
        [0.5, 0.5], [[0.5, 0.5], [0.5, 0.5]],
        [[[0.5, 0.5], [0.5, 0.5]], [[0.5, 0.5], [0.5, 0.5]]])
    kern = init_net.learning_kernel(data, mask, prior=1.0)
    res = run_mcmc(
        jax.random.key(1), kern,
        lambda k: init_net.learning_init(k, data, mask),
        num_draws=150, num_chains=2, burn=100,
        extract=lambda st: {"cpts": st["cpts"]})
    cpts = [np.asarray(c).mean(axis=(0, 1))
            for c in res.draws["cpts"]]
    np.testing.assert_allclose(cpts[0], [0.7, 0.3], atol=0.05)
    np.testing.assert_allclose(
        cpts[1], [[0.5, 0.5], [0.9, 0.1]], atol=0.07)
    np.testing.assert_allclose(
        cpts[2][0, 0], [0.95, 0.05], atol=0.07)
    np.testing.assert_allclose(
        cpts[2][1, 1], [0.02, 0.98], atol=0.07)


def test_bayesnet_learning_complete_data_matches_counts(rng_key):
    """With no missing cells the sampler reduces to pure conjugate
    Dirichlet draws around the empirical frequencies."""
    truth = _rain_net(
        [0.6, 0.4], [[0.7, 0.3], [0.2, 0.8]],
        [[[0.9, 0.1], [0.3, 0.7]], [[0.4, 0.6], [0.05, 0.95]]])
    data = truth.sample(rng_key, 5000)
    mask = jnp.ones(data.shape, bool)
    kern = truth.learning_kernel(data, mask, prior=1.0)
    res = run_mcmc(
        jax.random.key(1), kern,
        lambda k: truth.learning_init(k, data, mask),
        num_draws=100, num_chains=2, burn=20,
        extract=lambda st: {"cpts": st["cpts"]})
    root = np.asarray(res.draws["cpts"][0]).mean(axis=(0, 1))
    emp = np.bincount(np.asarray(data[:, 0]), minlength=2) / 5000
    np.testing.assert_allclose(root, emp, atol=0.03)


def test_variable_elimination_matches_dense():
    """VE with min-fill ordering == dense-joint inference on a small
    net, with and without evidence."""
    import jax.numpy as jnp
    import numpy as np
    from boom_tpu.models.graphical import DiscreteBayesNet, Node

    rng = np.random.default_rng(0)

    def cpt(*shape):
        t = rng.uniform(0.2, 1.0, size=shape)
        return jnp.asarray(t / t.sum(-1, keepdims=True))

    net = DiscreteBayesNet(nodes=(
        Node("a", 2, (), cpt(2)),
        Node("b", 3, ("a",), cpt(2, 3)),
        Node("c", 2, ("a",), cpt(2, 2)),
        Node("d", 3, ("b", "c"), cpt(3, 2, 3)),
        Node("e", 2, ("d",), cpt(3, 2)),
    ))
    for query in ("a", "d", "e"):
        for ev in ({}, {"e": 1}, {"b": 2, "e": 0}):
            ev = {k: v for k, v in ev.items() if k != query}
            dense = np.asarray(net.marginal(query, ev, method="dense"))
            ve = np.asarray(net.marginal(query, ev,
                                         method="elimination"))
            assert np.allclose(dense, ve, atol=1e-10), (query, ev)


def test_variable_elimination_scales_past_dense_limit():
    """A 60-node chain is far beyond the dense joint (2^60) and the
    old einsum alphabet; VE handles it and matches the analytic
    forward recursion."""
    import jax.numpy as jnp
    import numpy as np
    from boom_tpu.models.graphical import DiscreteBayesNet, Node

    n = 60
    flip = jnp.asarray([[0.9, 0.1], [0.2, 0.8]])
    nodes = [Node("x0", 2, (), jnp.asarray([0.7, 0.3]))]
    for i in range(1, n):
        nodes.append(Node(f"x{i}", 2, (f"x{i-1}",), flip))
    net = DiscreteBayesNet(nodes=tuple(nodes))
    got = np.asarray(net.marginal(f"x{n-1}"))  # auto -> elimination
    p = np.array([0.7, 0.3])
    for _ in range(n - 1):
        p = p @ np.asarray(flip)
    assert np.allclose(got, p, atol=1e-10)
    # conditional query down the chain
    got_c = np.asarray(net.marginal("x5", {"x0": 1}))
    pc = np.array([0.0, 1.0])
    for _ in range(5):
        pc = pc @ np.asarray(flip)
    assert np.allclose(got_c, pc, atol=1e-10)
