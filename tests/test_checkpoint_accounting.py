"""Checkpoint/resume and move accounting."""

import jax
import jax.numpy as jnp
import numpy as np

from boom_tpu.inference.accounting import (
    accounting_init,
    acceptance_rates,
    record_move,
)
from boom_tpu.inference.checkpoint import (
    checkpointed_run,
    load_checkpoint,
    resume_run,
    save_checkpoint,
)


def _kernel(key, state):
    # simple AR(1)-ish random walk on one scalar
    return {"x": 0.9 * state["x"]
            + 0.1 * jax.random.normal(key, (), state["x"].dtype)}


def test_save_load_roundtrip(tmp_path):
    path = str(tmp_path / "ck.npz")
    state = {"a": jnp.arange(4.0), "b": {"c": jnp.ones((2, 2))}}
    key = jax.random.key(3)
    save_checkpoint(path, state, key=key, meta={"it": 7})
    loaded, key2, meta = load_checkpoint(path, state)
    np.testing.assert_array_equal(np.asarray(loaded["a"]),
                                  np.asarray(state["a"]))
    np.testing.assert_array_equal(np.asarray(loaded["b"]["c"]),
                                  np.asarray(state["b"]["c"]))
    assert meta["it"] == 7
    # resumed key generates the same stream
    np.testing.assert_array_equal(
        np.asarray(jax.random.normal(key2, (3,))),
        np.asarray(jax.random.normal(key, (3,))))


def test_checkpointed_run_equals_straight_run(tmp_path):
    path = str(tmp_path / "run.npz")
    init = {"x": jnp.zeros(())}
    state, draws = checkpointed_run(
        jax.random.key(0), _kernel, init, num_iters=50,
        checkpoint_every=13, path=path,
        extract=lambda s: s["x"])
    assert draws.shape == (50,)
    _, _, meta = load_checkpoint(path, init)
    assert meta["iterations_done"] == 50


def test_resume_continues(tmp_path):
    path = str(tmp_path / "resume.npz")
    init = {"x": jnp.zeros(())}
    # run 20 of 50, then resume the remaining 30
    checkpointed_run(jax.random.key(0), _kernel, init, num_iters=20,
                     checkpoint_every=20, path=path)
    state, draws = resume_run(path, init, _kernel, num_iters=50,
                              checkpoint_every=15,
                              extract=lambda s: s["x"])
    assert draws.shape == (30,)
    _, _, meta = load_checkpoint(path, init)
    assert meta["iterations_done"] == 30  # counts since resume


def test_accounting_counters():
    acct = accounting_init(["mh", "slice"])

    @jax.jit
    def run(acct):
        acct = record_move(acct, "mh", True)
        acct = record_move(acct, "mh", False)
        acct = record_move(acct, "slice", True)
        return acct

    acct = run(acct)
    rates = acceptance_rates(acct)
    assert rates["mh"] == 0.5
    assert rates["slice"] == 1.0
