"""Native async draw log (C++ ring buffer + ctypes binding)."""

import numpy as np
import jax.numpy as jnp

from boom_tpu.runtime import DrawLogWriter, PytreeDrawLog, read_draws


def test_roundtrip_flat(tmp_path):
    path = str(tmp_path / "draws.bin")
    data = np.random.default_rng(0).normal(size=(1000, 7))
    with DrawLogWriter(path, record_elems=7) as w:
        for i in range(0, 1000, 100):
            w.append(data[i:i + 100])
        w.flush()
        assert w.records_written == 1000
    out = read_draws(path)
    np.testing.assert_array_equal(out, data)
    part = read_draws(path, offset=990, n=5)
    np.testing.assert_array_equal(part, data[990:995])


def test_roundtrip_float32(tmp_path):
    path = str(tmp_path / "draws32.bin")
    data = np.random.default_rng(1).normal(size=(50, 3)).astype(np.float32)
    with DrawLogWriter(path, 3, dtype=np.float32) as w:
        w.append(data)
        w.flush()
    out = read_draws(path)
    assert out.dtype == np.float32
    np.testing.assert_array_equal(out, data)


def test_pytree_log(tmp_path):
    path = str(tmp_path / "tree.bin")
    example = {"beta": jnp.zeros((4,)), "sigsq": jnp.zeros(())}
    log = PytreeDrawLog(path, example)
    rng = np.random.default_rng(2)
    draws = []
    for _ in range(20):
        d = {"beta": jnp.asarray(rng.normal(size=4)),
             "sigsq": jnp.asarray(rng.uniform())}
        log.append(d)
        draws.append(d)
    log.flush()
    tree = log.read()
    assert tree["beta"].shape == (20, 4)
    np.testing.assert_allclose(
        np.asarray(tree["beta"][7]), np.asarray(draws[7]["beta"]))
    np.testing.assert_allclose(
        np.asarray(tree["sigsq"]),
        np.asarray([d["sigsq"] for d in draws]))
    log.close()


def test_pytree_batch(tmp_path):
    path = str(tmp_path / "batch.bin")
    example = {"a": jnp.zeros((2,))}
    log = PytreeDrawLog(path, example)
    batch = {"a": jnp.arange(10.0).reshape(5, 2)}
    log.append_batch(batch, 5)
    log.flush()
    tree = log.read()
    np.testing.assert_allclose(np.asarray(tree["a"]),
                               np.arange(10.0).reshape(5, 2))
    log.close()


def test_large_stress(tmp_path):
    """Many small appends through the ring buffer boundary."""
    path = str(tmp_path / "stress.bin")
    n, k = 5000, 11
    data = np.arange(n * k, dtype=np.float64).reshape(n, k)
    with DrawLogWriter(path, k, buffer_records=16) as w:
        for i in range(n):
            w.append(data[i])
        w.flush()
    out = read_draws(path)
    np.testing.assert_array_equal(out, data)
