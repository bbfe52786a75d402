"""Fitted-model serialization: save()/load() for every front end.

Reference: the python bsts package pickles whole fitted models
(Interfaces/python/bsts/BayesBoom/bsts/bsts.py:1155 __getstate__ /
:1167 __setstate__); R users save .RData. Here every front end (api.py
and frontends.py classes) gets `save(path)` / `ClassName.load(path)`
via the SavableFit mixin.

Device arrays are converted to host numpy on save — files are portable
across backends (a fit produced on TPU loads on a CPU-only host) and
contain no device references. On load, numpy leaves are NOT eagerly
pushed back to the device: jax ops consume numpy arrays transparently,
and anything that re-enters a jitted program is staged then.
"""

from __future__ import annotations

import dataclasses
import pickle

import numpy as np

__all__ = ["to_host", "save_fit", "load_fit", "SavableFit"]


def to_host(obj, _depth=0):
    """Recursively convert jax arrays to numpy through dicts, lists,
    tuples (incl. NamedTuples), and dataclasses."""
    import jax

    if _depth > 50:
        return obj
    if isinstance(obj, jax.Array):
        return np.asarray(obj)
    if isinstance(obj, dict):
        return {k: to_host(v, _depth + 1) for k, v in obj.items()}
    if isinstance(obj, tuple):
        vals = [to_host(v, _depth + 1) for v in obj]
        if hasattr(obj, "_fields"):  # NamedTuple
            return type(obj)(*vals)
        return tuple(vals)
    if isinstance(obj, list):
        return [to_host(v, _depth + 1) for v in obj]
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        repl = {f.name: to_host(getattr(obj, f.name), _depth + 1)
                for f in dataclasses.fields(obj)}
        return dataclasses.replace(obj, **repl)
    return obj


def save_fit(obj, path):
    """Pickle a fitted front end with all arrays on host."""
    state = {k: to_host(v) for k, v in obj.__dict__.items()}
    with open(path, "wb") as f:
        pickle.dump({"class": type(obj).__qualname__,
                     "module": type(obj).__module__,
                     "state": state}, f)


def load_fit(path, expect_class=None):
    """Load a fit saved by save_fit. Returns the reconstructed front
    end; `expect_class` (a type) adds a safety check."""
    import importlib

    with open(path, "rb") as f:
        payload = pickle.load(f)
    mod = importlib.import_module(payload["module"])
    cls = mod
    for part in payload["class"].split("."):
        cls = getattr(cls, part)
    if expect_class is not None and cls is not expect_class:
        raise TypeError(
            f"{path} holds a {payload['class']}, expected "
            f"{expect_class.__qualname__}")
    obj = cls.__new__(cls)
    obj.__dict__.update(payload["state"])
    return obj


class SavableFit:
    """Mixin giving a front end `save(path)` and `Class.load(path)`."""

    def save(self, path):
        save_fit(self, path)

    @classmethod
    def load(cls, path):
        return load_fit(path, expect_class=cls)
