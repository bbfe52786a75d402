"""ctypes binding + pytree layer over the native async draw log.

The C++ core (draw_log.cpp) is the runtime analog of the reference's
cpputil/ParamFileIoManager.hpp:35 and the write/stream halves of
Interfaces/R/list_io.hpp:54-80: a background thread drains a ring
buffer of fixed-size draw records to disk so MCMC never blocks on I/O.

This module compiles the shared library on first use (g++, cached next
to the source), exposes DrawLogWriter / read_draws for flat records,
and PytreeDrawLog which maps a pytree of arrays per draw to one flat
record (layout stored in a JSON sidecar) — the checkpoint/stream story
for prediction and resume.
"""

from __future__ import annotations

import ctypes
import json
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "draw_log.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "_draw_log.so")
_lock = threading.Lock()
_lib = None


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-pthread",
                 "-std=c++17", _SRC, "-o", _LIB],
                check=True, capture_output=True)
        lib = ctypes.CDLL(_LIB)
        lib.dlog_open.restype = ctypes.c_void_p
        lib.dlog_open.argtypes = [ctypes.c_char_p, ctypes.c_uint64,
                                  ctypes.c_uint32, ctypes.c_uint64]
        lib.dlog_append.restype = ctypes.c_int
        lib.dlog_append.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                    ctypes.c_uint64]
        lib.dlog_flush.restype = ctypes.c_int
        lib.dlog_flush.argtypes = [ctypes.c_void_p]
        lib.dlog_records_written.restype = ctypes.c_longlong
        lib.dlog_records_written.argtypes = [ctypes.c_void_p]
        lib.dlog_close.restype = ctypes.c_int
        lib.dlog_close.argtypes = [ctypes.c_void_p]
        lib.dlog_info.restype = ctypes.c_longlong
        lib.dlog_info.argtypes = [ctypes.c_char_p,
                                  ctypes.POINTER(ctypes.c_uint64),
                                  ctypes.POINTER(ctypes.c_uint32)]
        lib.dlog_read.restype = ctypes.c_longlong
        lib.dlog_read.argtypes = [ctypes.c_char_p, ctypes.c_uint64,
                                  ctypes.c_uint64, ctypes.c_void_p]
        _lib = lib
        return lib


class DrawLogWriter:
    """Asynchronous flat-record writer (float32/float64)."""

    def __init__(self, path, record_elems, dtype=np.float64,
                 buffer_records=256):
        self._lib = _load()
        self._dtype = np.dtype(dtype)
        code = 1 if self._dtype == np.float64 else 0
        self._record_elems = int(record_elems)
        self._handle = self._lib.dlog_open(
            path.encode(), self._record_elems, code, buffer_records)
        if not self._handle:
            raise OSError(f"cannot open draw log {path}")

    def append(self, records):
        arr = np.ascontiguousarray(records, dtype=self._dtype)
        n = arr.size // self._record_elems
        assert arr.size == n * self._record_elems, (
            arr.shape, self._record_elems)
        rc = self._lib.dlog_append(
            self._handle, arr.ctypes.data_as(ctypes.c_void_p), n)
        if rc != 0:
            raise OSError("dlog_append failed")

    def flush(self):
        self._lib.dlog_flush(self._handle)

    @property
    def records_written(self):
        return int(self._lib.dlog_records_written(self._handle))

    def close(self):
        if self._handle:
            self._lib.dlog_close(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_draws(path, offset=0, n=None):
    """Read records [n, record_elems] from a draw log."""
    lib = _load()
    elems = ctypes.c_uint64()
    dtype_code = ctypes.c_uint32()
    total = lib.dlog_info(path.encode(), ctypes.byref(elems),
                          ctypes.byref(dtype_code))
    if total < 0:
        raise OSError(f"cannot read draw log {path}")
    n = total - offset if n is None else min(n, total - offset)
    dtype = np.float64 if dtype_code.value == 1 else np.float32
    out = np.empty((max(n, 0), elems.value), dtype)
    if n > 0:
        got = lib.dlog_read(path.encode(), offset, n,
                            out.ctypes.data_as(ctypes.c_void_p))
        out = out[:got]
    return out


class PytreeDrawLog:
    """Log a pytree of arrays per draw as one flat record; layout in a
    JSON sidecar so reads reconstruct the tree (the RListIoManager
    write-then-stream pattern for pytree states)."""

    def __init__(self, path, example_tree, dtype=np.float64,
                 buffer_records=256):
        import jax

        leaves, self._treedef = jax.tree_util.tree_flatten(example_tree)
        self._shapes = [tuple(np.shape(l)) for l in leaves]
        self._sizes = [int(np.prod(s)) if s else 1 for s in self._shapes]
        self.path = path
        record_elems = sum(self._sizes)
        with open(path + ".meta.json", "w") as f:
            json.dump({"shapes": [list(s) for s in self._shapes],
                       "dtype": np.dtype(dtype).name}, f)
        self._writer = DrawLogWriter(path, record_elems, dtype,
                                     buffer_records)

    def append(self, tree):
        import jax

        leaves = jax.tree_util.tree_leaves(tree)
        flat = np.concatenate(
            [np.ravel(np.asarray(l)) for l in leaves]) if leaves else (
            np.zeros(0))
        self._writer.append(flat)

    def append_batch(self, tree_batch, batch_size):
        """Append a stacked batch of draws (leading axis = draw)."""
        import jax

        leaves = jax.tree_util.tree_leaves(tree_batch)
        flat = np.concatenate(
            [np.asarray(l).reshape(batch_size, -1) for l in leaves],
            axis=1)
        self._writer.append(flat)

    def flush(self):
        self._writer.flush()

    def close(self):
        self._writer.close()

    def read(self, offset=0, n=None):
        """Returns the pytree with a leading draw axis."""
        import jax

        with open(self.path + ".meta.json") as f:
            meta = json.load(f)
        flat = read_draws(self.path, offset, n)
        out, pos = [], 0
        for shape in meta["shapes"]:
            size = int(np.prod(shape)) if shape else 1
            block = flat[:, pos:pos + size].reshape(
                (flat.shape[0],) + tuple(shape))
            out.append(block)
            pos += size
        return jax.tree_util.tree_unflatten(self._treedef, out)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
