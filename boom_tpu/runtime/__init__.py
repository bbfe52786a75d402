"""Native runtime components (C++ with ctypes bindings).

Reference: the C++ runtime layer of SURVEY.md §2.1 — ParamFileIoManager,
RListIoManager write/stream — rebuilt as an asynchronous draw log."""

from boom_tpu.runtime.drawlog import (
    DrawLogWriter,
    PytreeDrawLog,
    read_draws,
)

__all__ = ["DrawLogWriter", "PytreeDrawLog", "read_draws"]
