"""Session-scoped scratch directories for op fixtures.

Several ops materialize round-trip fixtures (JSONL/CSV/ORC exports,
streaming source dirs, checkpoints) on local disk. r3 created each with a
bare ``tempfile.mkdtemp`` and never removed them, so repeated local runs
accumulated orphaned ``/tmp/aispark_*`` trees (ADVICE r3). Every fixture now
lives under ONE per-process root that is removed at interpreter exit —
individual ops keep their unique subdirectory (concurrent calls never
collide) and cleanup is a single rmtree.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_ROOT: str | None = None


def scratch_root() -> str:
    """The process-lifetime scratch root (created on first use)."""
    global _ROOT
    if _ROOT is None:
        _ROOT = tempfile.mkdtemp(prefix="aispark_scratch_")
        atexit.register(shutil.rmtree, _ROOT, ignore_errors=True)
    return _ROOT


def scratch_dir(prefix: str) -> str:
    """A fresh unique directory under the process-lifetime scratch root."""
    return tempfile.mkdtemp(prefix=prefix, dir=scratch_root())
