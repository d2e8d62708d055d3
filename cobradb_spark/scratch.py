"""Session-scoped scratch space for query materializations.

Query callables that need a local directory (TSV write-then-read,
parquet/ORC sinks, streaming replay sources, bucketed warehouses)
allocate it here instead of bare tempfile.mkdtemp: one root per
process, removed atexit, so repeated registry/bench/correctness runs
do not accumulate unbounded temp data (round-1 ADVICE item).

The staged data is verification plumbing only — in production these
DAGs point at real warehouse paths / sources and nothing here runs.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile
import threading

_ROOT: str | None = None
_LOCK = threading.Lock()


def scratch_root() -> str:
    """Lazily created per-process root, removed at interpreter exit.

    Lock-guarded: two threads racing the first call would otherwise each
    mkdtemp a root and hand out directories across different roots
    (round-2 ADVICE item)."""
    global _ROOT
    with _LOCK:
        if _ROOT is None:
            _ROOT = tempfile.mkdtemp(prefix="cobradb_scratch_")
            atexit.register(shutil.rmtree, _ROOT, ignore_errors=True)
        return _ROOT


def scratch_dir(prefix: str) -> str:
    """A fresh directory under the session root (unique per call)."""
    return tempfile.mkdtemp(prefix=prefix, dir=scratch_root())
