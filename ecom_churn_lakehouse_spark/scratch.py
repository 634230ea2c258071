"""Session-scoped scratch directories for queries that materialize
intermediates (streaming replays, MERGE lifecycle tables).

Repeated full-registry sweeps used to call ``tempfile.mkdtemp`` on
every invocation and never clean up, accumulating parquet snapshots on
disk for the life of the machine. All scratch now nests under ONE
process-wide root that is removed at interpreter exit; callers still
get a fresh, collision-free subdirectory per invocation.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_ROOT: str | None = None


def scratch_dir(prefix: str) -> str:
    """A fresh scratch directory, auto-removed at process exit."""
    global _ROOT
    if _ROOT is None:
        _ROOT = tempfile.mkdtemp(prefix="ecl_scratch_")
        atexit.register(shutil.rmtree, _ROOT, ignore_errors=True)
    return tempfile.mkdtemp(prefix=prefix, dir=_ROOT)
