"""Structured JSON-line pipeline logging (reference
``src/common/pipeline_logging.py:13-25`` parity).

One event per line on stderr: machine-parseable, safe to interleave
with Spark's own logs, carries the run id through every stage event.
"""

from __future__ import annotations

import json
import sys
import time
from typing import Any

__all__ = ["log_event"]


def log_event(event: str, run_id: str | None = None, **fields: Any) -> None:
    record: dict[str, Any] = {"event": event, "ts": round(time.time(), 3)}
    if run_id is not None:
        record["run_id"] = run_id
    record.update(fields)
    print(json.dumps(record, default=str), file=sys.stderr, flush=True)
