"""Schema/contract fingerprinting (reference ``src/common/versioning.py:9-20``).

Canonical-JSON SHA-256 truncated to 16 hex chars; fingerprints ride
along as data columns (``_schema_version``, ``_feature_version``, …)
and gate cross-stage compatibility. Driver-side (metadata plane) —
row-scale hashing uses ``F.sha2`` instead (SURVEY §2.3 note).
"""

from __future__ import annotations

import hashlib
import json
from typing import Any

__all__ = ["canonical_hash", "schema_hash", "file_fingerprint"]


def canonical_hash(obj: Any, length: int = 16) -> str:
    """sha256 of the canonical (sorted-keys, compact) JSON encoding."""
    blob = json.dumps(obj, sort_keys=True, separators=(",", ":"))
    return hashlib.sha256(blob.encode("utf-8")).hexdigest()[:length]


def schema_hash(df_schema_json: str, length: int = 16) -> str:
    """Fingerprint of a DataFrame schema (build_training_snapshot.py:41-43)."""
    return canonical_hash(json.loads(df_schema_json), length)


def file_fingerprint(files: list[tuple[str, int, float]], length: int = 16) -> str:
    """Source fingerprint from (path, size, mtime) triples
    (orders_to_bronze.py:79-101) — the bronze idempotency key."""
    return canonical_hash(sorted(files), length)
