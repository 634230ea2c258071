"""Generate QUERIES.md — the user-facing catalog of every registry
entry: name, verification tier, and the operator doc.

Usage: python tools/list_queries.py > QUERIES.md
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from ecom_churn_lakehouse_spark import registry

    registry.queries()  # force load
    entries = registry._REGISTRY
    print("# Query catalog\n")
    print(
        f"{len(entries)} registry entries. Every entry is a Python callable\n"
        "`(spark, sf_dir) -> DataFrame`; “oracle” means the DuckDB twin\n"
        "hash-verifies rows/schema/values at sf0.01, “rows” means the\n"
        "driver records a rows-only check (non-SQL-expressible op) with\n"
        "values pinned by pytest instead.\n"
    )
    for name in sorted(entries):
        e = entries[name]
        tier = "oracle" if e.oracle is not None else "rows"
        doc = " ".join((e.doc or "").split())
        print(f"## `{name}`  _({tier})_\n\n{doc}\n")


if __name__ == "__main__":
    main()
