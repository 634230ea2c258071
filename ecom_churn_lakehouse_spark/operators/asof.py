"""As-of (point-in-time) join — engine extension (SURVEY.md §4, §7.7).

Spark has no native ASOF join. The naive composition — range join
``l.ts >= r.ts`` then argmax per left row — is a cross-product within
each key and collapses at scale. This operator uses the union+window
formulation instead:

1. tag right rows side=0, left rows side=1;
2. union by name (missing columns null-filled);
3. per key, ordered by (ts, side), carry the last non-null right
   payload forward with ``last(..., ignorenulls=True)`` over
   ``rowsBetween(unboundedPreceding, currentRow)``;
4. keep left rows.

Cost: ONE shuffle of |L|+|R| rows on the join key — linear, skew-safe
under AQE, no row explosion. Ordering (ts, side) gives right-row
priority at equal timestamps, i.e. ``r.ts <= l.ts`` (backward-inclusive)
semantics, matching DuckDB's ``ASOF JOIN ... ON r.ts <= l.ts`` oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload: dict[str, str],
    right_order: list[str] | None = None,
) -> DataFrame:
    """Backward-inclusive as-of left join.

    For each left row, attach the payload of the newest right row with
    the same ``on`` keys and ``right[right_ts] <= left[left_ts]``; null
    when no such row exists.

    ``payload`` maps right-column → output-column names (output names
    must not collide with left columns). ``right_order`` optionally
    adds deterministic tie-break columns for right rows sharing a
    timestamp (defaults to none — ties then resolve arbitrarily, like
    a native ASOF join would).
    """
    ts = "__asof_ts"
    side = "__asof_side"
    tie = right_order or []

    r = right.select(
        *on,
        F.col(right_ts).alias(ts),
        F.lit(0).alias(side),
        *[F.col(src).alias(f"__p_{dst}") for src, dst in payload.items()],
        *[F.col(c).alias(f"__tie_{c}") for c in tie],
    )
    l = left.withColumn(ts, F.col(left_ts)).withColumn(side, F.lit(1))

    combined = l.unionByName(r, allowMissingColumns=True)

    w = (
        Window.partitionBy(*on)
        .orderBy(ts, side, *[F.col(f"__tie_{c}") for c in tie])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for _, dst in payload.items():
        combined = combined.withColumn(
            dst, F.last(F.col(f"__p_{dst}"), ignorenulls=True).over(w)
        )

    drop = (
        [ts, side]
        + [f"__p_{dst}" for dst in payload.values()]
        + [f"__tie_{c}" for c in tie]
    )
    return combined.filter(F.col(side) == 1).drop(*drop)
