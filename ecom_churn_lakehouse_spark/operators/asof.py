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
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Direction-aware inclusive as-of left join.

    For each left row, attach the payload of the nearest right row with
    the same ``on`` keys and — ``direction="backward"`` (default) —
    ``right[right_ts] <= left[left_ts]`` (the newest such row), or —
    ``direction="forward"`` — ``right[right_ts] >= left[left_ts]`` (the
    earliest such row); null when no such row exists.

    ``payload`` maps right-column → output-column names (output names
    must not collide with left columns). ``right_order`` optionally
    adds deterministic tie-break columns for right rows sharing a
    timestamp (defaults to none — ties then resolve arbitrarily, like
    a native ASOF join would): backward keeps the tie-break MAX,
    forward the tie-break MIN (arg_min-like).

    ``tolerance_seconds`` bounds the match distance: a matched right
    row farther than this from the left timestamp is discarded (payload
    nulled), like pandas ``merge_asof(tolerance=...)``. The same
    one-shuffle union+window plan runs; the bound is a post-filter on
    the carried match timestamp, not a second join.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    ts = "__asof_ts"
    side = "__asof_side"
    matched = "__asof_matched_ts"
    tie = right_order or []

    r = right.select(
        *on,
        F.col(right_ts).alias(ts),
        F.lit(0).alias(side),
        F.col(right_ts).alias(f"__p_{matched}"),
        *[F.col(src).alias(f"__p_{dst}") for src, dst in payload.items()],
        *[F.col(c).alias(f"__tie_{c}") for c in tie],
    )
    l = left.withColumn(ts, F.col(left_ts)).withColumn(side, F.lit(1))

    combined = l.unionByName(r, allowMissingColumns=True)

    # Traversal order: backward walks time ascending so last() holds the
    # newest right row <= the left row; forward walks time DESCENDING so
    # last() holds the earliest right row >= the left row. In both cases
    # (side, ties) order right rows before the left row at equal
    # timestamps (inclusive match), with the tie direction flipped in
    # forward mode so the minimal tie-break is the survivor.
    if direction == "backward":
        order = [F.col(ts).asc(), F.col(side).asc()] + [
            F.col(f"__tie_{c}").asc() for c in tie
        ]
    else:
        order = [F.col(ts).desc(), F.col(side).asc()] + [
            F.col(f"__tie_{c}").desc() for c in tie
        ]
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = {matched: None, **{dst: None for dst in payload.values()}}
    for dst in carried:
        combined = combined.withColumn(
            dst, F.last(F.col(f"__p_{dst}"), ignorenulls=True).over(w)
        )

    out = combined.filter(F.col(side) == 1)
    if tolerance_seconds is not None:
        within = (
            F.abs(
                F.col(matched).cast("double") - F.col(left_ts).cast("double")
            )
            <= F.lit(float(tolerance_seconds))
        )
        for dst in payload.values():
            out = out.withColumn(dst, F.when(within, F.col(dst)))

    drop = (
        [ts, side, matched, f"__p_{matched}"]
        + [f"__p_{dst}" for dst in payload.values()]
        + [f"__tie_{c}" for c in tie]
    )
    return out.drop(*drop)
