"""Range (interval) join — engine extension (SURVEY §2.6 absent-list).

Matches each left row with right rows of the same key whose timestamp
falls in ``(left_ts + lower, left_ts + upper]``. Spark's naive plan for
a range predicate inside a join is a per-key cross product; this
operator uses time binning instead:

1. choose bin width = window span (upper − lower);
2. each left row lands in one bin; each right row is replicated into
   the (at most 2) bins whose left-windows could reach it;
3. equi-join on (key, bin) — bucket-local — then apply the exact
   range predicate.

Cost: one shuffle of |L| + 2|R| rows on (key, bin); within-bin work is
bounded by bin population, never |L|×|R| per key. The standard
interval-join design (cf. Flink's interval join); at 100 TB pick bins
so each holds seconds-to-minutes of data per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_join"]


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    lower_s: float,
    upper_s: float,
    how: str = "inner",
) -> DataFrame:
    """Interval join: right rows with ``right_ts ∈ (left_ts+lower, left_ts+upper]``.

    ``lower_s``/``upper_s`` are seconds (negative = before left_ts).
    ``how`` is ``inner`` or ``left`` (left rows with no match survive
    with null right columns). Right columns must not collide with left
    columns (rename beforehand).
    """
    if upper_s <= lower_s:
        raise ValueError("upper_s must be > lower_s")
    if how not in ("inner", "left"):
        raise ValueError("interval_join supports inner/left joins")
    span_us = int(round((upper_s - lower_s) * 1_000_000))
    lower_us = int(round(lower_s * 1_000_000))
    upper_us = int(round(upper_s * 1_000_000))

    l_us = F.unix_micros(F.col(left_ts))
    r_us = F.unix_micros(F.col(right_ts))

    # Shift right timestamps by `lower` so the match window becomes
    # (L, L+span]: with bins of width span, a shifted right time R'
    # satisfying R' ∈ (L, L+span] has floor(R'/span) ∈
    # {floor(L/span), floor(L/span)+1} — so replicating each right row
    # into its own bin and the previous one guarantees every true
    # match co-locates with its left bin.
    l_binned = left.withColumn("__bin", F.floor(l_us / F.lit(span_us)).cast("long"))
    r_bin0 = F.floor((r_us - F.lit(lower_us)) / F.lit(span_us)).cast("long")
    r_binned = right.withColumn("__bin", F.explode(F.array(r_bin0 - 1, r_bin0)))

    # One expression-form join serves BOTH modes. Correctness of the
    # left join hinges on each left row landing in exactly ONE bin (a
    # right row is replicated, but only the replica in the left row's
    # bin can satisfy the condition, so no duplicate matches) — which
    # means unmatched left rows emit exactly once with null right
    # payload, with no anti-join reattachment pass, no surrogate ids,
    # and no dependence on nondeterministic id assignment across stage
    # recomputation.
    la, ra = l_binned.alias("__l"), r_binned.alias("__r")
    cond = F.col("__l.__bin") == F.col("__r.__bin")
    for k in on:
        cond = cond & (F.col(f"__l.{k}") == F.col(f"__r.{k}"))
    lu, ru = (
        F.unix_micros(F.col(f"__l.{left_ts}")),
        F.unix_micros(F.col(f"__r.{right_ts}")),
    )
    cond = cond & (ru > lu + F.lit(lower_us)) & (ru <= lu + F.lit(upper_us))
    right_cols = [c for c in right.columns if c not in on]
    return la.join(ra, cond, how).select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        *[F.col(f"__r.{c}").alias(c) for c in right_cols],
    )
