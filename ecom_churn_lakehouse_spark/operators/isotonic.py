"""Isotonic (PAV) calibration as a grouped ``applyInPandas`` operator.

Pool-adjacent-violators is inherently sequential (each merge depends
on the previous), so it is the textbook case for the grouped-map
Pandas API rather than relational expressions. The SCALABLE shape is
two-stage:

1. a relational pre-bin: (group, score_bin) -> (n, y_sum) — one
   map-side-combinable aggregate that bounds what Python ever sees to
   |groups| x |bins| rows regardless of input size (the same move
   score_calibration_bins makes);
2. PAV over the tiny binned relation inside ``applyInPandas`` — one
   Arrow batch per group, integer arithmetic only (violations are
   detected by cross-multiplication, never by comparing float rates),
   so the fit is bit-deterministic at any parallelism.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["isotonic_fit_binned", "pav_blocks"]

ISOTONIC_SCHEMA = T.StructType(
    [
        T.StructField("group_key", T.StringType(), False),
        T.StructField("score_bin", T.LongType(), False),
        T.StructField("n", T.LongType(), False),
        T.StructField("y_sum", T.LongType(), False),
        T.StructField("block_idx", T.IntegerType(), False),
        T.StructField("fitted_rate_ppm", T.LongType(), False),
    ]
)


def pav_blocks(
    bins: Iterable[tuple[int, int, int]],
) -> list[tuple[int, int, int, int]]:
    """Pool-adjacent-violators over ``(bin, n, y_sum)`` sorted by bin.

    Returns blocks ``(bin_lo, bin_hi, n, y_sum)`` with non-decreasing
    y_sum/n. Violations compare via integer cross-multiplication:
    exact, so the pooling sequence (and therefore the fit) is
    identical on every machine.
    """
    blocks: list[list[int]] = []  # [bin_lo, bin_hi, n, y_sum]
    for b, n, y in sorted(bins):
        blocks.append([b, b, n, y])
        # merge while previous rate > current rate: y1/n1 > y2/n2
        # <=> y1*n2 > y2*n1 (all non-negative integers)
        while (
            len(blocks) >= 2
            and blocks[-2][3] * blocks[-1][2]
            > blocks[-1][3] * blocks[-2][2]
        ):
            lo2, hi2, n2, y2 = blocks.pop()
            blocks[-1][1] = hi2
            blocks[-1][2] += n2
            blocks[-1][3] += y2
    return [tuple(b) for b in blocks]


def isotonic_fit_binned(
    binned: DataFrame,
    group_col: str = "group_key",
    bin_col: str = "score_bin",
    n_col: str = "n",
    y_col: str = "y_sum",
) -> DataFrame:
    """Per-group isotonic fit over a pre-binned (group, bin, n, y_sum)
    relation; returns one row PER INPUT BIN carrying its pooled
    block's index and fitted rate in exact integer ppm (floor
    division, non-negative — and floor commutes with min/max, which
    is what lets a SQL minimax formulation oracle-verify the PAV
    output bit-for-bit)."""

    def _fit(pdf: pd.DataFrame) -> pd.DataFrame:
        key = str(pdf[group_col].iloc[0])
        rows_in = sorted(
            (int(r[bin_col]), int(r[n_col]), int(r[y_col]))
            for _, r in pdf.iterrows()
        )
        blocks = pav_blocks(rows_in)
        out = []
        for i, (lo, hi, bn, by) in enumerate(blocks):
            for b, n, y in rows_in:
                if lo <= b <= hi:
                    out.append(
                        {
                            "group_key": key,
                            "score_bin": b,
                            "n": n,
                            "y_sum": y,
                            "block_idx": i,
                            "fitted_rate_ppm": (by * 1_000_000) // bn,
                        }
                    )
        return pd.DataFrame(out)

    return (
        binned.select(
            F.col(group_col).cast("string").alias(group_col),
            F.col(bin_col).cast("long").alias(bin_col),
            F.col(n_col).cast("long").alias(n_col),
            F.col(y_col).cast("long").alias(y_col),
        )
        .groupBy(group_col)
        .applyInPandas(_fit, schema=ISOTONIC_SCHEMA)
    )
