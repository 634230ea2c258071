"""Config-driven data-quality check engine (SURVEY.md §2.11 D1–D8).

Generalizes the reference's ``src/common/dq.py`` (check compiler at
:19-39, runner at :42-92, report/quarantine at :95-119) plus its
hard-coded stage gates (range gate ``customer_features_daily.py:55-62``,
ordering gate ``:64-68``, domain gate ``labels.py:68``) into one
declarative engine: a check spec is a plain dict, compiled to a Column
predicate that selects BAD rows; the runner counts violations per
check in a single job, applies severity gating driver-side, and
optionally quarantines bounded failed-row samples.

Scale design: all checks over one input are evaluated in ONE pass —
a single aggregation of conditional counts — instead of the
reference's one-job-per-check recomputation (SURVEY §3.2 defect).
Failed-row sampling is bounded (``limit``) so quarantine never becomes
a second full scan's worth of output.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "compile_check",
    "run_checks",
    "observe_checks",
    "report_from_observation",
    "CheckResult",
    "DQReport",
]


def compile_check(spec: dict[str, Any]) -> Column:
    """Compile a check spec into a predicate selecting VIOLATING rows.

    Supported types (reference mapping in parentheses):
    - ``not_null``: OR-fold isNull over ``columns`` (D1, dq.py:19-28)
    - ``in_set``: NULL or outside ``allowed`` (D3, dq.py:38-39)
    - ``range``: outside [min, max]; NULL fails (D5,
      customer_features_daily.py:55-62)
    - ``ordering``: requires ``less <= greater``; violation when not
      (D6, customer_features_daily.py:64-68)
    - ``domain``: alias of in_set (D7, labels.py:68)
    - ``expr``: arbitrary SQL predicate string selecting bad rows (P8
      generalization)

    ``unique`` (D2) is group-based, handled separately in
    :func:`run_checks`.
    """
    t = spec["type"]
    if t == "not_null":
        bad = F.lit(False)
        for c in spec["columns"]:
            bad = bad | F.col(c).isNull()
        return bad
    if t in ("in_set", "domain"):
        c = F.col(spec["column"])
        return c.isNull() | ~c.isin(*spec["allowed"])
    if t == "range":
        c = F.col(spec["column"])
        bad = c.isNull()
        if "min" in spec:
            bad = bad | (c < F.lit(spec["min"]))
        if "max" in spec:
            bad = bad | (c > F.lit(spec["max"]))
        return bad
    if t == "ordering":
        # NULL on either side fails explicitly (consistent with `range`):
        # ~(less <= greater) alone is NULL-for-NULL inputs, which the
        # conditional counter in run_checks would treat as a pass.
        less, greater = F.col(spec["less"]), F.col(spec["greater"])
        return less.isNull() | greater.isNull() | ~(less <= greater)
    if t == "expr":
        return F.expr(spec["predicate"])
    raise ValueError(f"unknown check type {t!r}")


@dataclass
class CheckResult:
    name: str
    check_type: str
    severity: str
    bad_rows: int
    passed: bool


@dataclass
class DQReport:
    row_count: int
    results: list[CheckResult] = field(default_factory=list)

    @property
    def blocking_failures(self) -> list[CheckResult]:
        return [r for r in self.results if not r.passed and r.severity == "critical"]

    @property
    def ok(self) -> bool:
        return not self.blocking_failures

    def to_dict(self) -> dict[str, Any]:
        return {
            "row_count": self.row_count,
            "ok": self.ok,
            "checks": [vars(r) for r in self.results],
        }

    def write_json(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=2)


def assert_single_value(df: DataFrame, column: str) -> Any:
    """A8 single-distinct-value assertion (version homogeneity gate,
    build_training_snapshot.py:32-38 / train_stub.py:44-50): the column
    must hold exactly one distinct value across the frame; returns it.
    Bounded driver work: collects at most 2 rows."""
    vals = [r[0] for r in df.select(column).distinct().limit(2).collect()]
    if len(vals) != 1:
        raise ValueError(
            f"column {column!r} must be homogeneous; found "
            + ("no rows" if not vals else f"multiple values (e.g. {vals})")
        )
    return vals[0]


def observe_checks(df: DataFrame, checks: list[dict[str, Any]]):
    """Attach row-predicate checks as an ``Observation`` — ZERO extra scans.

    :func:`run_checks` costs one dedicated aggregation job per table;
    at 100 TB that is a full extra scan before every publish. This
    variant rides the metrics on whatever action consumes the returned
    DataFrame (e.g. the publish write itself): Spark's observe API
    accumulates the conditional counts on the executors as rows stream
    through, for free.

    Returns ``(observed_df, observation)``; feed the observation to
    :func:`report_from_observation` AFTER the action has run. Only
    row-predicate checks are supported (``unique`` is group-based and
    still needs its own pass — or an approx_count_distinct screen).
    """
    from pyspark.sql import Observation

    row_checks = [c for c in checks if c["type"] != "unique"]
    if len(row_checks) != len(checks):
        raise ValueError("observe_checks supports row-predicate checks only")
    obs = Observation()
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, spec in enumerate(row_checks):
        bad = compile_check(spec)
        aggs.append(
            F.coalesce(F.sum(F.when(bad, 1).otherwise(0)), F.lit(0)).alias(f"__c{i}")
        )
    return df.observe(obs, *aggs), obs


def report_from_observation(obs, checks: list[dict[str, Any]]) -> DQReport:
    """Build a :class:`DQReport` from a completed observation."""
    got = obs.get
    report = DQReport(row_count=int(got["__n"]))
    for i, spec in enumerate(checks):
        bad_rows = int(got[f"__c{i}"])
        report.results.append(
            CheckResult(
                name=spec.get("name", f"{spec['type']}_{i}"),
                check_type=spec["type"],
                severity=spec.get("severity", "critical"),
                bad_rows=bad_rows,
                passed=bad_rows == 0,
            )
        )
    return report


def run_checks(
    df: DataFrame,
    checks: list[dict[str, Any]],
    quarantine_dir: str | None = None,
    sample_rows: int = 100,
) -> DQReport:
    """Evaluate all checks; return a report with severity gating applied.

    Row-predicate checks are fused into ONE aggregation job
    (conditional sums), unlike the reference's per-check jobs. Unique
    checks each need a groupBy. Quarantine (D8) writes at most
    ``sample_rows`` violating rows per failed check as parquet.
    """
    row_checks = [c for c in checks if c["type"] != "unique"]
    unique_checks = [c for c in checks if c["type"] == "unique"]

    agg_cols = [F.count("*").alias("__n")]
    predicates: list[Column] = []
    for i, spec in enumerate(row_checks):
        bad = compile_check(spec)
        predicates.append(bad)
        # coalesce: SUM over an empty frame is NULL, not 0
        agg_cols.append(
            F.coalesce(F.sum(F.when(bad, 1).otherwise(0)), F.lit(0)).alias(f"__c{i}")
        )
    counts = df.agg(*agg_cols).collect()[0]

    report = DQReport(row_count=int(counts["__n"]))
    for i, spec in enumerate(row_checks):
        bad_rows = int(counts[f"__c{i}"])
        report.results.append(
            CheckResult(
                name=spec.get("name", f"{spec['type']}_{i}"),
                check_type=spec["type"],
                severity=spec.get("severity", "critical"),
                bad_rows=bad_rows,
                passed=bad_rows == 0,
            )
        )
        if bad_rows and quarantine_dir:
            df.filter(predicates[i]).limit(sample_rows).write.mode(
                "overwrite"
            ).parquet(f"{quarantine_dir}/{report.results[-1].name}")

    for spec in unique_checks:
        keys = spec["keys"]
        dup_groups = df.groupBy(*keys).count().filter(F.col("count") > 1)
        n_dup_groups = dup_groups.count()
        report.results.append(
            CheckResult(
                name=spec.get("name", "unique_" + "_".join(keys)),
                check_type="unique",
                severity=spec.get("severity", "critical"),
                bad_rows=n_dup_groups,
                passed=n_dup_groups == 0,
            )
        )
        if n_dup_groups and quarantine_dir:
            # Failed-row extraction via semi-join back to the duplicate
            # key set (J5, dq.py:31-35).
            df.join(
                dup_groups.select(*keys), on=keys, how="left_semi"
            ).limit(sample_rows).write.mode("overwrite").parquet(
                f"{quarantine_dir}/{report.results[-1].name}"
            )

    return report
