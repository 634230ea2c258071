"""Physical-plan audit over the query registry.

For every registered query, prints the plan-shape facts that matter at
100 TB — scan count, pushed filters, join strategies, exchanges,
whole-stage codegen — and flags smells:

- CartesianProduct (non-broadcast cross product)
- scans with empty PushedFilters where the query filters that table
- row-at-a-time Python (BatchEvalPython) in the plan

Usage: python tools/audit_plans.py [sf_dir] [query ...]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")


def audit(plan: str) -> dict:
    return {
        "scans": plan.count("Scan parquet"),
        "pushed": len(re.findall(r"PushedFilters: \[[^\]]", plan)),
        "bhj": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
        "bnlj": plan.count("BroadcastNestedLoopJoin"),
        "cartesian": plan.count("CartesianProduct"),
        "exchanges": plan.count("+- Exchange"),
        "codegen": "codegen id" in plan,  # Spark 4 formatted-mode marker
        "python": plan.count("BatchEvalPython") + plan.count("ArrowEvalPython"),
        "expand": plan.count("Expand"),
        "window_limit": plan.count("WindowGroupLimit"),
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from ecom_churn_lakehouse_spark import registry
    from ecom_churn_lakehouse_spark.session import get_spark

    spark = get_spark("plan-audit", extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")

    smells = 0
    print(f"{'query':32} scans pushed bhj smj bnlj cart exch wsc py")
    for name, fn in registry.queries().items():
        if only and name not in only:
            continue
        if name == "stream_tumbling_daily":
            continue  # streaming: plan forms at runtime
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().explainString(mode)
        except Exception as e:  # noqa: BLE001
            print(f"{name:32} ERROR {e}")
            smells += 1
            continue
        a = audit(plan)
        flags = []
        if a["cartesian"]:
            flags.append("CARTESIAN")
        if a["python"]:
            flags.append("PYTHON-IN-PLAN")
        # NOTE: 'wsc' column is informational only — AQE-wrapped plans
        # (anything with an exchange) only materialize WholeStageCodegen
        # nodes at runtime, so its absence pre-execution is not a smell.
        smells += bool(flags)
        print(
            f"{name:32} {a['scans']//2:5} {a['pushed']//2:6} {a['bhj']//2:3} "
            f"{a['smj']//2:3} {a['bnlj']//2:4} {a['cartesian']//2:4} "
            f"{a['exchanges']:4} {'y' if a['codegen'] else 'N':3} "
            f"{a['python']//2:2} {' '.join(flags)}"
        )
    print(f"\n{smells} queries with smells")
    return 1 if smells else 0


if __name__ == "__main__":
    raise SystemExit(main())
