"""Automated physical-plan audit over every entry query.

Builds each `__spark_entry__.queries()` DataFrame at sf0.001 (plans,
no execution — except queries that execute eagerly by design) and
counts the plan operators that encode the engine's scale claims:

- `BatchEvalPython`  — row-at-a-time Python (must be ZERO everywhere)
- `ArrowEvalPython`  — vectorized pandas UDFs (media codecs only)
- `Exchange`         — shuffles
- nested-loop / cartesian joins (only 1-row scalar attachments allowed)
- `WholeStageCodegen` spans (JVM-side execution)

Usage: python scripts/plan_audit.py [sf_dir] > BENCH/plan_audit_rN.md
"""

from __future__ import annotations

import re
import sys


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    sys.path.insert(0, ".")
    import __spark_entry__ as entry

    rows = []
    for name, fn in entry.queries().items():
        try:
            df = fn(spark, sf_dir)
            df.collect()  # materialize so AQE's FINAL plan is audited
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001 — audit must cover all
            rows.append((name, None, f"PLAN FAILED: {e}"))
            continue
        # a final AQE plan prints each shuffle subtree once under its
        # ShuffleQueryStage and again at reuse sites — count DISTINCT
        # exchange plan_ids, not raw occurrences
        ex_ids = set(re.findall(
            r"Exchange (?:hash|range|Single)\S*.*?\[plan_id=(\d+)\]",
            plan,
        ))
        counts = {
            "batch_py": len(re.findall(r"BatchEvalPython", plan)),
            # ArrowEvalPython prints no plan_id — dedupe on the UDF
            # expression list (reuse sites repeat it verbatim)
            "arrow_py": len(set(re.findall(
                r"ArrowEvalPython (\[[^]]*\])", plan))),
            "exchange": len(ex_ids),
            "bnlj": len(set(re.findall(
                r"BroadcastNestedLoopJoin.*?\[plan_id=(\d+)\]", plan))
                or re.findall(r"BroadcastNestedLoopJoin", plan)),
            "cartesian": len(re.findall(r"CartesianProduct", plan)),
            "codegen": len(set(re.findall(r"\*\((\d+)\)", plan))),
        }
        rows.append((name, counts, None))

    bad_py = [n for n, c, _ in rows if c and c["batch_py"]]
    failed = [(n, e) for n, c, e in rows if c is None]
    print("# Plan audit — all entry queries (executed plans, "
          f"{sf_dir})\n")
    print(f"Queries audited: {len(rows)}; "
          f"BatchEvalPython anywhere: {len(bad_py)} "
          f"({', '.join(bad_py) if bad_py else 'ZERO — invariant holds'})")
    if failed:
        print(f"\nPlan build failures: {failed}")
    print("\n| query | exchanges | arrow_py | bnlj | cartesian |"
          " codegen spans |")
    print("|---|---|---|---|---|---|")
    for name, c, _ in sorted(
        rows, key=lambda r: -(r[1] or {}).get("exchange", 0)
    ):
        if c is None:
            continue
        print(f"| {name} | {c['exchange']} | {c['arrow_py']} |"
              f" {c['bnlj']} | {c['cartesian']} | {c['codegen']} |")
    return 1 if bad_py or failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
