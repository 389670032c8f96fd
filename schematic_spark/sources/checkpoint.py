"""Checkpoint / resume + per-partition lineage & metrics tables.

North rule: "resumable from Iceberg-snapshot checkpoints with
per-partition lineage + metrics tables" (BASELINE.json:6,14).

Model: a validation *run* processes a table in key-range partitions
(``bucket = pmod(xxhash64(doc_id), n_buckets)``). Each completed bucket
appends one lineage row; a resumed run skips buckets already marked
complete for the same (input snapshot, spec fingerprint) — idempotent
re-runs. Metrics rows carry the per-bucket verdict counts, so the
per-partition pass/fail report is a free groupBy over the metrics
table.

At 100 TB the bucket count is sized so each bucket is a few hundred GB
(n_buckets ≈ thousands); bucket filtering pushes down to the scan when
the table is clustered/bucketed by the same key.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .table_format import TableFormat
from ..schema.ast import SObject
from ..schema.parser import dump_spec
from ..validation import validate

LINEAGE_TABLE = "_schematic_lineage"
METRICS_TABLE = "_schematic_metrics"


def spec_fingerprint(schema: SObject) -> str:
    """Stable content hash of a spec — lineage keys on it so a spec
    change invalidates prior checkpoints."""
    blob = json.dumps(dump_spec(schema), sort_keys=True).encode()
    return hashlib.sha256(blob).hexdigest()[:16]


@dataclass
class CheckpointedRun:
    fmt: TableFormat
    run_id: str
    input_snapshot: str
    spec_fp: str
    n_buckets: int

    def completed_buckets(self, spark: SparkSession) -> set[int]:
        try:
            lineage = self.fmt.read(spark, LINEAGE_TABLE)
        except Exception:
            return set()
        rows = (
            lineage
            .where(
                (F.col("input_snapshot") == self.input_snapshot)
                & (F.col("spec_fp") == self.spec_fp)
                & (F.col("n_buckets") == self.n_buckets)
                & (F.col("status") == "complete")
            )
            .select("bucket")
            .collect()
        )
        return {r["bucket"] for r in rows}


def run_validation_checkpointed(
    spark: SparkSession,
    df: DataFrame,
    schema: SObject,
    fmt: TableFormat,
    *,
    key_col: str = "doc_id",
    n_buckets: int = 8,
    run_id: str = "run-0",
    input_snapshot: str = "unversioned",
    violations_table: str = "_schematic_violations",
) -> dict:
    """Validate bucket-by-bucket with resume.

    Already-complete buckets (same input snapshot + spec fingerprint)
    are skipped; each completed bucket appends violations, one metrics
    row, and one lineage row. Returns a summary dict with counts and
    the buckets processed vs skipped.
    """
    fp = spec_fingerprint(schema)
    run = CheckpointedRun(fmt, run_id, input_snapshot, fp, n_buckets)
    done = run.completed_buckets(spark)
    bucket_col = F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets))

    processed, skipped = [], []
    totals = {"Valid": 0, "ValidationError": 0, "DecodingError": 0}
    for b in range(n_buckets):
        if b in done:
            skipped.append(b)
            continue
        part = df.where(bucket_col == b)
        res = validate(part, schema)
        summary = {
            r["verdict"]: (r["n_rows"], r["n_violations"])
            for r in res.summary().collect()
        }
        viol = res.violations(key_col).withColumn("bucket", F.lit(b)) \
                  .withColumn("run_id", F.lit(run_id))
        fmt.write(viol, violations_table, mode="append")
        metrics_rows = [
            {
                "run_id": run_id,
                "input_snapshot": input_snapshot,
                "spec_fp": fp,
                "bucket": b,
                "verdict": v,
                "n_rows": int(n),
                "n_violations": int(nv),
            }
            for v, (n, nv) in summary.items()
        ]
        if metrics_rows:
            fmt.write(
                spark.createDataFrame(metrics_rows), METRICS_TABLE,
                mode="append",
            )
        lineage_row = spark.createDataFrame([{
            "run_id": run_id,
            "input_snapshot": input_snapshot,
            "spec_fp": fp,
            "n_buckets": n_buckets,
            "bucket": b,
            "status": "complete",
            "n_rows": int(sum(n for n, _ in summary.values())),
        }])
        fmt.write(lineage_row, LINEAGE_TABLE, mode="append")
        for v, (n, _) in summary.items():
            totals[v] = totals.get(v, 0) + int(n)
        processed.append(b)

    return {
        "run_id": run_id,
        "spec_fp": fp,
        "processed_buckets": processed,
        "skipped_buckets": skipped,
        "totals": totals,
    }


def partition_passfail(spark: SparkSession, fmt: TableFormat) -> DataFrame:
    """Per-partition pass/fail from the metrics table (no rescan)."""
    m = fmt.read(spark, METRICS_TABLE)
    return (
        m.groupBy("run_id", "input_snapshot", "spec_fp", "bucket")
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.sum(
                F.when(F.col("verdict") != "Valid", F.col("n_rows"))
                .otherwise(F.lit(0))
            ).alias("n_bad_rows"),
            F.sum("n_violations").alias("n_violations"),
        )
        .withColumn("passed", F.col("n_bad_rows") == 0)
    )
