"""spark-submit entrypoint — the production shape of the engine.

Package and run::

    cd /root/repo && zip -r /tmp/schematic_spark.zip schematic_spark
    spark-submit --py-files /tmp/schematic_spark.zip \\
        scripts/run_validation_job.py \\
        --input /path/to/table_or_parquet \\
        --spec /path/to/spec.json \\
        --output-root /path/to/results \\
        --key-col doc_id --n-buckets 256 \\
        --run-id run-2026-08-16 --input-snapshot snap-001 \\
        [--resume]

Reads the input (Iceberg table name or parquet path), validates it
bucket-by-bucket with checkpoint/resume, writes violations + metrics +
lineage tables through the TableFormat layer, and prints a JSON
summary. Cluster configs (AQE, shuffle partitions, Arrow) are set
spark-submit-side or fall back to the defaults below.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True,
                   help="iceberg table name or parquet path")
    p.add_argument("--spec", required=True, help="JSON spec file")
    p.add_argument("--output-root", required=True,
                   help="root for violations/metrics/lineage tables")
    p.add_argument("--key-col", default="doc_id")
    p.add_argument("--n-buckets", type=int, default=256)
    p.add_argument("--run-id", default="run-0")
    p.add_argument("--input-snapshot", default="unversioned")
    p.add_argument("--resume", action="store_true",
                   help="skip buckets already complete (default on; "
                        "flag kept for explicitness)")
    p.add_argument("--commit-every", type=int, default=None,
                   help="commit lineage per wave of N buckets (crash "
                        "loses at most one wave; use when the input is "
                        "clustered by the key so wave filters prune)")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder
        .appName(f"schematic-validate-{args.run_id}")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )

    from schematic_spark.schema.parser import parse_spec
    from schematic_spark.sources import (
        resolve_format, run_validation_checkpointed,
    )

    with open(args.spec) as f:
        schema = parse_spec(json.load(f))

    if args.input.endswith(".parquet") or "/" in args.input:
        df = spark.read.parquet(args.input)
    else:
        df = spark.table(args.input)

    fmt = resolve_format(spark, parquet_root=args.output_root)
    result = run_validation_checkpointed(
        spark, df, schema, fmt,
        key_col=args.key_col,
        n_buckets=args.n_buckets,
        run_id=args.run_id,
        input_snapshot=args.input_snapshot,
        commit_every=args.commit_every,
    )
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
