"""Extra benchmarks for optimization work (guide §1.4 noop-sink
isolation). NOT the driver's bench — bench.py stays the frozen
measurement; this file only produces evidence for OPTIMIZATION_r06.md.

Usage:
  python bench_extra.py suite        # decompose fused-suite job 1
  python bench_extra.py queries q1,q2[,..] [repeats]   # per-query min
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, BENCH_N_DOCS as in bench.py.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _timed(label, fn, spark, out, repeats=3):
    times = []
    for _ in range(repeats):
        spark.sparkContext.setJobDescription(label)
        t = time.time()
        fn()
        times.append(round(time.time() - t, 3))
        spark.sparkContext.setJobDescription(None)
    out[label] = {"min": min(times), "samples": times}
    print(f"{label}: min={min(times)} samples={times}", flush=True)


def suite_decomp(spark, n_docs):
    import shutil

    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    import bench
    from schematic_spark.generator import (
        INTERLEAVED_SPEC, non_monotonic_flag,
    )
    from schematic_spark.suite.fused import _VERDICTS
    from schematic_spark.suite.stats import column_stat_aggs
    from schematic_spark.suite.uniqueness import duplicate_keys_salted
    from schematic_spark.validation import (
        VERDICT_COL, VIOLATIONS_COL, validate,
    )

    docs, base_docs, media, t_gen, tmp, keep, _ = \
        bench._materialize_inputs(spark, n_docs)
    out = {}
    try:
        _timed("scan_only_noop", lambda: _noop(docs), spark, out)
        ann = validate(docs, INTERLEAVED_SPEC).annotated
        _timed("validate_noop", lambda: _noop(ann), spark, out)
        _timed(
            "dup_salted_raw",
            lambda: duplicate_keys_salted(
                docs, "doc_id", salt_buckets=64).count(),
            spark, out,
        )
        _timed(
            "dup_salted_over_validate",
            lambda: duplicate_keys_salted(
                ann, "doc_id", salt_buckets=64).count(),
            spark, out,
        )

        fields = {f.name: f.dataType for f in docs.schema.fields}
        columns = list(fields)

        def job1():
            obs1 = Observation()
            exprs = [
                F.sum((F.col(VERDICT_COL) == v).cast("long"))
                .alias(f"__verdict_{v}")
                for v in _VERDICTS
            ]
            exprs.append(
                F.sum(F.size(VIOLATIONS_COL)).alias("__n_violations"))
            exprs.append(
                F.sum(non_monotonic_flag("spans").cast("long"))
                .alias("__n_nonmono"))
            exprs.extend(column_stat_aggs(fields, columns))
            duplicate_keys_salted(
                ann.observe(obs1, *exprs), "doc_id", salt_buckets=64
            ).count()
            obs1.get

        _timed("job1_full", job1, spark, out)

        # observe WITHOUT column stats (isolate the stats-agg cost)
        def job1_nostats():
            obs1 = Observation()
            exprs = [
                F.sum((F.col(VERDICT_COL) == v).cast("long"))
                .alias(f"__verdict_{v}")
                for v in _VERDICTS
            ]
            exprs.append(
                F.sum(F.size(VIOLATIONS_COL)).alias("__n_violations"))
            exprs.append(
                F.sum(non_monotonic_flag("spans").cast("long"))
                .alias("__n_nonmono"))
            duplicate_keys_salted(
                ann.observe(obs1, *exprs), "doc_id", salt_buckets=64
            ).count()
            obs1.get

        _timed("job1_no_colstats", job1_nostats, spark, out)
    finally:
        if not keep:
            shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out))


def time_queries(spark, names, repeats):
    import __spark_entry__ as entry

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    qs = entry.queries()
    out = {}
    for name in names:
        fn = qs[name]
        _timed(
            name, lambda: fn(spark, sf_dir).collect(), spark, out,
            repeats=repeats,
        )
    print(json.dumps(out))


def main():
    import bench

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_docs = int(os.environ.get("BENCH_N_DOCS", "300000"))
    spark = bench.build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    mode = sys.argv[1] if len(sys.argv) > 1 else "suite"
    if mode == "suite":
        suite_decomp(spark, n_docs)
    elif mode == "queries":
        names = sys.argv[2].split(",")
        repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3
        time_queries(spark, names, repeats)
    else:
        raise SystemExit(f"unknown mode {mode!r}")


if __name__ == "__main__":
    main()
