"""Wide-schema compile-scale canary — the engine analog of the
reference's 130-field record test (LensSpec.hs:33-164), which guards
against type-level compile blowup. Here the risk is physical: one
projection carrying 130 columns x constraints must stay inside
whole-stage codegen's 64KB method limit (or degrade gracefully), stay
shuffle-free, and still report exact per-field violations."""

from __future__ import annotations

from pyspark.sql import functions as F

from schematic_spark.schema import (
    NGe,
    NLe,
    SNumber,
    SObject,
    SText,
    TGe,
    TLe,
)
from schematic_spark.validation import validate

N_FIELDS = 130


def _wide_spec():
    fields = []
    for i in range(N_FIELDS):
        if i % 2 == 0:
            fields.append((f"t{i}", SText((TGe(1), TLe(50)))))
        else:
            fields.append((f"n{i}", SNumber((NGe(0), NLe(1000)))))
    return SObject(tuple(fields))


def _wide_df(spark, n_rows=50):
    cols = []
    for i in range(N_FIELDS):
        if i % 2 == 0:
            cols.append(F.concat(F.lit(f"v{i}_"),
                                 (F.col("id") % 7).cast("string"))
                        .alias(f"t{i}"))
        else:
            cols.append((F.col("id") % 900).cast("double").alias(f"n{i}"))
    return spark.range(n_rows).select(*cols)


def test_wide_schema_compiles_and_validates_clean(spark):
    df = _wide_df(spark)
    res = validate(df, _wide_spec())
    summary = {r["verdict"]: r["n_rows"] for r in res.summary().collect()}
    assert summary == {"Valid": 50}


def test_wide_schema_reports_exact_field_violations(spark):
    df = _wide_df(spark, n_rows=10).withColumn(
        "t0", F.when(F.col("n1") == 0, F.lit("")).otherwise(F.col("t0"))
    ).withColumn(
        "n129", F.when(F.col("n1") == 0, F.lit(-5.0))
        .otherwise(F.col("n129"))
    )
    res = validate(df.withColumn("rid", F.monotonically_increasing_id()),
                   _wide_spec())
    viol = res.violations("rid").collect()
    msgs = {(r.json_path, r.error) for r in viol}
    assert (".t0", "length should be >= 1") in msgs
    assert (".n129", "should be >= 0") in msgs
    # only the two mutated fields (on the n1==0 rows) violate
    assert {r.json_path for r in viol} == {".t0", ".n129"}


def test_wide_schema_stays_shuffle_free(spark):
    df = _wide_df(spark)
    res = validate(df, _wide_spec())
    plan = res.annotated._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
