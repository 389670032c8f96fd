"""Bucketized interval (range) join — points → containing intervals.

A naive ``points JOIN intervals ON key AND ts BETWEEN lo AND hi`` is a
theta-join: Spark plans it as a broadcast nested loop (or a full
per-key cross product) — O(|points| x |intervals per key|), fatal at
100 TB. The standard scalable rewrite buckets time: each interval is
exploded to the buckets it covers, each point hashes to exactly one
bucket, and the work becomes an EQUI-join on (key, bucket) + a cheap
residual ``BETWEEN`` filter. Shuffle volume is linear in
|points| + |interval-bucket covers|; bucket width trades explosion
factor (long intervals / narrow buckets) against join selectivity.

Timestamps go through ``timeops.epoch_micros`` (NTZ-safe); the
residual compare is exact integer microseconds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from schematic_spark.functions.timeops import epoch_micros


def bucketed_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    on: str,
    point_ts: str = "ts",
    start_ts: str = "ts_start",
    end_ts: str = "ts_end",
    bucket_seconds: int = 86400,
    how: str = "left",
    payload_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Each point row + ``payload_cols`` of every interval of the same
    key containing it (inclusive bounds). ``how='left'`` keeps
    uncontained points with null payloads; a point inside k
    overlapping intervals emits k rows.

    Only ``'inner'`` and ``'left'`` are valid: the bucket-explode
    rewrite duplicates each interval across its covered buckets, so an
    interval-preserving join type (right/full) would emit one all-null
    point row PER BUCKET for unmatched intervals, and semi/anti drop
    the interval side's columns the final projection needs — neither
    is the semantics the name promises, so they are refused loudly.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"bucketed_interval_join supports how='inner'|'left', got "
            f"{how!r} — the bucket explode is not semantics-preserving "
            "for interval-preserving or semi/anti join types"
        )
    bucket_us = bucket_seconds * 1_000_000
    p_us = epoch_micros(
        F.col(point_ts), points.schema[point_ts].dataType
    )
    s_us = epoch_micros(
        F.col(start_ts), intervals.schema[start_ts].dataType
    )
    e_us = epoch_micros(F.col(end_ts), intervals.schema[end_ts].dataType)

    pts = points.select(
        "*", p_us.alias("__p_us"), F.floor(p_us / bucket_us).alias("__b")
    ).alias("p")
    ivs = (
        intervals.select(
            F.col(on).alias("__ikey"),
            s_us.alias("__s_us"),
            e_us.alias("__e_us"),
            *[F.col(c) for c in payload_cols],
        )
        .where(F.col("__s_us") <= F.col("__e_us"))
        .withColumn(
            "__b",
            F.explode(F.sequence(
                F.floor(F.col("__s_us") / bucket_us),
                F.floor(F.col("__e_us") / bucket_us),
            )),
        )
        .alias("i")
    )
    cond = (
        (F.col(f"p.{on}") == F.col("i.__ikey"))
        & (F.col("p.__b") == F.col("i.__b"))
        & (F.col("p.__p_us") >= F.col("i.__s_us"))
        & (F.col("p.__p_us") <= F.col("i.__e_us"))
    )
    out = pts.join(ivs, cond, how)
    return out.select(
        *[F.col(f"p.{c}") for c in points.columns],
        *[F.col(f"i.{c}").alias(c) for c in payload_cols],
    )
