"""Structured Streaming validation.

The reference has no streaming (SURVEY §2.9); the engine adds it so the
same compiled spec runs over ``readStream`` sources: the verdict
projection is stateless (one ``select``), so it attaches to any stream
without watermarks; windowed verdict aggregation uses event-time
watermarks for late data.

Usage::

    annotated = validate_stream(stream_df, spec)
    q = (annotated.writeStream.format("parquet")... )
    summary = windowed_verdict_counts(annotated, "ts", "1 minute")
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..validation import (
    VERDICT_COL,
    VIOLATIONS_COL,
    exploded_error_rows,
    validate,
)


def validate_stream(df: DataFrame, spec) -> DataFrame:
    """Attach _structural/_violations/_verdict/_decoding_error to a
    streaming DataFrame. Stateless — no watermark required.

    Delegates to batch :func:`~schematic_spark.validation.validate`
    outright: every step there is a lazy projection (stream-safe), and
    the delegation is what keeps the stream path on the SAME entry
    guards (verify_schema, regex preflight, conformance check, missing
    optional-column fill, reserved-column collision) and the SAME
    valid-mask fast path as batch. An earlier inline re-implementation
    silently skipped all of those — the exact single-predicate rule
    CLAUDE.md records for the mask/compiler split."""
    return validate(df, spec).annotated


def streaming_violations(df: DataFrame, *id_cols: str) -> DataFrame:
    """Exploded violation rows from an annotated stream — the shared
    pushdown-trap-safe pattern (one copy for batch and streaming,
    see :func:`~schematic_spark.validation.exploded_error_rows`)."""
    return exploded_error_rows(df, VIOLATIONS_COL, *id_cols)


def windowed_verdict_counts(
    annotated: DataFrame,
    ts_col: str,
    window: str = "1 minute",
    watermark: str = "5 minutes",
) -> DataFrame:
    """Per-window verdict counts with a watermark for late rows —
    the streaming analog of ValidationResult.summary()."""
    return (
        annotated
        .withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window).alias("window"),
            F.col(VERDICT_COL).alias("verdict"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.size(VIOLATIONS_COL)).alias("n_violations"),
        )
    )


def dedup_stream(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    *,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup bounded by event time:
    ``dropDuplicatesWithinWatermark`` keeps per-key state only until the
    watermark passes, so state size is O(keys-per-watermark-window), not
    O(all keys ever) — the only formulation that survives an unbounded
    stream."""
    return (
        df.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(keys)
    )


def running_verdict_totals(annotated: DataFrame, key_col: str) -> DataFrame:
    """Custom stateful operator (``applyInPandasWithState``): cumulative
    (n_rows, n_bad) per key across the whole stream, re-emitted whenever
    a batch touches the key. State is two longs per key.

    The engine analog of keeping a running ErrorMap per partition key —
    something the stateless verdict projection can't express."""
    import pandas as pd  # noqa: F811 — module scope needed by pandas_udf paths
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):
        n_rows, n_bad = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n_rows += len(pdf)
            n_bad += int((pdf["verdict"] != "Valid").sum())
        state.update((n_rows, n_bad))
        yield pd.DataFrame(
            {"key": [key[0]], "n_rows": [n_rows], "n_bad": [n_bad]}
        )

    return (
        annotated.select(
            F.col(key_col).cast("string").alias("key"),
            F.col(VERDICT_COL).alias("verdict"),
        )
        .groupBy("key")
        .applyInPandasWithState(
            fn,
            outputStructType="key string, n_rows long, n_bad long",
            stateStructType="n_rows long, n_bad long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def session_counts_stream(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    watermark: str = "1 hour",
    value_col: str | None = None,
) -> DataFrame:
    """Streaming-native gap sessionization: ``F.session_window`` holds
    one open-session state entry per (user, session); the event-time
    watermark closes sessions and evicts their state, so state size is
    O(concurrently-open sessions), never O(history). The unbounded-
    stream analog of the batch operator (suite/sessions.py), with the
    SAME gap boundary: a strictly-greater-than-``gap_seconds`` silence
    starts a new session.

    Boundary note: Spark's ``session_window`` is half-open
    ``[ts, ts+gap)`` — an event arriving exactly ``gap`` after the
    previous one would start a NEW streaming session while the batch
    operator's ``> gap`` predicate keeps it in the same one. The
    window gap is therefore widened by one microsecond (the event-time
    resolution), making the two operators agree at the boundary —
    pinned by the batch-vs-stream differential in
    ``tests/test_streaming_accessors.py``."""
    gap_interval = f"{gap_seconds * 1_000_000 + 1} microseconds"
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("total_value"))
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), gap_interval).alias("session"),
            F.col(user_col),
        )
        .agg(*aggs)
    )
