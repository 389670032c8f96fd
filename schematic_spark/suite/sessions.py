"""Gap-based sessionization over an event stream/table.

The reference has no notion of time at all (it validates one JSON
document, ``/root/reference/src/Data/Schematic/Validation.hs:193-244``);
sessionization is an engine-level operator a training-data pipeline
needs (user activity segmentation, per-session document grouping).

Semantics: events of one actor, ordered by ``(ts, tiebreak)``, belong to
the same session while consecutive gaps are <= ``gap`` (strictly greater
starts a new session). This matches Structured Streaming's
``session_window`` gap semantics, expressed for batch via windows so the
output carries a stable, per-user dense session index.

Scale shape (100 TB): ONE shuffle, on the actor key. The ``lag`` window
and the running ``sum`` share the same ``partitionBy(user)`` exchange,
and the follow-up ``groupBy(user, session_idx)`` is satisfied by the
same hash partitioning (group keys are a superset of the partition key),
so Catalyst plans zero additional exchanges — asserted in
``tests/test_plan_shape.py``. Gap arithmetic is done in integral
microseconds (``unix_micros``) — no float timestamps, no DST surprises.

Skew caveat: sessionization is inherently sequential per actor, so one
actor with billions of events is a single-reducer straggler no salting
can fix (a session may cross any split point). At that scale either
bound the actor key first (e.g. cap events per actor) or use the
streaming form (``streaming.session_counts_stream``), whose state is
per-open-session rather than per-history.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from schematic_spark.functions.timeops import epoch_micros


def sessionize(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Append ``session_idx`` (1-based, dense per user).

    ``tiebreak_col`` makes the intra-user order total when timestamps can
    collide (recommended: the event id); without it equal-``ts`` rows
    order arbitrarily and the index is only deterministic up to ties.
    """
    order: list[Column] = [F.col(ts_col)]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col))
    ts_us = epoch_micros(F.col(ts_col), df.schema[ts_col].dataType)
    w = Window.partitionBy(user_col).orderBy(*order)
    prev_us = F.lag(ts_us).over(w)
    new_session = (
        prev_us.isNull() | (ts_us - prev_us > gap_seconds * 1_000_000)
    ).cast("int")
    # derived from w, never re-built: two hand-built specs can drift
    # apart in a future edit and split the lag and the running sum onto
    # different orderings (wrong session indices, silently)
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("session_idx", F.sum(new_session).over(running))


def session_stats(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    tiebreak_col: str | None = None,
    value_col: str | None = None,
) -> DataFrame:
    """One row per session: (user, session_idx, n_events, ts_start,
    ts_end, duration_us[, total_value]). Single shuffle (see module doc).
    """
    sess = sessionize(
        df,
        user_col=user_col,
        ts_col=ts_col,
        gap_seconds=gap_seconds,
        tiebreak_col=tiebreak_col,
    )
    ts_type = df.schema[ts_col].dataType
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("ts_start"),
        F.max(ts_col).alias("ts_end"),
        (
            epoch_micros(F.max(ts_col), ts_type)
            - epoch_micros(F.min(ts_col), ts_type)
        ).alias("duration_us"),
    ]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("total_value"))
    return sess.groupBy(user_col, "session_idx").agg(*aggs)


def funnel_stages(
    df: DataFrame,
    steps: list[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-sequence funnel (the conversion-funnel / sequence-match
    operator — MATCH_RECOGNIZE's simplest shape): per actor, the
    furthest step of ``steps`` reached IN ORDER, where each step must
    occur STRICTLY LATER (event time) than the step before it. Returns
    ``(user, stage, reached_us)``: stage 0 = none of the sequence
    matched (the actor still had at least one step-typed event), stage
    k = the first k steps matched; ``reached_us`` is the unix-micros
    timestamp at which the furthest step was reached (null at stage 0).

    Semantics are timestamp-driven and tie-safe: a step sharing the
    exact timestamp of the previous step does NOT advance the funnel
    (strict >), so results are independent of intra-timestamp event
    order on every engine.

    Scale shape: rows are pre-filtered to the step types, then ONE
    shuffle groups by actor; the per-actor event list is folded
    row-locally (sort_array + aggregate, pure Catalyst — no window, no
    python). The same hot-actor caveat as sessionize applies: one
    actor's step events must fit one task; pre-filtering to step types
    is what keeps the per-actor payload small.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    ts_us = epoch_micros(F.col(ts_col), df.schema[ts_col].dataType)
    per_user = (
        df.where(F.col(type_col).isin(*steps))
        .select(
            F.col(user_col),
            F.struct(
                ts_us.alias("us"), F.col(type_col).alias("t")
            ).alias("_e"),
        )
        .groupBy(user_col)
        .agg(F.sort_array(F.collect_list("_e")).alias("_evs"))
    )
    init = F.struct(
        F.lit(0).alias("stage"), F.lit(None).cast("long").alias("ts")
    )

    def fold(acc, e):
        out = acc
        for i, s in enumerate(steps):
            advance = (acc["stage"] == i) & (e["t"] == F.lit(s))
            if i > 0:
                advance = advance & (e["us"] > acc["ts"])
            else:
                # a NULL-timestamp event must not start the funnel:
                # stage 1 would carry reached_us NULL (contradicting
                # "null only at stage 0") and the SQL twin's min(ts)
                # skips NULLs, so the engines would diverge on the
                # first null-ts step event
                advance = advance & e["us"].isNotNull()
            out = F.when(
                advance,
                F.struct(F.lit(i + 1).alias("stage"), e["us"].alias("ts")),
            ).otherwise(out)
        return out

    # materialize the fold ONCE, then derive fields — referencing the
    # HOF tree twice in one projection would fold every event list
    # twice (CSE does not dedupe across HOF lambdas; repo rule)
    folded = per_user.withColumn("_f", F.aggregate("_evs", init, fold))
    return folded.select(
        F.col(user_col),
        F.col("_f")["stage"].alias("stage"),
        F.col("_f")["ts"].alias("reached_us"),
    )
