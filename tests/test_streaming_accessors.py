"""Streaming validation + accessor-layer tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from schematic_spark.accessors import (
    TRAVERSE,
    construct,
    field_lens,
    get_at_path,
    project_subset,
    set_at_path,
)
from schematic_spark.schema import (
    NGe,
    SNumber,
    SObject,
    SText,
    TEnum,
    TGe,
)
from schematic_spark.streaming import (
    validate_stream,
    windowed_verdict_counts,
)

SPEC = SObject((
    ("kind", SText((TEnum(("a", "b")),))),
    ("value", SNumber((NGe(0),))),
))


class TestStreaming:
    def test_stream_validation_end_to_end(self, spark, tmp_path):
        # rate source → shape into spec columns → validate → memory sink
        stream = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", "500").load()
        )
        shaped = stream.select(
            F.col("timestamp").alias("ts"),
            F.when(F.col("value") % 3 == 0, "a")
             .when(F.col("value") % 3 == 1, "b")
             .otherwise("zzz").alias("kind"),
            (F.col("value") % 7 - 1).cast("double").alias("value"),
        )
        annotated = validate_stream(shaped, SPEC)
        q = (
            annotated.writeStream.format("memory")
            .queryName("val_stream")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        out = spark.sql("SELECT * FROM val_stream")
        rows = out.collect()
        if not rows:  # rate+availableNow can legitimately emit 0 rows
            pytest.skip("rate source produced no rows in the window")
        bad_kind = [r for r in rows if r["kind"] == "zzz"]
        assert all(r["_verdict"] == "ValidationError" for r in bad_kind)
        good = [
            r for r in rows
            if r["kind"] in ("a", "b") and r["value"] >= 0
        ]
        assert all(r["_verdict"] == "Valid" for r in good)

    def test_windowed_counts_compiles_on_stream(self, spark):
        stream = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", "10").load()
        )
        shaped = stream.select(
            F.col("timestamp").alias("ts"),
            F.lit("a").alias("kind"),
            F.lit(1.0).alias("value"),
        )
        win = windowed_verdict_counts(validate_stream(shaped, SPEC), "ts")
        assert win.isStreaming  # plan builds with watermark + window


class TestAccessors:
    def test_get_set_nested(self, spark):
        df = spark.createDataFrame(
            [((1.0, [(10.0,), (20.0,)]),)],
            "s struct<x: double, arr: array<struct<y: double>>>",
        )
        got = df.select(
            get_at_path(F.col("s"), ("x",)).alias("x"),
            get_at_path(F.col("s"), ("arr", TRAVERSE, "y")).alias("ys"),
        ).first()
        assert got["x"] == 1.0 and got["ys"] == [10.0, 20.0]

        updated = df.select(
            set_at_path(
                F.col("s"), ("arr", TRAVERSE, "y"), lambda c: c * 2
            ).alias("s")
        ).first()
        assert [r["y"] for r in updated["s"]["arr"]] == [20.0, 40.0]

    def test_lens_laws(self, spark):
        df = spark.createDataFrame(
            [((5.0,),)], "s struct<x: double>"
        )
        get, put = field_lens(df, "s", ("x",))
        # set-then-get
        df2 = put(F.lit(9.0))
        assert df2.select(F.col("s")["x"]).first()[0] == 9.0
        # get-then-set (identity)
        df3 = put(get())
        assert df3.select("s").first() == df.select("s").first()

    def test_project_subset(self, spark):
        df = spark.createDataFrame([(1, "a", 2.0)], "a int, b string, c double")
        assert project_subset(df, "b", "a").columns == ["b", "a"]

    def test_construct_order_independent(self, spark):
        schema = SObject((("x", SNumber()), ("y", SText())))
        df = spark.range(1).select(
            construct(schema, y=F.lit("hi"), x=F.lit(1.5)).alias("s")
        )
        row = df.first()["s"]
        assert row["x"] == 1.5 and row["y"] == "hi"
        assert df.schema["s"].dataType.fieldNames() == ["x", "y"]

    def test_construct_missing_field_raises(self):
        schema = SObject((("x", SNumber()),))
        with pytest.raises(KeyError):
            construct(schema)


class TestSerialize:
    def test_tojson_keeps_null_keys(self, spark):
        # ToJSON parity (Schema.hs:569-588): ReprOptional Nothing
        # serializes as an explicit null key
        from schematic_spark.serialize import serialize_rows
        from schematic_spark.schema import SObject, SOptional

        schema = SObject((
            ("x", SNumber()),
            ("bar", SOptional(SText())),
        ))
        df = spark.createDataFrame([(1.0, None)], "x double, bar string")
        out = serialize_rows(df, schema).first()["json"]
        assert out == '{"x":1.0,"bar":null}'


class TestStreamingRound2:
    def test_dedup_stream_drops_in_window_duplicates(self, spark, tmp_path):
        from schematic_spark.streaming import dedup_stream

        stream = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", "500").load()
        )
        # every key appears twice within the same second → dedup halves it
        shaped = stream.select(
            F.col("timestamp").alias("ts"),
            (F.col("value") / 2).cast("long").alias("k"),
        )
        deduped = dedup_stream(shaped, ["k"], "ts", watermark="1 minute")
        q = (
            deduped.writeStream.format("memory")
            .queryName("dedup_stream_out")
            .option("checkpointLocation", str(tmp_path / "ck_dedup"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        out = spark.sql(
            "SELECT k, count(*) AS n FROM dedup_stream_out GROUP BY k"
        ).collect()
        if out:  # rate+availableNow may emit nothing on a slow host
            assert all(r["n"] == 1 for r in out)

    def test_running_verdict_totals_stateful(self, spark, tmp_path):
        from schematic_spark.streaming import (
            running_verdict_totals,
            validate_stream,
        )

        stream = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", "500").load()
        )
        shaped = stream.select(
            F.when(F.col("value") % 2 == 0, "even").otherwise("odd")
            .alias("kind2"),
            F.when(F.col("value") % 3 == 0, "a").otherwise("zzz")
            .alias("kind"),
            F.lit(1.0).alias("value"),
        )
        annotated = validate_stream(shaped, SPEC)
        totals = running_verdict_totals(annotated, "kind2")
        q = (
            totals.writeStream.format("memory")
            .queryName("running_totals")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ck_tot"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.sql(
            "SELECT key, max(n_rows) AS n_rows, max(n_bad) AS n_bad "
            "FROM running_totals GROUP BY key"
        ).collect()
        if rows:
            got = {r["key"]: (r["n_rows"], r["n_bad"]) for r in rows}
            # kind='zzz' (2 of 3 values) violates the enum → n_bad > 0,
            # and bad rows never exceed total rows
            for k, (n, b) in got.items():
                assert 0 <= b <= n
            assert sum(b for _, b in got.values()) > 0


class TestStreamingSessions:
    def test_session_counts_stream_gap_semantics(self, spark, tmp_path):
        import datetime as dt

        from schematic_spark.streaming import session_counts_stream

        t0 = dt.datetime(2024, 1, 1)

        def ts(minutes):
            return t0 + dt.timedelta(minutes=minutes)

        rows = [
            # user 1: two events 10m apart (one session), then a 2h gap
            (1, ts(0), 2.0), (1, ts(10), 3.0), (1, ts(130), 5.0),
            # user 2: single event
            (2, ts(5), 1.0),
        ]
        src = str(tmp_path / "src")
        spark.createDataFrame(
            rows, "user_id long, ts timestamp, value double"
        ).coalesce(1).write.parquet(src)

        stream = (
            spark.readStream
            .schema("user_id long, ts timestamp, value double")
            .parquet(src)
        )
        out = session_counts_stream(
            stream, gap_seconds=1800, watermark="10 minutes",
            value_col="value",
        )
        q = (
            out.writeStream.format("memory").queryName("sess_stream")
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r.user_id, r.n_events, r.total_value)
            for r in spark.sql("SELECT * FROM sess_stream").collect()
        }
        assert got == {(1, 2, 5.0), (1, 1, 5.0), (2, 1, 1.0)}


class TestBatchStreamDifferential:
    """The streaming operators' second oracle: on the SAME bounded
    input (availableNow trigger), each stateful streaming operator must
    produce exactly the batch operator's answer — the same differential
    treatment the compiler gets from the interpreter twin."""

    def test_session_stream_equals_batch_incl_gap_boundary(
        self, spark, tmp_path
    ):
        import datetime as dt

        from schematic_spark.streaming import session_counts_stream
        from schematic_spark.suite import session_stats

        t0 = dt.datetime(2024, 3, 1)

        def ts(seconds):
            return t0 + dt.timedelta(seconds=seconds)

        gap = 600  # 10 minutes
        rows = [
            # user 1: event exactly `gap` seconds after the previous —
            # the half-open-window boundary case: batch (> gap) keeps
            # it in session 1, so the stream must too
            (1, ts(0), 1.0), (1, ts(gap), 2.0),
            # then strictly greater than gap → new session
            (1, ts(2 * gap + 1), 4.0),
            # user 2: dense burst then singleton
            (2, ts(5), 1.0), (2, ts(10), 1.0), (2, ts(3000), 8.0),
            # user 3: single event
            (3, ts(42), 7.0),
        ]
        src = str(tmp_path / "sess_src")
        spark.createDataFrame(
            rows, "user_id long, ts timestamp, value double"
        ).coalesce(1).write.parquet(src)

        batch = {
            (r.user_id, r.n_events, r.total_value)
            for r in session_stats(
                spark.read.parquet(src),
                gap_seconds=gap,
                value_col="value",
            ).collect()
        }

        stream = (
            spark.readStream
            .schema("user_id long, ts timestamp, value double")
            .parquet(src)
        )
        q = (
            session_counts_stream(
                stream, gap_seconds=gap, watermark="1 minute",
                value_col="value",
            )
            .writeStream.format("memory").queryName("sess_diff")
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "ck_diff"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        streamed = {
            (r.user_id, r.n_events, r.total_value)
            for r in spark.sql("SELECT * FROM sess_diff").collect()
        }
        assert streamed == batch
        # the boundary event really was kept in-session
        assert (1, 2, 3.0) in batch

    def test_dedup_stream_equals_batch_distinct(self, spark, tmp_path):
        import datetime as dt

        from schematic_spark.streaming import dedup_stream

        t0 = dt.datetime(2024, 3, 1)
        rows = [
            (k, t0 + dt.timedelta(seconds=5 * i))
            for i, k in enumerate([1, 2, 1, 3, 2, 1, 4, 4, 5])
        ]
        src = str(tmp_path / "dd_src")
        spark.createDataFrame(
            rows, "k long, ts timestamp"
        ).coalesce(1).write.parquet(src)

        batch_keys = {
            r.k for r in spark.read.parquet(src)
            .dropDuplicates(["k"]).collect()
        }

        stream = (
            spark.readStream.schema("k long, ts timestamp").parquet(src)
        )
        q = (
            dedup_stream(stream, ["k"], "ts", watermark="1 minute")
            .writeStream.format("memory").queryName("dd_diff")
            .option("checkpointLocation", str(tmp_path / "ck_dd"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        streamed = spark.sql("SELECT k FROM dd_diff").collect()
        assert {r.k for r in streamed} == batch_keys == {1, 2, 3, 4, 5}
        assert len(streamed) == 5  # exactly one survivor per key

    def test_windowed_verdict_counts_equals_batch(self, spark, tmp_path):
        import datetime as dt

        from schematic_spark.streaming import (
            validate_stream,
            windowed_verdict_counts,
        )
        from schematic_spark.validation import validate

        t0 = dt.datetime(2024, 3, 1)
        rows = [
            (t0 + dt.timedelta(seconds=30 * i),
             ["a", "b", "zzz"][i % 3],
             float(i % 5 - 1))
            for i in range(40)
        ]
        src = str(tmp_path / "win_src")
        spark.createDataFrame(
            rows, "ts timestamp, kind string, value double"
        ).coalesce(1).write.parquet(src)

        batch_annotated = validate(spark.read.parquet(src), SPEC).annotated
        batch = {
            (r.ws, r.verdict, r.n_rows, r.n_violations)
            for r in batch_annotated.groupBy(
                F.window("ts", "1 minute").alias("window"),
                F.col("_verdict").alias("verdict"),
            )
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.size("_violations")).alias("n_violations"),
            )
            .select(
                F.col("window.start").alias("ws"), "verdict",
                "n_rows", "n_violations",
            )
            .collect()
        }

        stream = (
            spark.readStream
            .schema("ts timestamp, kind string, value double")
            .parquet(src)
        )
        q = (
            windowed_verdict_counts(
                validate_stream(stream, SPEC), "ts", "1 minute"
            )
            .writeStream.format("memory").queryName("win_diff")
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "ck_win"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        streamed = {
            (r.ws, r.verdict, r.n_rows, r.n_violations)
            for r in spark.sql(
                "SELECT window.start AS ws, verdict, n_rows, n_violations "
                "FROM win_diff"
            ).collect()
        }
        assert streamed == batch and len(batch) > 3
