"""Greedy span chunking and deterministic per-group capping."""

from __future__ import annotations

import hashlib


def _spans_df(spark, rows):
    return spark.createDataFrame(
        rows,
        "doc_id string, spans array<struct<kind:string, text:string, "
        "media_ref:string, offset:int>>",
    )


def _span(kind="text", text="", media_ref=None, offset=0):
    return (kind, text, media_ref, offset)


class TestChunkSpans:
    def test_greedy_packing_exact(self, spark):
        from schematic_spark.functions import chunk_spans

        # budget 10: [4, 5] fit; +3 overflows -> new chunk; 12 alone
        df = _spans_df(spark, [(
            "d1",
            [
                _span(text="aaaa"),        # 4  -> chunk 0 (used 4)
                _span(text="bbbbb"),       # 5  -> chunk 0 (used 9)
                _span(text="ccc"),         # 3  -> chunk 1 (used 3)
                _span(text="x" * 12),      # 12 -> chunk 2 (over-budget alone)
                _span(text="dd"),          # 2  -> chunk 3
            ],
        )])
        out = chunk_spans(df, max_chars=10).collect()[0].chunk_ids
        assert out == [0, 0, 1, 2, 3]

    def test_zero_length_first_span_does_not_close_chunk(self, spark):
        """used==0 must never close a chunk, even when the next span is
        over budget on its own."""
        from schematic_spark.functions import chunk_spans

        df = _spans_df(spark, [(
            "d1", [_span(text=""), _span(text="y" * 60)],
        )])
        out = chunk_spans(df, max_chars=48).collect()[0].chunk_ids
        assert out == [0, 0]

    def test_media_cost_budget(self, spark):
        from schematic_spark.functions import chunk_spans

        df = _spans_df(spark, [(
            "d1",
            [
                _span(kind="media", text=None, media_ref="m1"),  # 16
                _span(kind="media", text=None, media_ref="m2"),  # 16 (32)
                _span(kind="media", text=None, media_ref="m3"),  # 16 (48)
                _span(text="z"),                                 # 1 -> new
            ],
        )])
        out = chunk_spans(df, max_chars=48, media_cost=16) \
            .collect()[0].chunk_ids
        assert out == [0, 0, 0, 1]

    def test_chunk_stats_totals(self, spark):
        from schematic_spark.functions import chunk_stats

        df = _spans_df(spark, [
            ("d1", [
                _span(text="aaaa"),
                _span(kind="media", text=None, media_ref="m1"),
                _span(text="bbbbbbbb"),
            ]),
            ("empty", []),
        ])
        rows = {(r.doc_id, r.chunk_idx): (r.n_spans, r.n_chars, r.n_media)
                for r in chunk_stats(df, max_chars=20, media_cost=16)
                .collect()}
        # 4 + 16 = 20 fits exactly; 8 starts chunk 1
        assert rows == {("d1", 0): (2, 20, 1), ("d1", 1): (1, 8, 0)}

    def test_chunking_is_shuffle_free_before_agg(self, spark):
        from schematic_spark.functions import chunk_spans

        df = _spans_df(spark, [("d1", [_span(text="abc")])])
        plan = chunk_spans(df)._jdf.queryExecution().executedPlan() \
            .toString()
        assert "Exchange" not in plan, plan


class TestCapPerGroup:
    def _docs(self, spark, n=60, groups=3):
        rows = [(f"doc{i:03d}", f"g{i % groups}") for i in range(n)]
        return spark.createDataFrame(rows, "doc_id string, grp string")

    def test_cap_counts_and_determinism(self, spark):
        from schematic_spark.functions import cap_per_group

        df = self._docs(spark)
        out = cap_per_group(df, group_col="grp", id_col="doc_id", n=5)
        got = sorted((r.grp, r.doc_id) for r in out.collect())
        assert len(got) == 15
        again = sorted((r.grp, r.doc_id)
                       for r in cap_per_group(
                           df, group_col="grp", id_col="doc_id", n=5
                       ).collect())
        assert got == again

    def test_cap_matches_hashlib_order(self, spark):
        from schematic_spark.functions import cap_per_group

        df = self._docs(spark)
        out = cap_per_group(
            df, group_col="grp", id_col="doc_id", n=4, salt="s"
        )
        got = {g: sorted(d for gg, d in
                         ((r.grp, r.doc_id) for r in out.collect())
                         if gg == g) for g in ("g0", "g1", "g2")}
        ids = [f"doc{i:03d}" for i in range(60)]
        for g in got:
            members = [d for d in ids
                       if f"g{int(d[3:]) % 3}" == g]
            members.sort(key=lambda d: (
                hashlib.md5(("s" + d).encode()).hexdigest(), d))
            assert got[g] == sorted(members[:4])

    def test_two_phase_equals_single_phase(self, spark):
        from schematic_spark.functions import cap_per_group

        df = self._docs(spark, n=200, groups=2)
        one = sorted((r.grp, r.doc_id) for r in cap_per_group(
            df, group_col="grp", id_col="doc_id", n=7).collect())
        two = sorted((r.grp, r.doc_id) for r in cap_per_group(
            df, group_col="grp", id_col="doc_id", n=7,
            two_phase=True, salt_buckets=8).collect())
        assert one == two

    def test_groups_smaller_than_cap_survive_whole(self, spark):
        from schematic_spark.functions import cap_per_group

        df = self._docs(spark, n=6, groups=3)
        out = cap_per_group(df, group_col="grp", id_col="doc_id", n=10)
        assert out.count() == 6


def test_chunk_spans_differential_vs_python_twin(spark):
    """Spark fold vs a pure-Python greedy packer over seeded random
    span lists — the repo's differential-oracle pattern."""
    import random

    from schematic_spark.functions import chunk_spans

    rng = random.Random(1234)
    docs = []
    for d in range(40):
        spans = []
        for _ in range(rng.randint(0, 12)):
            if rng.random() < 0.25:
                spans.append(("media", None, f"m{rng.randint(0, 9)}", 0))
            else:
                spans.append(
                    ("text", "x" * rng.randint(0, 30), None, 0)
                )
        docs.append((f"d{d}", spans))

    def py_greedy(spans, max_chars=48, media_cost=16):
        idx, used, out = 0, 0, []
        for kind, text, ref, off in spans:
            c = media_cost if text is None else len(text)
            if used > 0 and used + c > max_chars:
                idx, used = idx + 1, c
            else:
                used += c
            out.append(idx)
        return out

    df = _spans_df(spark, docs)
    got = {r.doc_id: r.chunk_ids
           for r in chunk_spans(df, max_chars=48, media_cost=16).collect()}
    for doc_id, spans in docs:
        assert got[doc_id] == py_greedy(spans), doc_id


class TestBucketedIntervalJoin:
    def _frames(self, spark):
        import datetime as dt

        t0 = dt.datetime(2024, 1, 1)

        def ts(h):
            return t0 + dt.timedelta(hours=h)

        points = spark.createDataFrame(
            [
                (1, 10, ts(1)),    # inside iv A
                (2, 10, ts(5)),    # exactly at A's end (inclusive)
                (3, 10, ts(30)),   # in iv B (different day bucket)
                (4, 10, ts(99)),   # in no interval
                (5, 20, ts(2)),    # other key, no interval
            ],
            "pid long, key long, ts timestamp",
        )
        intervals = spark.createDataFrame(
            [
                ("A", 10, ts(0), ts(5)),
                ("B", 10, ts(20), ts(40)),   # straddles a bucket edge
            ],
            "name string, key long, ts_start timestamp, ts_end timestamp",
        )
        return points, intervals

    def test_containment_and_boundaries(self, spark):
        from schematic_spark.functions import bucketed_interval_join

        points, intervals = self._frames(spark)
        out = bucketed_interval_join(
            points, intervals, on="key", bucket_seconds=86400,
            payload_cols=("name",),
        )
        got = {r.pid: r.name for r in out.collect()}
        assert got == {1: "A", 2: "A", 3: "B", 4: None, 5: None}

    def test_overlapping_intervals_emit_multiple_rows(self, spark):
        import datetime as dt

        from schematic_spark.functions import bucketed_interval_join

        t0 = dt.datetime(2024, 1, 1)
        points = spark.createDataFrame(
            [(1, 7, t0 + dt.timedelta(hours=2))],
            "pid long, key long, ts timestamp",
        )
        intervals = spark.createDataFrame(
            [
                ("X", 7, t0, t0 + dt.timedelta(hours=4)),
                ("Y", 7, t0 + dt.timedelta(hours=1),
                 t0 + dt.timedelta(hours=3)),
            ],
            "name string, key long, ts_start timestamp, ts_end timestamp",
        )
        out = bucketed_interval_join(
            points, intervals, on="key", payload_cols=("name",)
        )
        assert sorted(r.name for r in out.collect()) == ["X", "Y"]

    def test_plan_is_equi_join_not_nested_loop(self, spark):
        from schematic_spark.functions import bucketed_interval_join

        points, intervals = self._frames(spark)
        out = bucketed_interval_join(
            points, intervals, on="key", payload_cols=("name",)
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan, plan
        assert "CartesianProduct" not in plan, plan


class TestPackDocuments:
    def test_budget_binning_and_overrun_bound(self, spark):
        from schematic_spark.functions import pack_documents

        df = spark.createDataFrame(
            [(f"d{i}", 100 + (i % 7) * 50) for i in range(200)],
            "doc_id string, n_tok int",
        )
        packed = pack_documents(
            df, token_col="n_tok", budget=500, shards=4
        ).collect()
        # per (shard,batch): total tokens < budget + max single doc
        from collections import defaultdict
        agg = defaultdict(int)
        for r in packed:
            agg[(r.shard, r.batch_idx)] += r.n_tok
        max_doc = 100 + 6 * 50
        for tot in agg.values():
            assert tot < 500 + max_doc
        # batches within a shard are dense from 0
        by_shard = defaultdict(set)
        for (s, b) in agg:
            by_shard[s].add(b)
        for s, bs in by_shard.items():
            assert bs == set(range(max(bs) + 1)), (s, bs)

    def test_two_phase_bit_identical_to_single_phase(self, spark):
        # the scalable two-phase form (per-block local cumsums + tiny
        # per-shard offset broadcast) must reproduce the single-phase
        # result EXACTLY — block boundaries respect the md5 order.
        # block_chars=1 → 16 blocks/shard keeps blocks multi-row at
        # this size so the offsets actually matter.
        from schematic_spark.functions import pack_documents

        df = spark.createDataFrame(
            [(f"doc{i}", 10 + (i * 37) % 90) for i in range(500)],
            "doc_id string, n_tok int",
        )
        one = {
            r.doc_id: (r.shard, r.batch_idx)
            for r in pack_documents(
                df, token_col="n_tok", budget=300, shards=4
            ).collect()
        }
        two = {
            r.doc_id: (r.shard, r.batch_idx)
            for r in pack_documents(
                df, token_col="n_tok", budget=300, shards=4,
                two_phase=True, block_chars=1,
            ).collect()
        }
        assert one == two

    def test_two_phase_keeps_null_ids(self, spark):
        # NULL doc_id → NULL shard/block; the offset join must be
        # null-safe or those rows vanish (review-found row loss)
        from schematic_spark.functions import pack_documents

        rows = [(f"d{i}", 100) for i in range(20)] + [
            (None, 70), (None, 90),
        ]
        df = spark.createDataFrame(rows, "doc_id string, n_tok int")
        one = pack_documents(
            df, token_col="n_tok", budget=300, shards=4
        ).collect()
        two = pack_documents(
            df, token_col="n_tok", budget=300, shards=4, two_phase=True,
        ).collect()
        assert len(one) == 22 and len(two) == 22
        k1 = sorted((r.doc_id, r.shard, r.batch_idx) for r in one
                    if r.doc_id is not None)
        k2 = sorted((r.doc_id, r.shard, r.batch_idx) for r in two
                    if r.doc_id is not None)
        assert k1 == k2
        n1 = sorted((r.n_tok, r.batch_idx) for r in one if r.doc_id is None)
        n2 = sorted((r.n_tok, r.batch_idx) for r in two if r.doc_id is None)
        assert n1 == n2

    def test_two_phase_wide_shards(self, spark):
        # shards >= 1024: the parallelism knob the 100 TB path uses —
        # every (shard, batch) stays dense and budget-bounded
        from collections import defaultdict

        from schematic_spark.functions import pack_documents

        df = spark.createDataFrame(
            [(f"w{i}", 50 + (i % 3) * 25) for i in range(3000)],
            "doc_id string, n_tok int",
        )
        packed = pack_documents(
            df, token_col="n_tok", budget=200, shards=1024,
            two_phase=True,
        ).collect()
        assert len(packed) == 3000
        agg = defaultdict(int)
        for r in packed:
            agg[(r.shard, r.batch_idx)] += r.n_tok
        for tot in agg.values():
            assert tot < 200 + 100

    def test_pack_matches_hashlib_twin(self, spark):
        import hashlib

        from schematic_spark.functions import pack_documents

        rows = [(f"doc{i}", 10 + i % 5) for i in range(60)]
        df = spark.createDataFrame(rows, "doc_id string, n_tok int")
        got = {r.doc_id: (r.shard, r.batch_idx) for r in pack_documents(
            df, token_col="n_tok", budget=40, shards=3,
            salt="s").collect()}

        def bucket(d):
            return int(hashlib.md5(("s" + d).encode())
                       .hexdigest()[:15], 16) % 3

        from collections import defaultdict
        shard_docs = defaultdict(list)
        for d, t in rows:
            shard_docs[bucket(d)].append((d, t))
        exp = {}
        for s, docs in shard_docs.items():
            docs.sort(key=lambda dt: (
                hashlib.md5(("s" + dt[0]).encode()).hexdigest(), dt[0]))
            cum = 0
            for d, t in docs:
                exp[d] = (s, cum // 40)
                cum += t
        assert got == exp


class TestContamination:
    def test_detects_shared_ngram_and_cap(self, spark):
        from schematic_spark.functions import ngram_contamination

        bench = spark.createDataFrame(
            [("b1", "alpha beta gamma delta epsilon zeta")],
            "doc_id string, text string",
        )
        corpus = spark.createDataFrame(
            [
                ("c1", "xx alpha beta gamma delta epsilon zeta yy"),
                ("c2", "totally different words here entirely now"),
            ],
            "doc_id string, text string",
        )
        hits = ngram_contamination(corpus, bench, n=5).collect()
        got = {(r.corpus_id, r.bench_id): r.n_shared for r in hits}
        # c1 shares the 5-grams [alpha..epsilon] and [beta..zeta]
        assert got == {("c1", "b1"): 2}

        # a cap of 1 drops grams occurring >1 time overall; both shared
        # grams occur twice (once per side) -> no hits survive
        capped = ngram_contamination(
            corpus, bench, n=5, max_gram_group=1
        ).collect()
        assert capped == []

    def test_no_false_positive_below_n(self, spark):
        from schematic_spark.functions import ngram_contamination

        bench = spark.createDataFrame(
            [("b1", "one two three four")], "doc_id string, text string"
        )
        corpus = spark.createDataFrame(
            [("c1", "one two three NOPE four")],
            "doc_id string, text string",
        )
        assert ngram_contamination(corpus, bench, n=4).count() == 0

    def test_capped_shape_matches_uncapped_and_keeps_null_ids(self, spark):
        """The one-exchange capped path (r4 VERDICT #5) must agree with
        the exact-join path when the cap binds nothing, and NULL doc_ids
        must survive the per-gram list aggregation (collect_list skips
        bare NULLs; the struct wrap is the guard)."""
        from schematic_spark.functions import ngram_contamination

        bench = spark.createDataFrame(
            [("b1", "alpha beta gamma delta"), (None, "alpha beta gamma delta")],
            "doc_id string, text string",
        )
        corpus = spark.createDataFrame(
            [("c1", "pre alpha beta gamma delta post"),
             (None, "alpha beta gamma delta tail")],
            "doc_id string, text string",
        )
        exact = {
            (r.corpus_id, r.bench_id): r.n_shared
            for r in ngram_contamination(corpus, bench, n=4).collect()
        }
        capped = {
            (r.corpus_id, r.bench_id): r.n_shared
            for r in ngram_contamination(
                corpus, bench, n=4, max_gram_group=1000
            ).collect()
        }
        assert exact == capped
        assert (None, "b1") in capped and ("c1", None) in capped
        assert (None, None) in capped


def test_components_last_round_fixed_point_does_not_raise(spark):
    """Round-3 review regression: a run whose final permitted round
    reaches the fixed point must return the correct labels, not raise
    — convergence is verified with one extra pass, not inferred from
    'the last round changed something'."""
    from schematic_spark.functions import near_duplicate_components

    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "id_a string, id_b string"
    )
    out = near_duplicate_components(pairs, max_iter=1)
    got = {r.id: r.component for r in out.collect()}
    assert got == {"a": "a", "b": "a", "c": "a"}


def test_weighted_sample_matches_hashlib_and_fractions(spark):
    import hashlib

    from schematic_spark.functions import weighted_sample

    rows = [(f"d{i}", "a" if i % 2 else "b") for i in range(600)]
    df = spark.createDataFrame(rows, "doc_id string, grp string")
    kept = {r.doc_id for r in weighted_sample(
        df, group_col="grp", fractions={"a": 0.5},
        default_fraction=0.1, salt="w",
    ).collect()}

    def bucket(d):
        return int(hashlib.md5(("w" + d).encode()).hexdigest()[:15],
                   16) % 10_000

    exp = {d for d, g in rows
           if bucket(d) < (5000 if g == "a" else 1000)}
    assert kept == exp
    # sampled shares approximate the fractions
    n_a = sum(1 for d, g in rows if g == "a")
    got_a = sum(1 for d in kept if int(d[1:]) % 2)
    assert 0.4 < got_a / n_a < 0.6


def test_weighted_sample_rejects_bad_fraction(spark):
    import pytest

    from schematic_spark.functions import weighted_sample

    df = spark.createDataFrame([("x", "g")], "doc_id string, grp string")
    with pytest.raises(ValueError):
        weighted_sample(df, group_col="grp", fractions={"g": 1.5})


def test_order_key_and_split_bucket_share_one_md5_recipe(spark):
    """pack_documents derives the shard from split_bucket and the sort
    key from _order_key — two helpers in two modules that must build
    the SAME md5(salt || id) string, because the DuckDB oracle derives
    both from one md5 call. Pin the relationship so a recipe change in
    either helper (a separator, a cast) breaks here instead of
    silently decoupling shard from order."""
    from pyspark.sql import functions as F

    from schematic_spark.functions.sampling import _order_key
    from schematic_spark.functions.split import split_bucket

    df = spark.createDataFrame(
        [(i,) for i in range(50)], "doc_id bigint"
    )
    chk = df.select(
        _order_key("doc_id", "pack").alias("key"),
        split_bucket(F.col("doc_id"), denominator=64, salt="pack")
        .alias("shard"),
    ).withColumn(
        "shard_from_key",
        F.conv(F.substring("key", 1, 15), 16, 10).cast("bigint")
        % F.lit(64),
    )
    bad = chk.where(F.col("shard") != F.col("shard_from_key")).count()
    assert bad == 0


def test_weighted_sample_keeps_null_ids_at_full_fraction(spark):
    """NULL ids share one deterministic sentinel bucket instead of
    being silently dropped by the null-propagating hash — fraction 1.0
    must keep every row, nulls included."""
    from schematic_spark.functions.sampling import weighted_sample

    df = spark.createDataFrame(
        [("a", "en"), (None, "en"), (None, "de"), ("b", "de")],
        "doc_id string, lang string",
    )
    kept = weighted_sample(
        df, group_col="lang", fractions={"en": 1.0, "de": 1.0},
    )
    assert kept.count() == 4
    # and determinism: the same call keeps the same null rows
    again = weighted_sample(
        df, group_col="lang", fractions={"en": 1.0, "de": 1.0},
    )
    assert sorted(r["lang"] for r in kept.collect()) == \
        sorted(r["lang"] for r in again.collect())


def test_interval_join_rejects_unsupported_how(spark):
    from schematic_spark.functions.interval import bucketed_interval_join

    from datetime import datetime as _dt

    pts = spark.createDataFrame(
        [(1, _dt(2020, 1, 1))], "k bigint, ts timestamp_ntz"
    )
    ivs = spark.createDataFrame(
        [(1, _dt(2020, 1, 1), _dt(2020, 1, 2))],
        "k bigint, ts_start timestamp_ntz, ts_end timestamp_ntz",
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="inner.*left"):
        bucketed_interval_join(pts, ivs, on="k", how="full")


def test_funnel_null_ts_step_does_not_start_funnel(spark):
    """A NULL-timestamp step event must not advance stage 0→1: stage 1
    would carry reached_us NULL while the SQL twin's min(ts) skips
    NULLs and leaves the user at stage 0."""
    from schematic_spark.suite.sessions import funnel_stages

    from datetime import datetime as _dt

    df = spark.createDataFrame(
        [(2, None, "view"), (2, _dt(2020, 1, 1, 0, 0, 1), "click"),
         (3, None, "view"), (3, _dt(2020, 1, 1, 0, 0, 2), "view")],
        "user_id bigint, ts timestamp_ntz, event_type string",
    )
    got = {
        r["user_id"]: (r["stage"], r["reached_us"])
        for r in funnel_stages(
            df, ["view", "click", "purchase"]
        ).collect()
    }
    # user 2: null-ts view ignored, click cannot fire at stage 0
    assert got[2] == (0, None)
    # user 3: the later real view starts the funnel
    assert got[3][0] == 1 and got[3][1] is not None
