"""Sessionization, as-of join, deterministic split, TF-IDF top terms."""

from __future__ import annotations

import datetime as dt
import hashlib
import math

from pyspark.sql import functions as F


def _ts(minute: float) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=minute)


# ---------------------------------------------------------------------------
# sessionize / session_stats
# ---------------------------------------------------------------------------

def test_sessionize_gap_boundaries(spark):
    from schematic_spark.suite import sessionize

    rows = [
        # user 1: gaps 10m, exactly 30m (same session), 30m+1us (new)
        (1, 1, _ts(0.0)),
        (2, 1, _ts(10.0)),
        (3, 1, _ts(40.0)),
        (4, 1, _ts(40.0) + dt.timedelta(minutes=30, microseconds=1)),
        # user 2: single event
        (5, 2, _ts(5.0)),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    out = sessionize(
        df, gap_seconds=1800, tiebreak_col="event_id"
    ).orderBy("event_id")
    got = [(r.event_id, r.session_idx) for r in out.collect()]
    assert got == [(1, 1), (2, 1), (3, 1), (4, 2), (5, 1)]


def test_session_stats_values(spark):
    from schematic_spark.suite import session_stats

    rows = [
        (1, 1, _ts(0.0), 2.0),
        (2, 1, _ts(10.0), 3.0),
        (3, 1, _ts(120.0), 5.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    out = session_stats(
        df, gap_seconds=1800, tiebreak_col="event_id", value_col="value"
    ).orderBy("session_idx").collect()
    assert [(r.session_idx, r.n_events, r.duration_us, r.total_value)
            for r in out] == [(1, 2, 600_000_000, 5.0), (2, 1, 0, 5.0)]
    assert out[0].ts_start == _ts(0.0) and out[0].ts_end == _ts(10.0)


def test_sessionize_equal_ts_ties_deterministic(spark):
    from schematic_spark.suite import sessionize

    rows = [(i, 7, _ts(0.0)) for i in range(4)] + [(9, 7, _ts(90.0))]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    out = sessionize(df, tiebreak_col="event_id")
    got = {r.event_id: r.session_idx for r in out.collect()}
    assert got == {0: 1, 1: 1, 2: 1, 3: 1, 9: 2}


def test_funnel_stages_order_and_tie_semantics(spark):
    from schematic_spark.suite import funnel_stages

    rows = [
        # u1: full ordered funnel
        (1, "view", _ts(0.0)), (1, "click", _ts(10.0)),
        (1, "purchase", _ts(20.0)),
        # u2: purchase BEFORE the view→click sequence → stage 2 only
        (2, "purchase", _ts(0.0)), (2, "view", _ts(5.0)),
        (2, "click", _ts(9.0)),
        # u3: click shares the view's exact timestamp → strict > does
        # NOT advance; the later click does
        (3, "view", _ts(0.0)), (3, "click", _ts(0.0)),
        (3, "click", _ts(4.0)),
        # u4: only non-step events → absent from output entirely
        (4, "error", _ts(1.0)),
        # u5: click without any view → stage 0
        (5, "click", _ts(2.0)),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )
    got = {
        r.user_id: (r.stage, r.reached_us)
        for r in funnel_stages(df, ["view", "click", "purchase"]).collect()
    }
    assert got[1][0] == 3
    assert got[2][0] == 2
    assert got[3] == (2, got[3][1]) and got[3][1] > 0  # the ts(4) click
    assert 4 not in got
    assert got[5] == (0, None)


# ---------------------------------------------------------------------------
# asof_join
# ---------------------------------------------------------------------------

def _asof_frames(spark):
    left = spark.createDataFrame(
        [
            (100, 1, _ts(10.0)),   # prior rights at 5, 10 → strict picks 5
            (101, 1, _ts(30.0)),   # → 10
            (102, 2, _ts(1.0)),    # no prior right → null
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (900, 1, _ts(5.0), "a"),
            (901, 1, _ts(10.0), "b"),
            (902, 2, _ts(2.0), "c"),
        ],
        "rid long, user_id long, ts timestamp, payload string",
    )
    return left, right


def test_asof_join_strict_vs_inclusive(spark):
    from schematic_spark.functions import asof_join

    left, right = _asof_frames(spark)
    strict = asof_join(
        left, right, on="user_id", right_cols=("rid", "payload"),
        strict=True, tiebreak_col="rid",
    )
    got = {r.event_id: (r.rid_asof, r.payload_asof) for r in strict.collect()}
    assert got == {100: (900, "a"), 101: (901, "b"), 102: (None, None)}

    incl = asof_join(
        left, right, on="user_id", right_cols=("rid", "payload"),
        strict=False, tiebreak_col="rid",
    )
    got = {r.event_id: r.rid_asof for r in incl.collect()}
    assert got == {100: 901, 101: 901, 102: None}


def test_asof_join_carries_null_payload_fields(spark):
    """A right row whose payload column is NULL must still win (the
    struct carry must not skip it the way last(col, ignoreNulls) would)."""
    from schematic_spark.functions import asof_join

    left = spark.createDataFrame(
        [(1, 5, _ts(10.0))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(70, 5, _ts(1.0), "old"), (71, 5, _ts(2.0), None)],
        "rid long, user_id long, ts timestamp, payload string",
    )
    out = asof_join(
        left, right, on="user_id", right_cols=("rid", "payload"),
        tiebreak_col="rid",
    ).collect()
    assert out[0].rid_asof == 71 and out[0].payload_asof is None


def test_asof_join_equal_ts_right_tiebreak_latest_wins(spark):
    from schematic_spark.functions import asof_join

    left = spark.createDataFrame(
        [(1, 5, _ts(10.0))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(70, 5, _ts(3.0), "x"), (71, 5, _ts(3.0), "y")],
        "rid long, user_id long, ts timestamp, payload string",
    )
    out = asof_join(
        left, right, on="user_id", right_cols=("rid", "payload"),
        tiebreak_col="rid",
    ).collect()
    assert out[0].rid_asof == 71


def test_asof_join_single_shuffle(spark):
    """The union-interleave plan shuffles once (the window exchange) —
    no range-join pair blowup, no second exchange."""
    from schematic_spark.functions import asof_join

    left, right = _asof_frames(spark)
    plan = asof_join(
        left, right, on="user_id", right_cols=("rid",)
    )._jdf.queryExecution().optimizedPlan().toString()
    # one Window over the union; a Join node would mean the quadratic form
    assert "Join" not in plan
    assert plan.count("Window") == 1


# ---------------------------------------------------------------------------
# assign_split
# ---------------------------------------------------------------------------

def test_assign_split_matches_hashlib_and_is_exhaustive(spark):
    from schematic_spark.functions import assign_split

    ids = [f"doc-{i}" for i in range(300)]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id string")
    out = {r.doc_id: r.split
           for r in assign_split(df, salt="s1").collect()}

    def expect(doc_id: str) -> str:
        b = int(hashlib.md5(("s1" + doc_id).encode()).hexdigest()[:15], 16) % 1000
        return "train" if b < 900 else ("val" if b < 950 else "test")

    assert out == {i: expect(i) for i in ids}
    assert set(out.values()) == {"train", "val", "test"}


def test_assign_split_salt_decorrelates(spark):
    from schematic_spark.functions import assign_split

    df = spark.createDataFrame(
        [(f"d{i}",) for i in range(400)], "doc_id string"
    )
    a = {r.doc_id: r.split for r in assign_split(df, salt="a").collect()}
    b = {r.doc_id: r.split for r in assign_split(df, salt="b").collect()}
    assert a != b  # different namespaces
    # but each is individually stable
    a2 = {r.doc_id: r.split for r in assign_split(df, salt="a").collect()}
    assert a == a2


def test_assign_split_rejects_bad_weights(spark):
    import pytest

    from schematic_spark.functions import assign_split

    df = spark.createDataFrame([("x",)], "doc_id string")
    with pytest.raises(ValueError):
        assign_split(df, weights={"train": 1, "val": 1}, denominator=1000)


# ---------------------------------------------------------------------------
# plan shapes (scale claims)
# ---------------------------------------------------------------------------

def test_session_stats_single_exchange(spark):
    """The lag window, the running sum, and the per-session groupBy all
    reuse ONE hashpartitioning(user_id) exchange — the groupBy keys are
    a superset of the window partition key."""
    from schematic_spark.suite import session_stats

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = session_stats(ev, gap_seconds=86400, tiebreak_col="event_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_asof_entry_query_single_exchange(spark):
    import __spark_entry__ as entry

    df = entry.queries()["purchase_asof_prior_view"](
        spark, "/root/testdata/sf0.001"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_train_split_no_shuffle_before_agg(spark):
    """Split assignment is a pure projection: the only exchange is the
    stratification aggregation's own."""
    import __spark_entry__ as entry

    df = entry.queries()["train_split_documents"](
        spark, "/root/testdata/sf0.001"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


# ---------------------------------------------------------------------------
# tfidf_top_terms
# ---------------------------------------------------------------------------

def test_tfidf_top_terms_small(spark):
    from schematic_spark.functions import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            ("a", "en", "apple apple banana common"),
            ("b", "en", "apple cherry common"),
            ("c", "de", "zebra common"),
        ],
        "doc_id string, lang string, text string",
    )
    out = tfidf_top_terms(docs, k=2, min_term_len=3)
    rows = {(r.lang, r.term): (r.tf, r.df_docs, r.tfidf) for r in out.collect()}
    n = 3
    exp_apple = round(3 * math.log((n + 1) / (2 + 1)), 5)
    assert rows[("en", "apple")] == (3, 2, exp_apple)
    # 'common' appears in all docs → lowest idf, never top-2 for en
    assert ("en", "common") not in rows
    assert ("de", "zebra") in rows
    # exactly k rows per group
    assert len([k_ for k_ in rows if k_[0] == "en"]) == 2


# ---------------------------------------------------------------------------
# repetition_features
# ---------------------------------------------------------------------------

def test_repetition_features_values(spark):
    from schematic_spark.functions import repetition_features

    df = spark.createDataFrame(
        [
            ("a", "x x x y"),          # 4 words, 2 distinct, top 3
            ("b", "p q r"),            # all distinct
            ("c", "z"),                # single word, no bigrams
            ("d", "m n m n m n"),      # repeated bigram chain
        ],
        "doc_id string, text string",
    )
    f = repetition_features("text")
    rows = {r.doc_id: r for r in df.select(
        "doc_id",
        f["n_words"].alias("nw"),
        f["distinct_ratio"].alias("dr"),
        f["top_word_share"].alias("tws"),
        f["dup_bigram_ratio"].alias("dbr"),
    ).collect()}
    assert rows["a"].nw == 4 and rows["a"].dr == 0.5
    assert rows["a"].tws == 0.75
    # bigrams of a: [x x, x x, x y] -> 2 distinct of 3
    assert abs(rows["a"].dbr - (1 - 2 / 3)) < 1e-12
    assert rows["b"].dr == 1.0 and rows["b"].tws == 1 / 3
    assert rows["b"].dbr == 0.0
    assert rows["c"].nw == 1 and rows["c"].dbr == 0.0
    # d: bigrams [m n, n m, m n, n m, m n] -> 2 distinct of 5
    assert abs(rows["d"].dbr - (1 - 2 / 5)) < 1e-12


def test_repetition_features_differential_twin(spark):
    """Spark vs a pure-Python twin over seeded random word docs."""
    import random
    from collections import Counter

    from schematic_spark.functions import repetition_features

    rng = random.Random(77)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    docs = [
        (f"d{i}", " ".join(rng.choice(vocab)
                           for _ in range(rng.randint(1, 25))))
        for i in range(30)
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    f = repetition_features("text")
    got = {r.doc_id: (r.nw, round(r.dr, 9), round(r.tws, 9), round(r.dbr, 9))
           for r in df.select(
               "doc_id", f["n_words"].alias("nw"),
               f["distinct_ratio"].alias("dr"),
               f["top_word_share"].alias("tws"),
               f["dup_bigram_ratio"].alias("dbr")).collect()}
    for doc_id, text in docs:
        ws = text.split()
        n = len(ws)
        bi = [f"{a} {b}" for a, b in zip(ws, ws[1:])]
        exp = (
            n,
            round(len(set(ws)) / n, 9),
            round(Counter(ws).most_common(1)[0][1] / n, 9),
            round(1 - len(set(bi)) / len(bi), 9) if bi else 0.0,
        )
        assert got[doc_id] == exp, (doc_id, got[doc_id], exp)


# ---------------------------------------------------------------------------
# char_entropy
# ---------------------------------------------------------------------------

def test_char_entropy_known_values(spark):
    from schematic_spark.functions import char_entropy

    df = spark.createDataFrame(
        [("a", "aab"), ("b", "aaaa"), ("c", ""), ("d", "abcd")],
        "doc_id string, text string",
    )
    got = {r.doc_id: r.h for r in df.select(
        "doc_id", char_entropy("text").alias("h")).collect()}
    assert abs(got["a"] - (math.log(3) - (2 * math.log(2)) / 3)) < 1e-12
    assert got["b"] == 0.0            # single symbol
    assert got["c"] == 0.0            # empty
    assert abs(got["d"] - math.log(4)) < 1e-12   # uniform


def test_char_entropy_differential_twin(spark):
    import random
    from collections import Counter

    from schematic_spark.functions import char_entropy

    rng = random.Random(9)
    # alphabet includes astral (non-BMP) codepoints — the Python twin
    # counts codepoints, so a UTF-16 surrogate-halving split in the
    # engine would diverge here (r3 ADVICE regression guard)
    alphabet = "abcxyz !." + "\U0001F600\U0001F680\U00020BB7"
    docs = [(f"d{i}", "".join(rng.choice(alphabet)
                              for _ in range(rng.randint(1, 80))))
            for i in range(30)]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    got = {r.doc_id: r.h for r in df.select(
        "doc_id", char_entropy("text").alias("h")).collect()}
    for doc_id, text in docs:
        n = len(text)
        s = sum(k * math.log(k) for k in Counter(text).values())
        exp = math.log(n) - s / n
        assert abs(got[doc_id] - exp) < 1e-9, doc_id


def test_asof_join_forward_direction(spark):
    from schematic_spark.functions import asof_join

    left = spark.createDataFrame(
        [
            (1, 5, _ts(10.0)),   # next rights at 20, 30 → picks 20
            (2, 5, _ts(30.0)),   # strict: right at 30 excluded → 40
            (3, 5, _ts(99.0)),   # nothing later → null
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (70, 5, _ts(20.0), "a"),
            (71, 5, _ts(30.0), "b"),
            (72, 5, _ts(40.0), "c"),
        ],
        "rid long, user_id long, ts timestamp, payload string",
    )
    fwd = asof_join(
        left, right, on="user_id", right_cols=("rid", "payload"),
        strict=True, tiebreak_col="rid", direction="forward",
    )
    got = {r.event_id: r.rid_asof for r in fwd.collect()}
    assert got == {1: 70, 2: 72, 3: None}

    incl = asof_join(
        left, right, on="user_id", right_cols=("rid",),
        strict=False, tiebreak_col="rid", direction="forward",
    )
    got = {r.event_id: r.rid_asof for r in incl.collect()}
    assert got == {1: 70, 2: 71, 3: None}


def test_asof_join_forward_equal_ts_earliest_tiebreak_wins(spark):
    from schematic_spark.functions import asof_join

    left = spark.createDataFrame(
        [(1, 5, _ts(0.0))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(70, 5, _ts(3.0), "x"), (71, 5, _ts(3.0), "y")],
        "rid long, user_id long, ts timestamp, payload string",
    )
    out = asof_join(
        left, right, on="user_id", right_cols=("rid",),
        tiebreak_col="rid", direction="forward",
    ).collect()
    assert out[0].rid_asof == 70


def test_asof_join_differential_twin_random(spark):
    """Random events through asof_join vs a brute-force Python twin —
    all four (strict, direction) combinations."""
    import random

    rng = random.Random(4242)
    left = [(i, rng.randint(1, 5), _ts(rng.randint(0, 50)))
            for i in range(60)]
    right = [(100 + i, rng.randint(1, 5), _ts(rng.randint(0, 50)))
             for i in range(60)]
    ldf = spark.createDataFrame(
        left, "event_id long, user_id long, ts timestamp")
    rdf = spark.createDataFrame(
        right, "rid long, user_id long, ts timestamp")

    def twin(strict, forward):
        exp = {}
        for eid, u, t in left:
            if forward:
                cand = [(rt, rid) for rid, ru, rt in right
                        if ru == u and (rt > t if strict else rt >= t)]
                # nearest later; equal-ts ties -> earliest rid
                exp[eid] = min(cand)[1] if cand else None
            else:
                cand = [(rt, rid) for rid, ru, rt in right
                        if ru == u and (rt < t if strict else rt <= t)]
                # most recent; equal-ts ties -> latest rid
                exp[eid] = max(cand)[1] if cand else None
        return exp

    from schematic_spark.functions import asof_join

    for strict in (True, False):
        for direction in ("backward", "forward"):
            out = asof_join(
                ldf, rdf, on="user_id", right_cols=("rid",),
                strict=strict, tiebreak_col="rid", direction=direction,
            )
            got = {r.event_id: r.rid_asof for r in out.collect()}
            exp = twin(strict, direction == "forward")
            assert got == exp, (strict, direction)


def test_asof_join_null_ts_and_null_key_never_match(spark):
    """Join-ON-key semantics for nulls: a null-ts right row is never a
    valid prior (r.ts < l.ts is NULL), a null-key row never equals any
    key, and a null-ts LEFT row gets no payload — in both directions
    (the forward walk sorts null-ts left rows last, where an unguarded
    carry would hand them the earliest right payload)."""
    from schematic_spark.functions import asof_join

    left = spark.createDataFrame(
        [
            (1, 5, _ts(10.0)),   # real prior right exists at 2.0
            (2, 5, None),        # null-ts left → null payload
            (3, None, _ts(9.0)), # null-key left → null payload
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (70, 5, _ts(2.0), "ok"),
            (71, 5, None, "null-ts"),     # must never be carried
            (72, None, _ts(1.0), "null-key"),
        ],
        "rid long, user_id long, ts timestamp, payload string",
    )
    for direction, expect_1 in (("backward", 70), ("forward", None)):
        got = {
            r.event_id: r.rid_asof
            for r in asof_join(
                left, right, on="user_id",
                right_cols=("rid", "payload"),
                tiebreak_col="rid", direction=direction,
            ).collect()
        }
        assert got[2] is None, (direction, got)
        assert got[3] is None, (direction, got)
        if direction == "backward":
            assert got[1] == expect_1, got
