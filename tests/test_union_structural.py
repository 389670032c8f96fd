"""Union no-match + mask/structural agreement (round-2 fixes).

Covers:
  * the round-1 ADVICE-high bug — an array item of SOptional(SObject)
    with a missing required field must NOT be masked Valid;
  * union no-match → DecodingError "empty union" (Schema.hs:514-519);
  * SNull alternative absorbs the all-null case;
  * validate_branches opt-in (constraint validation of the matched
    branch; no-op parity with Validation.hs:244 when off);
  * Spark compiler ⇔ pure interpreter agreement on all of the above.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from schematic_spark.schema.ast import (
    SArray,
    SNull,
    SNumber,
    SObject,
    SOptional,
    SText,
    SUnion,
    TGe,
    TGt,
)
from schematic_spark.schema.interpret import parse_and_validate
from schematic_spark.schema.parser import dump_spec, parse_spec
from schematic_spark.validation import validate


def _verdicts(res):
    return [
        (r["doc_id"], r["_verdict"], r["_decoding_error"])
        for r in res.annotated.select(
            "doc_id", "_verdict", "_decoding_error"
        ).orderBy("doc_id").collect()
    ]


# ---------------------------------------------------------------------------
# ADVICE-high regression: mask vs structural on SOptional(SObject) items
# ---------------------------------------------------------------------------

def test_mask_descends_optional_object_array_items(spark):
    spec = SObject((
        ("doc_id", SText()),
        ("arr", SArray(SOptional(SObject((("x", SText()),))))),
    ))
    st = StructType([
        StructField("doc_id", StringType()),
        StructField("arr", ArrayType(
            StructType([StructField("x", StringType())]))),
    ])
    rows = [
        ("a", [{"x": None}]),   # required text field x missing → decode err
        ("b", [{"x": "ok"}]),   # fine
        ("c", [None]),          # optional item null → fine
        ("d", []),              # empty → fine
    ]
    res = validate(spark.createDataFrame(rows, st), spec)
    got = {r[0]: (r[1], r[2]) for r in _verdicts(res)}
    assert got["a"] == ("DecodingError", 'No text field: "x"')
    assert got["b"] == ("Valid", None)
    assert got["c"] == ("Valid", None)
    assert got["d"] == ("Valid", None)
    # interpreter agreement
    assert parse_and_validate(
        spec, {"doc_id": "a", "arr": [{"x": None}]}
    ).verdict == "DecodingError"
    assert parse_and_validate(
        spec, {"doc_id": "b", "arr": [{"x": "ok"}]}
    ).verdict == "Valid"


def test_mask_descends_nested_array_of_arrays(spark):
    # deeper nesting: array<array<struct>> — shared predicate must recurse
    spec = SObject((
        ("doc_id", SText()),
        ("arr", SArray(SOptional(SArray(SObject((("y", SNumber()),)))))),
    ))
    st = StructType([
        StructField("doc_id", StringType()),
        StructField("arr", ArrayType(ArrayType(
            StructType([StructField("y", DoubleType())])))),
    ])
    rows = [
        ("a", [[{"y": None}]]),  # missing number field deep down
        ("b", [[{"y": 1.0}]]),
    ]
    res = validate(spark.createDataFrame(rows, st), spec)
    got = {r[0]: r[1] for r in _verdicts(res)}
    assert got["a"] == "DecodingError"
    assert got["b"] == "Valid"


# ---------------------------------------------------------------------------
# Union no-match
# ---------------------------------------------------------------------------

def _union_spec(validate_branches=False):
    return SObject((
        ("doc_id", SText()),
        ("u", SUnion(
            (SText((TGt(3),)), SNumber()),
            validate_branches=validate_branches,
        )),
    ))


_UNION_ST = StructType([
    StructField("doc_id", StringType()),
    StructField("u", StructType([
        StructField("alt_0", StringType()),
        StructField("alt_1", DoubleType()),
    ])),
])


def test_union_no_match_is_decoding_error(spark):
    spec = _union_spec()
    rows = [
        ("a", {"alt_0": None, "alt_1": None}),  # no branch → empty union
        ("b", {"alt_0": "text", "alt_1": None}),
        ("c", {"alt_0": None, "alt_1": 7.0}),
        ("d", None),                            # whole struct null → no match
    ]
    res = validate(spark.createDataFrame(rows, _UNION_ST), spec)
    got = {r[0]: (r[1], r[2]) for r in _verdicts(res)}
    assert got["a"] == ("DecodingError", "empty union")
    assert got["b"] == ("Valid", None)
    assert got["c"] == ("Valid", None)
    assert got["d"] == ("DecodingError", "empty union")
    # interpreter: a value matching no branch fails the same way
    r = parse_and_validate(
        SObject((("u", SUnion((SText(), SNumber()))),)), {"u": True}
    )
    assert r.verdict == "DecodingError"
    assert r.decoding_error == "empty union"


def test_union_null_branch_absorbs_null(spark):
    spec = SObject((
        ("doc_id", SText()),
        ("u", SUnion((SText(), SNull()))),
    ))
    st = StructType([
        StructField("doc_id", StringType()),
        StructField("u", StructType([StructField("alt_0", StringType())])),
    ])
    rows = [("a", {"alt_0": None}), ("b", {"alt_0": "x"})]
    res = validate(spark.createDataFrame(rows, st), spec)
    got = {r[0]: r[1] for r in _verdicts(res)}
    assert got == {"a": "Valid", "b": "Valid"}


def test_union_in_array_null_element(spark):
    spec = SObject((
        ("doc_id", SText()),
        ("arr", SArray(SUnion((SText(), SNumber())))),
    ))
    st = StructType([
        StructField("doc_id", StringType()),
        StructField("arr", ArrayType(StructType([
            StructField("alt_0", StringType()),
            StructField("alt_1", DoubleType()),
        ]))),
    ])
    rows = [
        ("a", [{"alt_0": None, "alt_1": None}]),  # element matches nothing
        ("b", [{"alt_0": "s", "alt_1": None}]),
    ]
    res = validate(spark.createDataFrame(rows, st), spec)
    got = {r[0]: r[1] for r in _verdicts(res)}
    assert got["a"] == "DecodingError"
    assert got["b"] == "Valid"


# ---------------------------------------------------------------------------
# validate_branches opt-in
# ---------------------------------------------------------------------------

def test_union_branch_validation_opt_in(spark):
    rows = [("a", {"alt_0": "ab", "alt_1": None})]  # len 2 violates TGt(3)

    noop = validate(
        spark.createDataFrame(rows, _UNION_ST), _union_spec(False)
    )
    assert _verdicts(noop)[0][1] == "Valid"  # Validation.hs:244 parity

    strict = validate(
        spark.createDataFrame(rows, _UNION_ST), _union_spec(True)
    )
    ann = strict.annotated.collect()[0]
    assert ann["_verdict"] == "ValidationError"
    assert [(v["path"], v["error"]) for v in ann["_violations"]] == [
        (".u", "length should be > 3")
    ]
    # interpreter twin honours the per-node flag
    spec = SObject((("u", SUnion((SText((TGt(3),)), SNumber()),
                                 validate_branches=True)),))
    r = parse_and_validate(spec, {"u": "ab"})
    assert r.verdict == "ValidationError"
    assert r.violations == [(".u", "length should be > 3")]


def test_union_branch_structural_descent(spark):
    # first-matched branch is an object with a missing required field
    spec = SObject((
        ("doc_id", SText()),
        ("u", SUnion((SObject((("x", SText()),)), SNumber()))),
    ))
    st = StructType([
        StructField("doc_id", StringType()),
        StructField("u", StructType([
            StructField("alt_0", StructType([
                StructField("x", StringType())])),
            StructField("alt_1", DoubleType()),
        ])),
    ])
    rows = [
        ("a", {"alt_0": {"x": None}, "alt_1": None}),  # branch broken
        ("b", {"alt_0": {"x": "ok"}, "alt_1": None}),
        ("c", {"alt_0": None, "alt_1": 2.0}),
    ]
    res = validate(spark.createDataFrame(rows, st), spec)
    got = {r[0]: r[1] for r in _verdicts(res)}
    assert got["a"] == "DecodingError"
    assert got["b"] == "Valid"
    assert got["c"] == "Valid"


def test_union_spec_roundtrip():
    spec = SUnion((SText(), SNumber()), validate_branches=True)
    assert parse_spec(dump_spec(spec)) == spec
    spec2 = SUnion((SText(), SNull()))
    assert parse_spec(dump_spec(spec2)) == spec2


# ---------------------------------------------------------------------------
# Raw-JSON ingest: missing key vs explicit null vs wrong type (SNull)
# ---------------------------------------------------------------------------

def test_json_null_field_three_way(spark):
    from schematic_spark.sources.json_ingest import validate_json_strings

    spec = SObject((
        ("foo", SText()),
        ("bar", SNull()),
    ))
    rows = [
        ("missing", '{"foo": "a"}'),
        ("explicit_null", '{"foo": "a", "bar": null}'),
        ("wrong_type", '{"foo": "a", "bar": 5}'),
        ("malformed", '{"foo": '),
    ]
    df = spark.createDataFrame(rows, "doc_id string, raw string")
    res = validate_json_strings(df, "raw", spec)
    got = {
        r["doc_id"]: (r["_verdict"], r["_decoding_error"])
        for r in res.annotated.select(
            "doc_id", "_verdict", "_decoding_error"
        ).collect()
    }
    assert got["missing"] == ("DecodingError", 'No null field: "bar"')
    assert got["explicit_null"] == ("Valid", None)
    assert got["wrong_type"] == ("DecodingError", "expected Null")
    assert got["malformed"] == ("DecodingError", "malformed json")


# ---------------------------------------------------------------------------
# Tag-column union encoding — the north-rule span shape
# (struct<kind,text,media_ref,offset>); round-3 task: named-field /
# tag-column branches instead of alt_i.
# ---------------------------------------------------------------------------

SPAN_UNION = SUnion(
    (SText((TGt(0),)), SText()),
    branch_fields=("text", "media_ref"),
    tag_field="kind",
    tags=("text", "media"),
    validate_branches=True,
)

SPAN_SPEC = SObject((
    ("doc_id", SText()),
    ("spans", SArray(SPAN_UNION)),
))

SPAN_DDL = (
    "doc_id string, spans array<struct<"
    "kind string, text string, media_ref string, offset int>>"
)


class TestTaggedUnion:
    def test_conformance_kind_tagged_struct(self, spark):
        df = spark.createDataFrame(
            [("d", [("text", "hello", None, 0)])], SPAN_DDL
        )
        res = validate(df, SPAN_SPEC)  # preflight passes
        assert res.annotated.collect()[0]["_verdict"] == "Valid"

    def test_conformance_rejects_missing_branch_column(self, spark):
        from schematic_spark.compiler import SchemaMismatchError

        df = spark.createDataFrame(
            [("d", [("text", "hello", 0)])],
            "doc_id string, spans array<struct<"
            "kind string, text string, offset int>>",
        )
        with pytest.raises(SchemaMismatchError, match="media_ref"):
            validate(df, SPAN_SPEC)

    def test_conformance_rejects_nonstring_tag(self, spark):
        from schematic_spark.compiler import SchemaMismatchError

        df = spark.createDataFrame(
            [("d", [(1, "hello", None)])],
            "doc_id string, spans array<struct<"
            "kind int, text string, media_ref string>>",
        )
        with pytest.raises(SchemaMismatchError, match="tag must be string"):
            validate(df, SPAN_SPEC)

    def test_union_tag_assignment(self, spark):
        from pyspark.sql import functions as F

        from schematic_spark.compiler import union_tag

        df = spark.createDataFrame(
            [("d", [
                ("text", "hello", None, 0),
                ("media", None, "m-1", 1),
                ("junk", None, None, 2),
                (None, "orphan", None, 3),
            ])],
            SPAN_DDL,
        )
        tags = df.select(
            F.transform(
                "spans", lambda s: union_tag(s, SPAN_UNION)
            ).alias("t")
        ).collect()[0]["t"]
        assert tags == [0, 1, -1, -1]

    def test_no_match_and_missing_payload(self, spark):
        rows = [
            ("ok_text", [("text", "hi", None, 0)]),
            ("ok_media", [("media", None, "m-9", 0)]),
            ("bad_tag", [("wat", None, None, 0)]),
            ("null_tag", [(None, "x", None, 0)]),
            ("text_no_payload", [("text", None, None, 0)]),
            ("constraint_fail", [("text", "", None, 0)]),  # TGt(0) on text
        ]
        df = spark.createDataFrame(rows, SPAN_DDL)
        res = validate(df, SPAN_SPEC)
        got = {
            r["doc_id"]: (r["_verdict"], r["_decoding_error"])
            for r in res.annotated.collect()
        }
        assert got["ok_text"] == ("Valid", None)
        assert got["ok_media"] == ("Valid", None)
        assert got["bad_tag"] == ("DecodingError", "empty union")
        assert got["null_tag"] == ("DecodingError", "empty union")
        assert got["text_no_payload"] == (
            "DecodingError", 'No text field: "text"'
        )
        assert got["constraint_fail"][0] == "ValidationError"

    def test_tagged_union_spec_roundtrip(self):
        assert parse_spec(dump_spec(SPAN_UNION)) == SPAN_UNION
        named = SUnion((SText(), SNumber()), branch_fields=("t", "n"))
        assert parse_spec(dump_spec(named)) == named


# ---------------------------------------------------------------------------
# Raw-JSON unions — kind-faithful decode via VARIANT (round 3)
# ---------------------------------------------------------------------------

def test_raw_json_union_kind_dispatch(spark):
    from schematic_spark.schema.ast import NGt
    from schematic_spark.sources.json_ingest import validate_json_strings

    spec = SObject((
        ("doc_id", SText()),
        ("u", SUnion((SText((TGt(2),)), SNumber((NGt(10),))),
                     validate_branches=True)),
        ("opt_u", SOptional(SUnion((SText(), SNumber())))),
    ))
    rows = [
        ("text_ok", '{"doc_id":"a","u":"hello"}'),
        ("num_ok", '{"doc_id":"b","u":42}'),
        ("text_short", '{"doc_id":"c","u":"hi"}'),     # TGt(2) violated
        ("num_small", '{"doc_id":"d","u":5}'),         # NGt(10) violated
        ("missing_u", '{"doc_id":"e"}'),
        ("null_u", '{"doc_id":"f","u":null}'),
        ("wrong_kind", '{"doc_id":"g","u":true}'),
        ("opt_present", '{"doc_id":"h","u":"xyz","opt_u":7}'),
        ("malformed", '{"doc_id":'),
    ]
    df = spark.createDataFrame(rows, "k string, raw string")
    res = validate_json_strings(df, "raw", spec)
    got = {
        r["k"]: (r["_verdict"], r["_decoding_error"])
        for r in res.annotated.collect()
    }
    assert got["text_ok"] == ("Valid", None)
    assert got["num_ok"] == ("Valid", None)
    assert got["text_short"] == ("ValidationError", None)
    assert got["num_small"] == ("ValidationError", None)
    # missing / explicit-null / unmatched kind all bottom the
    # alternative chain out — "empty union" (Schema.hs:514-519)
    for k in ("missing_u", "null_u", "wrong_kind"):
        assert got[k] == ("DecodingError", "empty union"), k
    assert got["opt_present"] == ("Valid", None)
    assert got["malformed"] == ("DecodingError", "malformed json")


def test_raw_json_union_unsupported_shapes_raise(spark):
    from schematic_spark.sources.json_ingest import validate_json_strings

    df = spark.createDataFrame([("x", "{}")], "k string, raw string")
    two_objects = SObject((
        ("u", SUnion((SObject((("a", SText()),)),
                      SObject((("b", SText()),)))),),
    ))
    with pytest.raises(NotImplementedError, match="share JSON kind"):
        validate_json_strings(df, "raw", two_objects)
    nested = SObject((
        ("o", SObject((("u", SUnion((SText(), SNumber()))),))),
    ))
    with pytest.raises(NotImplementedError, match="below the top level"):
        validate_json_strings(df, "raw", nested)
    snull_alt = SObject((("u", SUnion((SText(), SNull()))),))
    with pytest.raises(NotImplementedError, match="SNull"):
        validate_json_strings(df, "raw", snull_alt)


def test_raw_json_tagged_union_rides_from_json(spark):
    """A kind-tagged union is a plain struct in raw JSON — from_json
    carries it at any depth; machinery dispatches on the tag."""
    from schematic_spark.sources.json_ingest import validate_json_strings

    spec = SObject((
        ("doc_id", SText()),
        ("spans", SArray(SPAN_UNION)),
    ))
    rows = [
        ("ok", '{"doc_id":"a","spans":[{"kind":"text","text":"hi"},'
               '{"kind":"media","media_ref":"m-1"}]}'),
        ("bad_tag", '{"doc_id":"b","spans":[{"kind":"wat"}]}'),
        ("no_payload", '{"doc_id":"c","spans":[{"kind":"text"}]}'),
    ]
    df = spark.createDataFrame(rows, "k string, raw string")
    res = validate_json_strings(df, "raw", spec)
    got = {
        r["k"]: (r["_verdict"], r["_decoding_error"])
        for r in res.annotated.collect()
    }
    assert got["ok"] == ("Valid", None)
    assert got["bad_tag"] == ("DecodingError", "empty union")
    assert got["no_payload"] == ("DecodingError", 'No text field: "text"')


def test_raw_json_type_mismatch_is_field_level(spark):
    """Round 3: a type-mismatched field is the reference's structural
    'expected <Kind>' DecodingError at the field path (interpret.py:
    101-126) — NOT whole-document 'malformed json' (that message is
    reserved for syntactic failures / non-object top levels)."""
    from schematic_spark.sources.json_ingest import validate_json_strings

    spec = SObject((
        ("name", SText()),
        ("score", SNumber()),
        ("tags", SOptional(SArray(SText()))),
    ))
    rows = [
        ("ok", '{"name":"a","score":5,"tags":["x"]}'),
        ("coerced", '{"name":7,"score":5}'),       # number→text coerces
        ("bad_score", '{"name":"a","score":"x"}'),
        ("bad_opt", '{"name":"a","score":5,"tags":7}'),  # optional too
        ("missing", '{"score":5}'),
        ("syntax", '{"name": '),
        ("top_scalar", "5"),
    ]
    df = spark.createDataFrame(rows, "k string, raw string")
    res = validate_json_strings(df, "raw", spec)
    got = {
        r["k"]: (r["_verdict"], r["_decoding_error"])
        for r in res.annotated.collect()
    }
    assert got["ok"] == ("Valid", None)
    assert got["coerced"] == ("Valid", None)  # documented leniency
    assert got["bad_score"] == ("DecodingError", "expected Number")
    assert got["bad_opt"] == ("DecodingError", "expected Array")
    assert got["missing"] == ("DecodingError", 'No text field: "name"')
    assert got["syntax"] == ("DecodingError", "malformed json")
    assert got["top_scalar"] == ("DecodingError", "malformed json")


def test_raw_json_named_snull_union_rejects_wrong_kind(spark):
    """A branch_fields union with an SNull alternative has
    _union_matched ≡ true (the all-null struct IS the SNull match), so
    the typed layer alone cannot see a wrong-kind raw value that
    from_json nulled out — the ingest layer must turn (raw token
    present, struct slot null) into the no-match DecodingError instead
    of a silent false Valid."""
    from schematic_spark.sources.json_ingest import validate_json_strings

    spec = SObject((
        ("doc_id", SText()),
        ("u", SUnion((SText(), SNull()), branch_fields=("s", "n"))),
    ))
    rows = [
        ("ok_text", '{"doc_id":"a","u":{"s":"x"}}'),
        ("ok_null", '{"doc_id":"b","u":null}'),
        ("ok_missing", '{"doc_id":"c"}'),
        ("wrong_scalar", '{"doc_id":"d","u":5}'),
        ("wrong_array", '{"doc_id":"e","u":[1]}'),
    ]
    df = spark.createDataFrame(rows, "k string, raw string")
    res = validate_json_strings(df, "raw", spec)
    got = {
        r["k"]: (r["_verdict"], r["_decoding_error"])
        for r in res.annotated.collect()
    }
    assert got["ok_text"] == ("Valid", None)
    # literal null / absent field are the SNull match (typed-table
    # parity: an all-null branch struct validates as the null branch)
    assert got["ok_null"] == ("Valid", None)
    assert got["ok_missing"] == ("Valid", None)
    for k in ("wrong_scalar", "wrong_array"):
        assert got[k] == ("DecodingError", "empty union"), (k, got[k])


class TestOptionalRawUnionNoMatch:
    """Round-3 review regression: an SOptional-wrapped named/tagged
    union must NOT validate as Valid when the raw value has the wrong
    JSON kind — from_json nulls the slot and the optional would treat
    it as absent without the raw-token check in the ingest layer."""

    def test_optional_named_union_wrong_kind_is_decoding_error(self, spark):
        from schematic_spark.schema import (
            SNumber, SObject, SOptional, SText, SUnion,
        )
        from schematic_spark.sources import validate_json_strings

        spec = SObject((
            ("id", SText()),
            ("u", SOptional(SUnion(
                (SText(), SNumber()), branch_fields=("t", "n")
            ))),
        ))
        df = spark.createDataFrame(
            [
                ('{"id":"a","u":5}',),          # wrong kind -> error
                ('{"id":"a","u":{"t":"x"}}',),  # branch match -> Valid
                ('{"id":"a"}',),                # missing -> Valid
                ('{"id":"a","u":null}',),       # explicit null -> Valid
            ],
            "raw string",
        )
        res = validate_json_strings(df, "raw", spec, keep_raw=True)
        got = {r.raw: (r._verdict, r._decoding_error)
               for r in res.annotated.select(
                   "raw", "_verdict", "_decoding_error").collect()}
        assert got['{"id":"a","u":5}'] == ("DecodingError", "empty union")
        assert got['{"id":"a","u":{"t":"x"}}'][0] == "Valid"
        assert got['{"id":"a"}'][0] == "Valid"
        assert got['{"id":"a","u":null}'][0] == "Valid"

    def test_tagged_union_without_branch_fields_rejected(self, spark):
        import pytest

        from schematic_spark.schema import SNumber, SObject, SText, SUnion
        from schematic_spark.sources import validate_json_strings

        spec = SObject((
            ("u", SUnion((SText(), SNumber()),
                         tag_field="kind", tags=("a", "b"))),
        ))
        df = spark.createDataFrame([('{"u":1}',)], "raw string")
        with pytest.raises(NotImplementedError, match="branch_fields"):
            validate_json_strings(df, "raw", spec)
