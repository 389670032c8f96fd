"""Series generator (SmallCheck analog) + raw-JSON ingest tests."""

from __future__ import annotations

import random
import re

import pytest
from pyspark.sql import functions as F

from schematic_spark.schema import parse_and_validate
from schematic_spark.schema.helpers import (
    ISO8601_DATETIME,
    UUID_REGEX,
)
from schematic_spark.schema.series import (
    conforming_dataframe,
    conforming_rows,
    sample_regex,
)
from schematic_spark.sources import validate_json_strings
from schematic_spark.validation import validate
from tests.test_schema_core import SCHEMA_EXAMPLE, SCHEMA_EXAMPLE2


class TestSeries:
    @pytest.mark.parametrize("pattern", [
        UUID_REGEX, ISO8601_DATETIME, "[0-9]+", "(ab|cd)x?y{2,4}",
        r"\d{3}-\d{2}", "[a-f]{2}(x|yz)*",
    ])
    def test_regex_samples_fullmatch(self, pattern):
        rng = random.Random(5)
        for _ in range(100):
            s = sample_regex(pattern, rng)
            assert re.fullmatch(pattern, s), (pattern, s)

    def test_conforming_rows_validate_pure(self):
        # property from SchemaSpec.hs:113-118: every generated repr is Valid
        for schema in (SCHEMA_EXAMPLE, SCHEMA_EXAMPLE2):
            for row in conforming_rows(schema, 300, seed=9):
                assert parse_and_validate(schema, row).is_valid

    def test_conforming_rows_deterministic(self):
        a = conforming_rows(SCHEMA_EXAMPLE, 50, seed=4)
        b = conforming_rows(SCHEMA_EXAMPLE, 50, seed=4)
        assert a == b

    def test_conforming_dataframe_validates_on_spark(self, spark):
        df = conforming_dataframe(spark, SCHEMA_EXAMPLE2, 100, seed=11)
        res = validate(df, SCHEMA_EXAMPLE2)
        got = {r["verdict"]: r["n_rows"] for r in res.summary().collect()}
        assert got == {"Valid": 100}


class TestJsonIngest:
    def test_three_way_verdict(self, spark):
        rows = [
            ("r1", '{"foo": [13], "bar": null}'),
            ("r2", '{"foo": [3], "bar": null}'),
            ("r3", '{'),                      # malformed
            ("r4", '{"bar": "foo"}'),          # missing required foo
            ("r5", '{"foo": [13], "bar": "quux"}'),
            ("r6", None),                      # null input stays null-ish
        ]
        df = spark.createDataFrame(rows, "row_id string, payload string")
        res = validate_json_strings(df, "payload", SCHEMA_EXAMPLE)
        got = {
            r["row_id"]: (r["_verdict"], r["_decoding_error"])
            for r in res.annotated.collect()
        }
        assert got["r1"] == ("Valid", None)
        assert got["r2"][0] == "ValidationError"
        assert got["r3"] == ("DecodingError", "malformed json")
        assert got["r4"] == ("DecodingError", 'No array field: "foo"')
        assert got["r5"][0] == "ValidationError"
        assert got["r6"][0] == "DecodingError"  # no document at all
        viols = {
            (r["row_id"], r["json_path"], r["error"])
            for r in res.violations("row_id").collect()
        }
        assert (
            ("r2", ".foo[0]", "should be > 10") in viols
            and ("r5", ".bar", 'must be one of ["foo","bar"]') in viols
        )
