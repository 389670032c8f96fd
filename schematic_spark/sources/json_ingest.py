"""Raw-JSON ingest — the engine analog of ``decodeAndValidateJson``
(``/root/reference/src/Data/Schematic.hs:78-85``): bytes → decode →
structural parse → validate, all three layers distinguishable.

``from_json`` is Catalyst-native (whole-stage codegen'd JSON parsing);
a malformed document parses to NULL, which we report with the
reference's exact message ``"malformed json"`` (Data/Schematic.hs:84).
Missing-required-field and type-mismatch detection then ride the normal
structural layer, with one JSON-only refinement the typed-table path
cannot make: a *missing key* inside a present document is
distinguishable from an explicit ``null`` via ``json_object_keys``.
That matters for required ``SNull`` fields (Schema.hs:530-532: only the
literal ``null`` parses): a missing key is the missing-field
DecodingError, an explicit ``null`` is fine, and any other value is an
``expected Null`` mismatch. Optional fields keep the collapsed
semantics (missing OR null both → None, Schema.hs:561-563).
"""

from __future__ import annotations

import re as _re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from ..compiler import VIOLATION_DDL, spark_type_for
from ..schema.ast import SNull, SObject, missing_field_message
from ..validation import (
    DECODING_ERROR_COL,
    STRUCTURAL_COL,
    VERDICT_COL,
    VIOLATIONS_COL,
    ValidationResult,
    as_schema,
    validate,
)

MALFORMED = "malformed json"

_SIMPLE_KEY = _re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _json_path(name: str) -> str:
    return f"$.{name}" if _SIMPLE_KEY.match(name) else f"$['{name}']"


def _cell(path: str, message: str):
    return F.struct(
        F.lit(path).alias("path"), F.lit(message).alias("error")
    )


def validate_json_strings(
    df: DataFrame, json_col: str, spec, *, keep_raw: bool = False
) -> ValidationResult:
    """Parse a string column of JSON documents against the spec and
    validate. Malformed documents get verdict DecodingError with
    message ``"malformed json"``; everything else follows the standard
    3-way verdict."""
    schema = as_schema(spec)
    if not isinstance(schema, SObject):
        raise TypeError("top-level spec must be an object")
    # required-SNull fields carry no data — parse every OTHER field,
    # and check SNull fields straight off the raw JSON (presence + kind)
    null_fields = [n for n, fs in schema.fields if isinstance(fs, SNull)]
    data_fields = [
        (n, fs) for n, fs in schema.fields if not isinstance(fs, SNull)
    ]
    st = StructType([
        StructField(n, spark_type_for(fs), True) for n, fs in data_fields
    ])
    # PERMISSIVE mode yields an all-null struct for malformed input, so
    # null-struct checks can't detect it; the corrupt-record column can
    parse_st = StructType(
        list(st.fields) + [StructField("_corrupt", StringType())]
    )
    parsed = df.withColumn(
        "_doc",
        F.from_json(
            F.col(json_col), parse_st,
            {"columnNameOfCorruptRecord": "_corrupt", "mode": "PERMISSIVE"},
        ),
    )
    flat_cols = [
        F.col("_doc")[name].alias(name) for name, _ in data_fields
    ] + [F.lit(None).cast("void").alias(name) for name in null_fields]
    passthrough = [c for c in df.columns if c != json_col] + (
        [json_col] if keep_raw else []
    )

    # missing-key vs explicit-null for required SNull fields: presence
    # via json_object_keys (null for non-objects → treated as missing),
    # value kind via get_json_object (NULL for both missing and literal
    # null — presence disambiguates; non-NULL ⇒ some other value)
    null_cells = []
    for name in null_fields:
        keys = F.json_object_keys(F.col(json_col))
        present = F.coalesce(
            F.array_contains(keys, name), F.lit(False)
        )
        raw_val = F.get_json_object(F.col(json_col), _json_path(name))
        null_cells.append(F.when(
            ~present, _cell("", missing_field_message(name, SNull()))
        ))
        null_cells.append(F.when(
            present & raw_val.isNotNull(),
            _cell(f".{name}", "expected Null"),
        ))
    null_errs = (
        F.array_compact(F.array(*null_cells)).cast(VIOLATION_DDL)
        if null_cells else F.array().cast(VIOLATION_DDL)
    )

    flat = parsed.select(
        *[F.col(c) for c in passthrough],
        (
            F.col("_doc")["_corrupt"].isNotNull()
            | F.col(json_col).isNull()
            | F.col("_doc").isNull()
        ).alias("_malformed"),
        null_errs.alias("_null_errs"),
        *flat_cols,
    )
    res = validate(flat, schema)
    ann = res.annotated
    malformed_err = F.array(_cell("", MALFORMED))
    structural = (
        F.when(F.col("_malformed"), malformed_err)
        .otherwise(F.concat(F.col("_null_errs"), F.col(STRUCTURAL_COL)))
    )
    ann = (
        ann
        .withColumn(STRUCTURAL_COL, structural)
        .withColumn(
            VERDICT_COL,
            F.when(F.size(F.col(STRUCTURAL_COL)) > 0, F.lit("DecodingError"))
            .when(F.size(F.col(VIOLATIONS_COL)) > 0,
                  F.lit("ValidationError"))
            .otherwise(F.lit("Valid")),
        )
        .withColumn(
            DECODING_ERROR_COL,
            F.try_element_at(F.col(STRUCTURAL_COL), F.lit(1))["error"],
        )
        .drop("_malformed", "_null_errs")
    )
    return ValidationResult(annotated=ann, schema=schema)
