"""Raw-JSON ingest — the engine analog of ``decodeAndValidateJson``
(``/root/reference/src/Data/Schematic.hs:78-85``): bytes → decode →
structural parse → validate, all three layers distinguishable.

``from_json`` is Catalyst-native (whole-stage codegen'd JSON parsing);
a malformed document parses to NULL, which we report with the
reference's exact message ``"malformed json"`` (Data/Schematic.hs:84).
Missing-required-field and type-mismatch detection then ride the normal
structural layer, with one JSON-only refinement: a *missing key* inside
a present document is distinguishable from an explicit ``null`` via
``json_object_keys``, matching the reference's optional-field parse
(missing OR null both → None, but a required SNull field accepts only
explicit null).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..compiler import spark_type_for
from ..schema.ast import SObject
from ..validation import (
    DECODING_ERROR_COL,
    STRUCTURAL_COL,
    VERDICT_COL,
    ValidationResult,
    as_schema,
    validate,
)

MALFORMED = "malformed json"


def validate_json_strings(
    df: DataFrame, json_col: str, spec, *, keep_raw: bool = False
) -> ValidationResult:
    """Parse a string column of JSON documents against the spec and
    validate. Malformed documents get verdict DecodingError with
    message ``"malformed json"``; everything else follows the standard
    3-way verdict."""
    from pyspark.sql.types import StringType, StructField, StructType

    schema = as_schema(spec)
    if not isinstance(schema, SObject):
        raise TypeError("top-level spec must be an object")
    st = spark_type_for(schema)
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
        F.col("_doc")[name].alias(name) for name in schema.field_names()
    ]
    passthrough = [c for c in df.columns if c != json_col] + (
        [json_col] if keep_raw else []
    )
    flat = parsed.select(
        *[F.col(c) for c in passthrough],
        (
            F.col("_doc")["_corrupt"].isNotNull()
            | F.col(json_col).isNull()
            | F.col("_doc").isNull()
        ).alias("_malformed"),
        *flat_cols,
    )
    res = validate(flat, schema)
    ann = res.annotated
    malformed_err = F.array(
        F.struct(F.lit("").alias("path"), F.lit(MALFORMED).alias("error"))
    )
    ann = (
        ann
        .withColumn(
            STRUCTURAL_COL,
            F.when(F.col("_malformed"), malformed_err)
            .otherwise(F.col(STRUCTURAL_COL)),
        )
        .withColumn(
            VERDICT_COL,
            F.when(F.col("_malformed"), F.lit("DecodingError"))
            .otherwise(F.col(VERDICT_COL)),
        )
        .withColumn(
            DECODING_ERROR_COL,
            F.when(F.col("_malformed"), F.lit(MALFORMED))
            .otherwise(F.col(DECODING_ERROR_COL)),
        )
        .drop("_malformed")
    )
    return ValidationResult(annotated=ann, schema=schema)
