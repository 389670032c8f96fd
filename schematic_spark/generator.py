"""Deterministic synthetic data — the engine analog of the reference's
schema-directed SmallCheck series (``Generator.hs:18-91``,
``Generator/Regex.hs:21-76``), re-targeted at the north-rule input table
(BASELINE.json:15)::

    doc_id: string
    spans:  array<struct<kind:string, text:string,
                         media_ref:string, offset:int>>

Design constraints:

* **Distributed**: built from ``spark.range(n)`` + pure column
  expressions — no driver-side loops, so the same code generates 10^3
  rows for tests and 10^9+ for scale runs.
* **Deterministic & twin-able**: all pseudo-randomness is a Lehmer-style
  LCG over int64-safe arithmetic (products < 2^63 — ANSI mode would
  throw on overflow), implemented identically in Spark columns and in
  :func:`expected_doc` (the Python twin used for span-sequence equality
  tests — per-row invariant (kind, text, media_ref, order),
  BASELINE.json:15). Seeded; no wall-clock anywhere.
* **Controlled violations**: per-class millage rates inject duplicate
  doc_ids, dangling media_refs, out-of-order offsets, bad kinds, empty
  texts and oversized span arrays; docs with no spans occur naturally.
* **Skew**: a configurable share of docs lands on one hot doc_id prefix
  (exercises the salted uniqueness path).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .schema.ast import (
    AGe,
    ALe,
    NGe,
    SArray,
    SNumber,
    SObject,
    SOptional,
    SText,
    TEnum,
    TGe,
    TGt,
    TRegex,
)
from .schema.helpers import UUID_REGEX

_M = 2147483647  # 2^31 - 1 (Mersenne prime, Lehmer modulus)
_A = 48271
_B = 16807

MAX_SPANS = 8


def _mix(x: Column, salt: int) -> Column:
    """LCG step; int64-safe for x < 2^31 and any row id < ~10^14."""
    return F.pmod(x * F.lit(_A) + F.lit(salt * _B), F.lit(_M))


def _mix_py(x: int, salt: int) -> int:
    return (x * _A + salt * _B) % _M


@dataclass(frozen=True)
class GeneratorConfig:
    n_docs: int
    seed: int = 42
    n_media: int = 1000
    hot_prefix_share_millis: int = 200   # 20% of docs share one prefix
    dup_rate_millis: int = 20            # duplicate doc_id
    dangling_rate_millis: int = 20       # media_ref not in dim
    out_of_order_rate_millis: int = 20   # non-increasing offsets
    bad_kind_rate_millis: int = 20       # kind outside enum
    empty_text_rate_millis: int = 20     # text span with empty text
    oversized_rate_millis: int = 10      # more spans than ALe allows


# The spec the generated table is validated against (F6, FIXTURES.md).
INTERLEAVED_SPEC = SObject((
    ("doc_id", SText((TGt(0),))),
    ("spans", SArray(
        SObject((
            ("kind", SText((TEnum(("text", "media")),))),
            ("text", SOptional(SText((TGe(1),)))),
            ("media_ref", SOptional(SText((TRegex(UUID_REGEX),)))),
            ("offset", SNumber((NGe(0),))),
        )),
        (AGe(1), ALe(MAX_SPANS + 2)),
    )),
))


def media_uuid(media_id: Column) -> Column:
    """Deterministic UUID-shaped string for a media id (lowercase hex,
    matches the reference UUID regex, Helpers.hs:7-8)."""
    h1 = _mix(media_id, 11)
    h2 = F.pmod(_mix(media_id, 12), F.lit(65536))
    h3 = F.pmod(_mix(media_id, 13), F.lit(65536))
    h4 = F.pmod(_mix(media_id, 14), F.lit(65536))
    h5a = F.pmod(_mix(media_id, 15), F.lit(65536))
    h5 = h5a * F.lit(2147483648) + _mix(media_id, 16)
    return F.format_string("%08x-%04x-%04x-%04x-%012x", h1, h2, h3, h4, h5)


def media_uuid_py(media_id: int) -> str:
    h1 = _mix_py(media_id, 11)
    h2 = _mix_py(media_id, 12) % 65536
    h3 = _mix_py(media_id, 13) % 65536
    h4 = _mix_py(media_id, 14) % 65536
    h5 = (_mix_py(media_id, 15) % 65536) * 2147483648 + _mix_py(media_id, 16)
    return f"{h1:08x}-{h2:04x}-{h3:04x}-{h4:04x}-{h5:012x}"


def media_dim(spark: SparkSession, n_media: int) -> DataFrame:
    """Dimension table (media_id, media_ref) for referential checks."""
    mid = F.col("id")
    return spark.range(n_media).select(
        mid.alias("media_id"),
        media_uuid(mid).alias("media_ref"),
    )


def _rate_hit(doc: Column, klass: int, millis: int, seed: int) -> Column:
    return F.pmod(_mix(_mix(doc, seed), 900 + klass), F.lit(1000)) < F.lit(millis)


def _rate_hit_py(doc: int, klass: int, millis: int, seed: int) -> bool:
    return _mix_py(_mix_py(doc, seed), 900 + klass) % 1000 < millis


def interleaved_documents(
    spark: SparkSession, cfg: GeneratorConfig
) -> DataFrame:
    """The synthetic interleaved text+media documents table."""
    i = F.col("id")
    seed = cfg.seed

    dup = _rate_hit(i, 1, cfg.dup_rate_millis, seed) & (i > 0)
    # duplicate docs copy the *previous* doc's identity AND content
    eff = F.when(dup, i - 1).otherwise(i)  # effective content id
    eff_base = _mix(F.pmod(eff, F.lit(_M)), seed)

    hot = F.pmod(_mix(eff, 2), F.lit(1000)) < F.lit(cfg.hot_prefix_share_millis)
    doc_id = F.when(
        hot, F.format_string("hot-%d", eff)
    ).otherwise(
        F.format_string("p%02d-%d", F.pmod(_mix(eff, 3), F.lit(50)), eff)
    )

    oversized = _rate_hit(eff, 6, cfg.oversized_rate_millis, seed)
    n_spans = F.when(
        oversized, F.lit(MAX_SPANS + 5)
    ).otherwise(F.pmod(eff_base, F.lit(MAX_SPANS + 1)))  # 0..MAX_SPANS

    out_of_order = _rate_hit(eff, 3, cfg.out_of_order_rate_millis, seed)
    bad_kind = _rate_hit(eff, 4, cfg.bad_kind_rate_millis, seed)
    empty_text = _rate_hit(eff, 5, cfg.empty_text_rate_millis, seed)
    dangling = _rate_hit(eff, 2, cfg.dangling_rate_millis, seed)

    def span(j: Column) -> Column:
        is_text = F.pmod(j, F.lit(2)) == 0  # interleave text/media
        h = _mix(eff_base + j * F.lit(131), 7)
        kind = (
            F.when(bad_kind & (j == 0), F.lit("bogus"))
            .when(is_text, F.lit("text"))
            .otherwise(F.lit("media"))
        )
        text_len = F.pmod(h, F.lit(20)) + 1
        text = F.when(
            is_text,
            F.when(empty_text & (j == 0), F.lit("")).otherwise(
                F.concat(
                    F.lit("tok"),
                    F.pmod(h, F.lit(97)).cast("string"),
                    F.lit(" "),
                    F.repeat(F.lit("x"), text_len),
                )
            ),
        )  # null for media spans
        media_id = F.when(
            dangling & (j == 1),
            F.lit(cfg.n_media) + F.pmod(h, F.lit(1000)),  # outside dim
        ).otherwise(F.pmod(h, F.lit(cfg.n_media)))
        media_ref = F.when(~is_text, media_uuid(media_id))
        offset = F.when(out_of_order, F.lit(0)).otherwise(
            j * F.lit(7) + F.pmod(_mix(eff_base + j, 8), F.lit(3))
        ).cast("int")
        return F.struct(
            kind.alias("kind"),
            text.alias("text"),
            media_ref.alias("media_ref"),
            offset.alias("offset"),
        )

    spans_full = F.transform(F.sequence(F.lit(0), n_spans), span)
    spans = F.slice(spans_full, 1, n_spans)  # exactly n_spans (maybe 0)

    return spark.range(cfg.n_docs).select(
        doc_id.alias("doc_id"),
        spans.alias("spans"),
    )


# ---------------------------------------------------------------------------
# Python twin — ground truth for span-sequence equality tests
# ---------------------------------------------------------------------------

def expected_doc(i: int, cfg: GeneratorConfig) -> dict:
    """Exact Python replica of :func:`interleaved_documents` for row
    ``i`` of ``spark.range`` — per-row invariant oracle."""
    seed = cfg.seed
    dup = _rate_hit_py(i, 1, cfg.dup_rate_millis, seed) and i > 0
    eff = i - 1 if dup else i
    eff_base = _mix_py(eff % _M, seed)

    hot = _mix_py(eff, 2) % 1000 < cfg.hot_prefix_share_millis
    doc_id = (
        f"hot-{eff}" if hot else f"p{_mix_py(eff, 3) % 50:02d}-{eff}"
    )

    oversized = _rate_hit_py(eff, 6, cfg.oversized_rate_millis, seed)
    n_spans = MAX_SPANS + 5 if oversized else eff_base % (MAX_SPANS + 1)
    out_of_order = _rate_hit_py(eff, 3, cfg.out_of_order_rate_millis, seed)
    bad_kind = _rate_hit_py(eff, 4, cfg.bad_kind_rate_millis, seed)
    empty_text = _rate_hit_py(eff, 5, cfg.empty_text_rate_millis, seed)
    dangling = _rate_hit_py(eff, 2, cfg.dangling_rate_millis, seed)

    spans = []
    for j in range(n_spans):
        is_text = j % 2 == 0
        h = _mix_py(eff_base + j * 131, 7)
        if bad_kind and j == 0:
            kind = "bogus"
        elif is_text:
            kind = "text"
        else:
            kind = "media"
        if is_text:
            if empty_text and j == 0:
                text = ""
            else:
                text = f"tok{h % 97} " + "x" * (h % 20 + 1)
        else:
            text = None
        if dangling and j == 1:
            media_id = cfg.n_media + h % 1000
        else:
            media_id = h % cfg.n_media
        media_ref = None if is_text else media_uuid_py(media_id)
        offset = 0 if out_of_order else j * 7 + _mix_py(eff_base + j, 8) % 3
        spans.append(
            {"kind": kind, "text": text, "media_ref": media_ref,
             "offset": offset}
        )
    return {"doc_id": doc_id, "spans": spans}


# ---------------------------------------------------------------------------
# Span-order + span-sequence operators (engine-level; SURVEY §2.9)
# ---------------------------------------------------------------------------

def non_monotonic_flag(spans_col: str = "spans"):
    """Boolean column: span offsets not strictly increasing. Array-local
    (zip_with over the row's own array) — NO shuffle, unlike the naive
    posexplode + window formulation. Null/empty arrays flag False."""
    spans = F.col(spans_col)
    shifted = F.slice(spans, 2, F.greatest(F.size(spans) - 1, F.lit(0)))
    bad = F.exists(
        F.zip_with(
            F.slice(spans, 1, F.greatest(F.size(spans) - 1, F.lit(0))),
            shifted,
            lambda a, b: b["offset"] <= a["offset"],
        ),
        lambda x: x,
    )
    return F.coalesce(bad, F.lit(False))


def non_monotonic_docs(df: DataFrame) -> DataFrame:
    """Docs whose span offsets are not strictly increasing."""
    return df.where(non_monotonic_flag())


def exploded_spans(df: DataFrame) -> DataFrame:
    """(doc_id, pos, kind, text, media_ref, offset) — the exploded-struct
    view used for span-sequence equality comparison (BASELINE.json:15)."""
    return df.select(
        "doc_id", F.posexplode("spans").alias("pos", "span")
    ).select(
        "doc_id", "pos",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )


def span_sequence_mismatches(
    actual: DataFrame, expected: DataFrame
) -> DataFrame:
    """Rows where the (kind, text, media_ref, order) sequence differs
    between two span tables — full outer join on (doc_id, pos) with
    null-safe comparison. Empty result ⇒ per-row span-sequence equality."""
    a = exploded_spans(actual).alias("a")
    e = exploded_spans(expected).alias("e")
    on = [
        F.col("a.doc_id") == F.col("e.doc_id"),
        F.col("a.pos") == F.col("e.pos"),
    ]
    joined = a.join(e, on, "full_outer")
    same = (
        F.col("a.kind").eqNullSafe(F.col("e.kind"))
        & F.col("a.text").eqNullSafe(F.col("e.text"))
        & F.col("a.media_ref").eqNullSafe(F.col("e.media_ref"))
        & F.col("a.offset").eqNullSafe(F.col("e.offset"))
        & F.col("a.doc_id").isNotNull()
        & F.col("e.doc_id").isNotNull()
    )
    return joined.where(~same)
