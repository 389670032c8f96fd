"""Context-window packing of interleaved span documents.

The north-rule table is a document of ordered spans (text and media
interleaved, SURVEY §1.2); training pipelines consume it as fixed-size
context windows. ``chunk_spans`` performs EXACT greedy span-preserving
packing: walk the span sequence in order, start a new chunk whenever
adding the next span would exceed the character budget, never split a
span. An over-budget single span occupies a chunk alone.

Scale shape: the fold is a row-local ``F.aggregate`` over the spans
array — sequential per document but columnar across documents, pure
Catalyst, ZERO shuffle. This works because the span sequence already
lives inside one row; no window over exploded spans (which would shuffle
every span on doc_id) is ever needed. The only exchange in
``chunk_stats`` is the final per-chunk aggregation's own.

Cost model: a text span costs ``length(text)``; a span with NULL text
(media) costs ``media_cost`` — the "media token budget" stand-in for a
tokenizer's fixed media placeholder length.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _span_cost(s: Column, media_cost: int) -> Column:
    return F.coalesce(F.length(s["text"]), F.lit(media_cost))


def chunk_spans(
    df: DataFrame,
    *,
    spans_col: str = "spans",
    max_chars: int = 48,
    media_cost: int = 16,
    out_col: str = "chunk_ids",
) -> DataFrame:
    """Append ``out_col``: array<int>, same length as ``spans_col``,
    the 0-based chunk index of each span under greedy packing."""
    init = F.struct(
        F.lit(0).alias("idx"),
        F.lit(0).alias("used"),
        F.array().cast("array<int>").alias("out"),
    )

    def step(acc: Column, s: Column) -> Column:
        c = _span_cost(s, media_cost)
        # a chunk only closes once it holds something: used > 0
        new = (acc["used"] > 0) & (acc["used"] + c > max_chars)
        idx = F.when(new, acc["idx"] + 1).otherwise(acc["idx"])
        used = F.when(new, c).otherwise(acc["used"] + c)
        return F.struct(
            idx.alias("idx"),
            used.alias("used"),
            F.concat(acc["out"], F.array(idx)).alias("out"),
        )

    ids = F.aggregate(
        F.col(spans_col), init, step, lambda acc: acc["out"]
    )
    return df.withColumn(out_col, ids)


def chunk_stats(
    df: DataFrame,
    *,
    spans_col: str = "spans",
    id_col: str = "doc_id",
    max_chars: int = 48,
    media_cost: int = 16,
) -> DataFrame:
    """One row per (doc, chunk): (doc_id, chunk_idx, n_spans, n_chars,
    n_media). ``n_chars`` is the packed cost (text lengths + media
    budgets), so every chunk except possibly a lone over-budget span
    satisfies n_chars <= max_chars.

    The per-span structs are materialized as a column BEFORE the
    explode — an explode over an inline-computed array re-runs the
    expression tree per emitted row (the repo's documented
    pushdown/CSE trap).
    """
    chunked = chunk_spans(
        df, spans_col=spans_col, max_chars=max_chars,
        media_cost=media_cost, out_col="_chunk_ids",
    )
    per_span = chunked.select(
        F.col(id_col),
        F.zip_with(
            F.col(spans_col),
            F.col("_chunk_ids"),
            lambda s, c: F.struct(
                c.alias("chunk_idx"),
                _span_cost(s, media_cost).alias("cost"),
                s["media_ref"].isNotNull().cast("int").alias("is_media"),
            ),
        ).alias("_per_span"),
    )
    exploded = per_span.select(
        id_col, F.explode("_per_span").alias("sp")
    )
    return (
        exploded.groupBy(id_col, F.col("sp.chunk_idx").alias("chunk_idx"))
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum("sp.cost").alias("n_chars"),
            F.sum("sp.is_media").alias("n_media"),
        )
    )
