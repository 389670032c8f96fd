"""Deterministic per-group downsampling (corpus mix shaping).

``cap_per_group`` keeps at most N rows per group, chosen by a stable
md5 order over the row id — the "cap documents per domain" operation a
training-mix pipeline runs before interleaving sources. Deterministic
(same rows survive on any engine, cluster layout, or retry — never
``rand()``), uniform (md5 order is independent of any data column), and
engine-portable (the oracle recomputes the same order in SQL).

Scale: a windowed ``row_number`` sends each group to one reducer —
fine for bounded groups, a straggler for a hot domain with billions of
rows. ``two_phase=True`` first caps each (group, salt-bucket) at N —
spreading a hot group over ``salt_buckets`` reducers and discarding all
but ``salt_buckets * N`` of its rows — then runs the exact global cap
on the survivors. Phase 1 is safe: the global md5-order top-N is a
subset of the union of per-bucket top-Ns (every phase-2 survivor ranks
<= N within its own bucket). Same pattern as the salted uniqueness
count (suite/uniqueness.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _order_key(id_col: str, salt: str) -> Column:
    return F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))


def weighted_sample(
    df: DataFrame,
    *,
    group_col: str,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    default_fraction: float = 0.0,
    denominator: int = 10_000,
    salt: str = "mix",
) -> DataFrame:
    """Deterministic per-group Bernoulli sampling — the source-mixing
    step ("keep 100% of books, 30% of web, 5% of logs"). A row
    survives iff its stable md5 bucket falls under its group's
    fraction; groups absent from ``fractions`` get
    ``default_fraction``. Pure projection + filter: zero shuffles,
    reproducible across engines/retries/layouts, and independent
    samples compose via ``salt``.

    NULL ids carry no per-row entropy, so all NULL-id rows share ONE
    deterministic bucket (hash of a sentinel): they survive or drop as
    a block per group rather than being silently filtered out by the
    NULL-propagating hash — at fraction 1.0 every row survives, as the
    contract promises. SQL twins must mirror with
    ``coalesce(CAST(id AS VARCHAR), '__null_id__')``."""
    from schematic_spark.functions.split import split_bucket

    bucket = split_bucket(
        F.coalesce(F.col(id_col).cast("string"), F.lit("__null_id__")),
        denominator=denominator,
        salt=salt,
    )
    thr = F.lit(int(round(default_fraction * denominator)))
    for g, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {g!r} must be in [0, 1]")
        thr = F.when(
            F.col(group_col) == g,
            F.lit(int(round(frac * denominator))),
        ).otherwise(thr)
    return df.where(bucket < thr)


def pack_documents(
    df: DataFrame,
    *,
    token_col: str,
    budget: int,
    shards: int = 64,
    id_col: str = "doc_id",
    salt: str = "pack",
    two_phase: bool = False,
    block_chars: int = 2,
) -> DataFrame:
    """Cross-document training-batch packing: append ``shard`` and
    ``batch_idx`` so each (shard, batch) holds consecutive documents
    whose token budget is ~``budget``.

    Exact global greedy packing is inherently sequential, so the
    scalable formulation shards first (stable md5 shard of the id —
    engine-portable, unlike xxhash) and packs within each shard by
    budget-binning over a deterministic md5 order:
    ``batch = floor(cum_tokens_before / budget)``. A batch may overrun
    by at most one document (the straddler) — the standard
    approximation; batch composition is stable across engines, runs,
    and cluster layouts.

    Parallelism: the per-shard cumulative sum is one reducer PER SHARD
    — at 100 TB the default 64 shards means each reducer scans ~1/64
    of the corpus. Either raise ``shards`` toward the cluster's core
    count (each shard is an independent batch stream, so more shards
    is semantically free), or set ``two_phase=True``: rows are
    sub-blocked by the first ``block_chars`` hex chars of the md5
    order key (block boundaries respect the order, so results are
    BIT-IDENTICAL to the single-phase form), per-(shard, block) local
    cumulative sums run on ``shards * 16**block_chars`` reducers, and
    a tiny per-shard running offset of block totals (bounded by the
    parameters, never by data — safe to broadcast) is added back.
    """
    from schematic_spark.functions.split import split_bucket

    shard = split_bucket(
        F.col(id_col), denominator=shards, salt=salt
    ).alias("shard")
    key = _order_key(id_col, salt)
    out = df.withColumn("shard", shard)
    if not two_phase:
        w = (
            Window.partitionBy("shard")
            .orderBy(key, F.col(id_col))
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        cum_before = F.coalesce(
            F.sum(F.col(token_col)).over(w), F.lit(0)
        )
        return out.withColumn(
            "batch_idx", F.floor(cum_before / F.lit(budget)).cast("int")
        )
    out = out.withColumn("_key", key).withColumn(
        "_blk", F.substring("_key", 1, block_chars)
    )
    w_local = (
        Window.partitionBy("shard", "_blk")
        .orderBy("_key", F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local_before = F.coalesce(
        F.sum(F.col(token_col)).over(w_local), F.lit(0)
    )
    # block totals from the pre-window projection (not the windowed
    # branch — no double window execution); (shard, blk) distinct rows
    # after map-side combine, a tiny aggregate
    totals = out.groupBy("shard", "_blk").agg(
        F.sum(F.col(token_col)).alias("_bt")
    )
    w_off = (
        Window.partitionBy("shard")
        .orderBy("_blk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "shard", "_blk",
        F.coalesce(F.sum("_bt").over(w_off), F.lit(0)).alias("_off"),
    )
    # null-SAFE equi-join: a NULL id yields NULL shard/_key/_blk (md5
    # over null-propagating concat); a plain equi-join would silently
    # drop those rows and break the bit-identical-to-single-phase
    # contract (the single-phase window keeps the NULL partition)
    off = offsets.select(
        F.col("shard").alias("_o_shard"),
        F.col("_blk").alias("_o_blk"),
        "_off",
    )
    return (
        out.withColumn("_local_before", local_before)
        .join(
            F.broadcast(off),
            F.col("shard").eqNullSafe(F.col("_o_shard"))
            & F.col("_blk").eqNullSafe(F.col("_o_blk")),
        )
        .withColumn(
            "batch_idx",
            F.floor(
                (F.col("_local_before") + F.col("_off")) / F.lit(budget)
            ).cast("int"),
        )
        .drop("_key", "_blk", "_local_before", "_off", "_o_shard", "_o_blk")
    )


def cap_per_group(
    df: DataFrame,
    *,
    group_col: str,
    id_col: str,
    n: int,
    salt: str = "cap",
    two_phase: bool = False,
    salt_buckets: int = 32,
) -> DataFrame:
    """At most ``n`` rows per group, by stable md5(salt + id) order
    (ties broken by id). Output columns = input columns.

    PRECONDITION: ``id_col`` must be unique per row. Duplicate ids have
    identical (hash, id) sort keys, so WHICH physical duplicate
    survives the cap is partition-layout-dependent — the determinism
    contract only holds at the id level. For tables with planted
    duplicate ids (the generated interleaved table — CLAUDE.md), key by
    a genuinely unique column or pre-dedupe first."""
    key = _order_key(id_col, salt)
    if two_phase:
        bucket = F.pmod(F.hash(F.col(id_col)), F.lit(salt_buckets))
        w1 = Window.partitionBy(F.col(group_col), bucket).orderBy(
            key, F.col(id_col)
        )
        df = (
            df.withColumn("_rn1", F.row_number().over(w1))
            .where(F.col("_rn1") <= n)
            .drop("_rn1")
        )
    w = Window.partitionBy(group_col).orderBy(key, F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n)
        .drop("_rn")
    )
