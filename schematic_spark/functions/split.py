"""Deterministic, stratification-friendly dataset splitting.

Training pipelines need train/val/test assignment that is (a) stable
across runs and cluster layouts (never ``rand()`` — a retry or a
repartition must not reshuffle examples between splits), (b) a pure
per-row function so it costs zero shuffles and composes with any
downstream stratified accounting, and (c) portable — the same document
id lands in the same split in any engine.

Assignment: ``bucket = int(md5(id)[:15 hex], 16) % denominator`` — md5
is bit-identical everywhere (Spark ``md5``/``conv``, DuckDB ``md5``,
Python ``hashlib``), 60 bits comfortably avoids both int64 overflow
(ANSI mode throws on it) and modulo bias at any practical denominator.
A salt namespaces independent splits (e.g. one per epoch ablation)
without correlation between them.

The reference has no sampling/splitting (its generator enumerates
conforming documents, ``/root/reference/src/Data/Schematic/
Generator.hs:18-91``); this is engine-level pipeline machinery.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def split_bucket(
    id_col: Column, *, denominator: int = 1000, salt: str = ""
) -> Column:
    """Stable bucket in [0, denominator) from the id (+ optional salt)."""
    h = F.md5(F.concat(F.lit(salt), id_col.cast("string")))
    return (
        F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint")
        % F.lit(denominator)
    )


def assign_split(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    weights: dict[str, int] | None = None,
    denominator: int = 1000,
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Append ``out_col`` with the split name.

    ``weights`` maps name -> share of ``denominator`` (must sum to it),
    in dict order; default 900/50/50 train/val/test per mille. Pure
    projection — no shuffle, no non-determinism.
    """
    weights = weights or {"train": 900, "val": 50, "test": 50}
    if sum(weights.values()) != denominator:
        raise ValueError(
            f"split weights {weights} must sum to denominator={denominator}"
        )
    bucket = split_bucket(
        F.col(id_col), denominator=denominator, salt=salt
    )
    expr = None
    hi = 0
    for name, share in weights.items():
        hi += share
        cond = bucket < hi
        expr = (
            F.when(cond, F.lit(name)) if expr is None
            else expr.when(cond, F.lit(name))
        )
    return df.withColumn(out_col, expr)
