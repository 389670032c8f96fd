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
    (ties broken by id). Output columns = input columns."""
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
