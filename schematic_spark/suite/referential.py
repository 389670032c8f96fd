"""Referential-integrity checks — north-rule operator (BASELINE.json:6:
"referential checks via broadcast/sort-merge hash joins against dimension
tables"). Absent in the reference (no joins exist there; SURVEY §2.9).

Violations are extracted with a LEFT ANTI join fact→dim: rows whose
foreign key has no match. Join strategy:

* ``broadcast='auto'`` — let AQE decide (it converts to broadcast at
  runtime if the dim is under the threshold);
* ``broadcast=True``  — force ``F.broadcast(dim)``: zero shuffle of the
  fact side, the only sane plan when the fact is 100 TB and the dim fits
  in executor memory;
* ``broadcast=False`` — sort-merge (dims too big to broadcast).

Null foreign keys are counted separately, not as dangling (SQL FK
semantics: NULL references nothing and violates nothing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dangling_rows(
    fact: DataFrame,
    dim: DataFrame,
    on: dict[str, str] | str,
    *,
    broadcast: bool | str = "auto",
) -> DataFrame:
    """Fact rows whose FK is non-null and matches no dim row (LEFT ANTI)."""
    if isinstance(on, str):
        on = {on: on}
    dim_keys = dim.select(
        *[F.col(d).alias(f"_dim_{d}") for d in on.values()]
    ).dropDuplicates()
    if broadcast is True:
        dim_keys = F.broadcast(dim_keys)
    elif broadcast is False:
        # honor the caller's "too big to broadcast": without the merge
        # hint AQE may still auto-broadcast a small-enough key set
        dim_keys = dim_keys.hint("merge")
    cond = None
    for fk, dk in on.items():
        c = F.col(fk) == F.col(f"_dim_{dk}")
        cond = c if cond is None else (cond & c)
    non_null = None
    for fk in on:
        c = F.col(fk).isNotNull()
        non_null = c if non_null is None else (non_null & c)
    return fact.where(non_null).join(dim_keys, cond, "left_anti")


def bloom_bitmap(
    dim: DataFrame,
    key: str,
    *,
    m_bits: int,
    n_hashes: int,
) -> DataFrame:
    """Distributed Bloom bitset over the dim's key column as a
    (word_idx BIGINT, word BIGINT) relation: each key sets ``n_hashes``
    bit positions ``pmod(xxhash64(key, i), m_bits)``; positions pack
    into 64-bit words via a ``bit_or`` hash-agg. Size is O(m_bits/64)
    rows regardless of dim row count — 10 bits/key packs ~80× smaller
    than broadcasting the key set itself."""
    pos_rows = None
    for i in range(n_hashes):
        p = F.pmod(F.xxhash64(F.col(key), F.lit(i)), F.lit(m_bits))
        r = (
            dim.where(F.col(key).isNotNull())
            .select(p.alias("_pos"))
            .select(
                (F.col("_pos") / 64).cast("long").alias("word_idx"),
                F.expr("shiftleft(1L, CAST(_pos % 64 AS INT))")
                .alias("bit"),
            )
        )
        pos_rows = r if pos_rows is None else pos_rows.unionAll(r)
    return pos_rows.groupBy("word_idx").agg(
        F.expr("bit_or(bit)").alias("word")
    )


def dangling_rows_bloom(
    fact: DataFrame,
    dim: DataFrame,
    on: dict[str, str] | str,
    *,
    n_keys: int | None = None,
    bits_per_key: int = 10,
    n_hashes: int = 5,
) -> DataFrame:
    """:func:`dangling_rows` for dims too big to broadcast as a hash
    relation: a Bloom prefilter drops the (overwhelming) matched
    majority of the fact WITHOUT shuffling it, then the exact LEFT ANTI
    join runs over only the suspected-dangling rows.

    Plan shape: the bitmap relation (O(bits_per_key × n_keys / 64)
    rows ≈ 10 bits per dim key) broadcasts; each of the ``n_hashes``
    bit tests is a map-side BroadcastHashJoin on the word index — the
    100-TB fact side never shuffles during prefiltering. Rows passing
    all bit tests (true dangling + ~0.8% false positives at the
    defaults) continue to the exact anti-join, so only ε of the fact
    reaches that exchange while the result stays EXACT (Bloom filters
    have no false negatives; the anti-join removes the false
    positives). Mirrors Spark's own runtime-filter rewrite
    (InjectRuntimeFilter), expressed with public primitives so the
    threshold and sizing stay under caller control.

    ``n_keys`` sizes the filter; when omitted an eager ``dim.count()``
    runs at construction time (pass the known cardinality in anything
    hot). Composite keys are not supported — prefilter on the highest-
    cardinality column and let the exact join enforce the rest."""
    if isinstance(on, str):
        on = {on: on}
    if len(on) != 1:
        raise ValueError(
            "dangling_rows_bloom prefilters on exactly one key column; "
            f"got {sorted(on)} — prefilter on one and verify the rest "
            "in dangling_rows"
        )
    (fk, dk), = on.items()
    if n_keys is None:
        n_keys = dim.where(F.col(dk).isNotNull()).count()
    # ≥64 bits so tiny/empty dims still build a valid 1-word bitmap
    m_bits = max(64, bits_per_key * n_keys)
    bitmap = bloom_bitmap(dim, dk, m_bits=m_bits, n_hashes=n_hashes)

    suspects = fact.where(F.col(fk).isNotNull())
    tests = []
    for i in range(n_hashes):
        p = F.pmod(F.xxhash64(F.col(fk), F.lit(i)), F.lit(m_bits))
        w = (p / 64).cast("long")
        b = (p % 64).cast("int")
        bm = F.broadcast(
            bitmap.select(
                F.col("word_idx").alias(f"_w{i}"),
                F.col("word").alias(f"_word{i}"),
            )
        )
        suspects = suspects.withColumns(
            {f"_w{i}": w, f"_b{i}": b}
        ).join(bm, f"_w{i}", "left")
        tests.append(
            F.expr(f"(shiftright(coalesce(_word{i}, 0L), _b{i}) & 1) = 1")
        )
    # a row whose bits are ALL set might be in the dim (candidate);
    # any clear bit proves it is dangling — no join needed for those
    all_set = tests[0]
    for t in tests[1:]:
        all_set = all_set & t
    cols = [c for c in fact.columns]
    proven = suspects.where(~all_set).select(*cols)
    candidates = suspects.where(all_set).select(*cols)
    fp_checked = dangling_rows(candidates, dim, on, broadcast=False)
    return proven.unionAll(fp_checked)


def referential_report(
    fact: DataFrame,
    dim: DataFrame,
    on: dict[str, str] | str,
    *,
    broadcast: bool | str = "auto",
) -> DataFrame:
    """(n_rows, n_null_fk, n_dangling, ref_ok) — one row."""
    if isinstance(on, str):
        on = {on: on}
    null_fk = None
    for fk in on:
        c = F.col(fk).isNull()
        null_fk = c if null_fk is None else (null_fk | c)
    totals = fact.agg(
        F.count(F.lit(1)).alias("n_rows"),
        # coalesce: sum over zero rows is NULL, not 0
        F.coalesce(F.sum(null_fk.cast("long")), F.lit(0))
        .alias("n_null_fk"),
    )
    dangling = dangling_rows(fact, dim, on, broadcast=broadcast).agg(
        F.count(F.lit(1)).alias("n_dangling")
    )
    return (
        totals.crossJoin(dangling)
        .withColumn("ref_ok", F.col("n_dangling") == 0)
    )
