"""As-of (most-recent-prior) join — an engine-level temporal operator.

For every left row, attach the latest right row of the same key whose
timestamp is earlier (strict) or earlier-or-equal (inclusive). The
reference is timeless (single-document validation,
``/root/reference/src/Data/Schematic/Validation.hs``); this is the
standard enrichment primitive for event pipelines (e.g. "the feature
snapshot in force when this example was logged").

Physical strategy — the *union interleave*, not a range join:

  A naive formulation ``left JOIN right ON key AND r.ts < l.ts`` +
  max-per-left explodes to O(|pairs within key|) intermediate rows —
  quadratic on hot keys, fatal at 100 TB. Instead both sides are
  union-ed into one stream tagged by side, sorted per key by
  ``(ts, side, tiebreak)``, and the right-hand payload is carried
  forward with ``last(..., ignoreNulls)`` over an unbounded-preceding
  window. Cost: ONE shuffle on the key (the window exchange), output
  linear in |left| + |right|, no pair blowup. Like any per-key window
  the carry is sequential within a key, so one pathological hot key is
  a single-reducer straggler — still linear work (vs the quadratic
  naive join), but if a single key dominates the corpus, range-bucket
  the time axis first and stitch bucket boundaries.

The carried payload is ONE struct column (non-null exactly for right
rows), so right columns that are legitimately NULL are still carried
faithfully — ``last(ignoreNulls)`` skips whole missing rows, never
individual null fields.

Strictness is encoded purely in the sort order of the ``side`` tag at
equal timestamps: for a strict join the left row sorts *before* the
equal-``ts`` right rows (so it cannot see them); inclusive sorts the
right rows first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: tuple[str, ...],
    strict: bool = True,
    suffix: str = "_asof",
    tiebreak_col: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Left rows + ``<right_col><suffix>`` columns from the most recent
    prior right row of the same key (null when none exists).

    ``right_cols`` are the payload columns to carry; ``tiebreak_col``
    (a right-side column) totalizes the order among equal-``ts`` right
    rows — the *latest* by the tiebreak wins, matching "most recent".

    ``direction='forward'`` flips the match to the NEAREST LATER right
    row (strictly later when ``strict``); among equal-``ts`` rights the
    *earliest* by tiebreak wins. Implemented by walking the interleave
    in descending time — same single-shuffle plan.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    # side tag: the left row must NOT see equal-ts right rows iff strict.
    left_side, right_side = (0, 1) if strict else (1, 0)

    payload = F.struct(*[F.col(c) for c in right_cols])
    # join-ON-key semantics: a NULL key never equals anything and a
    # NULL timestamp never satisfies r.ts < l.ts, so such right rows
    # can never legitimately match — but unfiltered they would sort to
    # the head of the interleave (NULLS FIRST) and be carried as the
    # payload for left rows that have no real prior match. Window
    # partitionBy also groups NULL keys TOGETHER (unlike a join), so
    # dropping null-key right rows is what restores never-match.
    r_tagged = right.where(
        F.col(on).isNotNull() & F.col(right_ts).isNotNull()
    ).select(
        F.col(on).alias("__key"),
        F.col(right_ts).alias("__ts"),
        F.lit(right_side).alias("__side"),
        (F.col(tiebreak_col) if tiebreak_col is not None else F.lit(0))
        .alias("__tie"),
        payload.alias("__r"),
    )
    l_tagged = left.select(
        F.col(on).alias("__key"),
        F.col(left_ts).alias("__ts"),
        F.lit(left_side).alias("__side"),
        F.lit(None).cast(r_tagged.schema["__tie"].dataType).alias("__tie"),
        F.lit(None).cast(r_tagged.schema["__r"].dataType).alias("__r"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__left"),
    )
    r_tagged = r_tagged.withColumn(
        "__left", F.lit(None).cast(l_tagged.schema["__left"].dataType)
    )
    # __tie separates only rows of the same (ts, side) — i.e. right rows;
    # nulls_first keeps left rows' null __tie from outranking anything.
    # forward direction: walk time DESCENDING so "last right seen" is
    # the nearest later one; tiebreak flips so the earliest wins.
    backward = direction == "backward"
    order = [
        F.col("__ts").asc() if backward else F.col("__ts").desc(),
        F.col("__side"),
        F.col("__tie").asc_nulls_first() if backward
        else F.col("__tie").desc_nulls_first(),
    ]
    w = (
        Window.partitionBy("__key")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = l_tagged.unionByName(r_tagged).select(
        "__side",
        "__ts",
        "__left",
        # a null-ts LEFT row gets no payload either (r.ts < NULL is
        # never true): in forward mode it would sort last (DESC puts
        # nulls last) and wrongly see every right row
        F.when(
            F.col("__ts").isNotNull(),
            F.last("__r", ignorenulls=True).over(w),
        ).alias("__r"),
    )
    out = merged.where(F.col("__side") == left_side)
    return out.select(
        *[F.col("__left")[c].alias(c) for c in left.columns],
        *[F.col("__r")[c].alias(f"{c}{suffix}") for c in right_cols],
    )
