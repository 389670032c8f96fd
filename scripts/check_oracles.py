"""Local mirror of the driver's correctness gate: run every
``queries()[k]`` on Spark at sf0.01 and compare against
``oracle_sql()[k]`` via DuckDB — row count, column names, and
order-insensitive values (columns sorted by name, rows sorted).

Usage: python scripts/check_oracles.py [sf_dir] [only_query_substr]
       python scripts/check_oracles.py --strict [sf_dir] [substr]
       ... --skip=name1,name2   (exact names; for oracles whose DuckDB
                                 side is deliberately quadratic — run
                                 those at sf0.01 instead)

``--strict`` is driver-strength: no float rounding (bit-exact repr),
ints stay ints (the default mode's int→float widening masked the
HUGEINT hash failures of rounds 3/4), rows compared IN ORDER when the
Spark plan's result is globally sorted, and a per-column dtype echo
for every query so type drift is visible even on green rows.
"""

from __future__ import annotations

import math
import sys


def _is_globally_sorted(sdf) -> bool:
    """True when the query's OUTPUT order is deterministic — a global
    Sort at (or directly under projections at) the top of the
    optimized plan."""
    plan = sdf._jdf.queryExecution().optimizedPlan().toString()
    for line in plan.splitlines():
        s = line.lstrip("+-: ")
        if s.startswith("Sort "):
            # decide at the FIRST Sort: a partition-local sort here
            # (sortWithinPartitions, ", false") means the output order
            # is NOT deterministic even if a global Sort sits deeper —
            # walking past it would misread the shape as ordered
            return ", true" in s.split("]")[-1]
        # projections preserve child order; anything else may not
        if not s.startswith("Project "):
            return False
    return False


def strict_cell(v):
    """Driver-strength normalization: identity, except bit-exact float
    repr (NaN sentinel) so 1-ulp cross-engine drift is VISIBLE."""
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else v.hex()
    from decimal import Decimal

    if isinstance(v, Decimal):
        return ("DECIMAL", str(v))  # lint forbids these; make loud
    return v


def strict_rows(cols, rows, ordered):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(strict_cell(r[i]) for i in order) for r in rows]
    if not ordered:
        out = sorted(out, key=lambda t: tuple(str(x) for x in t))
    return sorted(cols), out

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, int):
        return float(v) if abs(v) < 2**52 else v
    try:
        from decimal import Decimal

        if isinstance(v, Decimal):
            return round(float(v), 9)
    except ImportError:
        pass
    return v


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=lambda t: tuple(str(x) for x in t))


def main():
    skip: set[str] = set()
    argv = []
    strict = False
    for a in sys.argv[1:]:
        if a == "--strict":
            strict = True
        elif a.startswith("--skip="):
            # exact query names, comma-separated.  Exists for the few
            # oracles whose DuckDB side is a *deliberately* quadratic
            # certification (minhash_near_dups_documents all-pairs
            # Jaccard: 5k docs -> 12.5M shingle-set intersections,
            # single-threaded hours at sf0.1) — those run at sf0.01,
            # the driver gate's scale, where they finish in seconds.
            skip.update(x for x in a[7:].split(",") if x)
        else:
            argv.append(a)
    sf_dir = argv[0] if len(argv) > 0 else "/root/testdata/sf0.01"
    only = argv[1] if len(argv) > 1 else ""

    import duckdb
    from pyspark.sql import SparkSession

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("oracle-check")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "6g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and only not in name:
            continue
        if name in skip:
            print(f"SKIP  {name} (--skip)")
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle)")
            n_rows_only += 1
            continue
        try:
            res = con.execute(sql)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        if strict:
            ordered = _is_globally_sorted(sdf)
            print(
                f"TYPES {name}: ordered={ordered} "
                f"spark={sdf.dtypes} duckdb="
                f"{[(d[0], str(d[1])) for d in res.description]}"
            )
            sc, sr = strict_rows(
                scols, [tuple(r) for r in srows], ordered
            )
            oc, orw = strict_rows(ocols, orows, ordered)
        else:
            sc, sr = norm_rows(scols, [tuple(r) for r in srows])
            oc, orw = norm_rows(ocols, orows)
        if sc != oc:
            print(f"FAIL  {name}: columns {sc} != {oc}")
            n_fail += 1
            continue
        if len(sr) != len(orw):
            print(f"FAIL  {name}: rows {len(sr)} != {len(orw)}")
            n_fail += 1
            continue
        bad = [i for i, (a, b) in enumerate(zip(sr, orw)) if a != b]
        if bad:
            i = bad[0]
            print(f"FAIL  {name}: {len(bad)} mismatched rows; first:")
            print(f"      spark : {sr[i]}")
            print(f"      duckdb: {orw[i]}")
            n_fail += 1
            continue
        print(f"PASS  {name}: {len(sr)} rows")
        n_pass += 1
    print(
        f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only"
    )
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
