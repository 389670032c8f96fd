"""Oracle output-type lint — DuckDB-only, no Spark session.

The driver's correctness gate hashes oracle result cells, and its
serialization distinguishes DuckDB's exotic numeric types from the
plain ones Spark emits: an un-cast windowed ``sum()`` or ``list_sum``
returns HUGEINT (int128) and hash-mismatches a byte-identical BIGINT
(burned rounds 3 AND 4 — winnow_fingerprints then sessionized_events,
see VERDICT round 4).  This lint DESCRIBEs every ``oracle_sql()``
entry and asserts every output column type is in the driver-hashable
set, making that failure class unrecurrable.

DESCRIBE only *binds* the query in DuckDB (no execution), so the full
68-oracle sweep runs in ~1 s.  Oracles that read the runtime
interleaved parquet (written by the Spark side in a real harness run)
are bound against a tiny pyarrow twin with the identical schema,
generated from ``generator.expected_doc`` — the Python replica of the
Spark generator.
"""

from __future__ import annotations

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entry
from schematic_spark.generator import GeneratorConfig, expected_doc

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

#: Types the driver's hash treats identically to the matching Spark
#: output types.  HUGEINT / DECIMAL / unsigned types are NOT here on
#: purpose — they serialize differently and produce false-negative
#: hash rows even when every cell is byte-identical.
HASHABLE_TYPES = {
    "BIGINT",
    "INTEGER",
    "SMALLINT",
    "TINYINT",
    "DOUBLE",
    "FLOAT",
    "VARCHAR",
    "BOOLEAN",
    "DATE",
    "TIMESTAMP",
}

SF_DIR = os.environ.get("SPARK_GRAFT_LINT_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def lint_con(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("oracle_lint")
    # pyarrow twin of the Spark-written interleaved table: same column
    # names, same logical types (offset is int32 — generator.py casts
    # the span offset to "int").
    span_t = pa.struct(
        [
            ("kind", pa.string()),
            ("text", pa.string()),
            ("media_ref", pa.string()),
            ("offset", pa.int32()),
        ]
    )
    schema = pa.schema(
        [("doc_id", pa.string()), ("spans", pa.list_(span_t))]
    )
    cfg = GeneratorConfig(n_docs=30, seed=42, n_media=500)
    rows = [expected_doc(i, cfg) for i in range(30)]
    fake = tmp / f"interleaved_{entry._INTERLEAVED_N}"
    fake.mkdir()
    pq.write_table(
        pa.Table.from_pylist(rows, schema=schema),
        str(fake / "part0.parquet"),
    )

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con, str(tmp)


@pytest.mark.parametrize("name", sorted(entry.oracle_sql().keys()))
def test_oracle_output_types_are_driver_hashable(name, lint_con):
    con, tmp = lint_con
    sql = entry.oracle_sql()[name].replace(entry._ORACLE_TMP, tmp)
    desc = con.execute("DESCRIBE " + sql).fetchall()
    offenders = [
        (col, typ)
        for col, typ, *_ in desc
        if typ not in HASHABLE_TYPES
    ]
    assert not offenders, (
        f"oracle {name!r} emits non-driver-hashable column types "
        f"{offenders}; CAST them (HUGEINT from windowed sum/list_sum "
        f"burned rounds 3 and 4)"
    )


def test_queries_and_oracles_in_sync():
    q = list(entry.queries().keys())
    o = set(entry.oracle_sql().keys())
    assert len(q) == len(set(q))
    assert set(q) == o
