"""Migrations + versioned dispatch (F5) and checkpoint/resume tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from schematic_spark.migrations import (
    AddKey,
    DeleteKey,
    Diff,
    Migration,
    TRAVERSE,
    Update,
    VersionedSpec,
    add_column_upgrade,
    all_versions,
    apply_action_at,
    drop_column_upgrade,
    validate_versioned,
)
from schematic_spark.schema import (
    AEq,
    NGt,
    SArray,
    SNumber,
    SObject,
    SOptional,
    SText,
    TEnum,
)
from schematic_spark.sources import (
    ParquetDirFormat,
    partition_passfail,
    run_validation_checkpointed,
)

# F1 base schema (test/SchemaSpec.hs:32-34)
BASE = SObject((
    ("foo", SArray(SNumber((NGt(10),)), (AEq(1),))),
    ("bar", SOptional(SText((TEnum(("foo", "bar")),)))),
))

# F5: add quuz then delete it — net top == BASE (SchemaSpec.hs:46-75)
MIGS = [
    Migration("add_field_quuz", (Diff((), AddKey("quuz", SNumber())),)),
    Migration("remove_field_quuz", (Diff((), DeleteKey("quuz")),)),
]


class TestSchemaDiffs:
    def test_add_delete_roundtrip(self):
        versions = all_versions(BASE, MIGS)
        assert [rev for rev, _ in versions] == [
            "remove_field_quuz", "add_field_quuz", "initial",
        ]
        assert versions[0][1] == BASE            # net effect: none
        assert versions[1][1].field_names() == ["quuz", "foo", "bar"]

    def test_addkey_prepends(self):
        s = apply_action_at(BASE, (), AddKey("z", SText()))
        assert s.field_names()[0] == "z"

    def test_nested_path_update(self):
        s = apply_action_at(
            BASE, ("foo", TRAVERSE), Update(SNumber((NGt(99),)))
        )
        assert s.field_schema("foo").item == SNumber((NGt(99),))

    def test_missing_path_key_raises(self):
        with pytest.raises(KeyError):
            apply_action_at(BASE, ("nope",), DeleteKey("x"))


class TestVersionedDispatch:
    """parseAndValidateWithMList semantics (Data/Schematic.hs:60-76):
    try newest; on failure fall back older and migrate up."""

    def test_fallback_and_upgrade(self, spark):
        # v1 = base(foo,bar); v2 adds required quux number > 10
        migs = [Migration(
            "add_quux", (Diff((), AddKey("quux", SNumber((NGt(10),))),),)
        )]
        spec = VersionedSpec(
            base=BASE,
            migrations=migs,
            upgrades={"add_quux": add_column_upgrade("quux", 42.0)},
        )
        df = spark.createDataFrame(
            [
                ([13.0], "foo", 20.0),   # valid at top
                ([13.0], "bar", None),   # quux null → DecodingError at top,
                                         # valid at initial → upgraded
                ([3.0], "foo", 20.0),    # invalid everywhere (foo[0] <= 10)
            ],
            "foo array<double>, bar string, quux double",
        )
        upgraded, rejected = validate_versioned(df, spec)
        up = upgraded.orderBy("bar").collect()
        assert len(up) == 2
        by_bar = {r["bar"]: r for r in up}
        assert by_bar["foo"]["quux"] == 20.0       # untouched
        assert by_bar["bar"]["quux"] == 42.0       # migrated default
        rej = rejected.collect()
        assert len(rej) == 1 and rej[0]["foo"] == [3.0]

    def test_f5_net_noop_chain(self, spark):
        spec = VersionedSpec(
            base=BASE,
            migrations=MIGS,
            upgrades={
                "add_field_quuz": add_column_upgrade("quuz", 42.0),
                "remove_field_quuz": drop_column_upgrade("quuz"),
            },
        )
        df = spark.createDataFrame(
            [([13.0], None)], "foo array<double>, bar string"
        )
        upgraded, rejected = validate_versioned(df, spec)
        assert upgraded.count() == 1 and rejected.count() == 0
        # top version == F1 → columns unchanged
        assert set(upgraded.columns) >= {"foo", "bar"}


class TestCheckpointResume:
    def test_resume_skips_completed(self, spark, tmp_path):
        fmt = ParquetDirFormat(root=str(tmp_path))
        df = spark.createDataFrame(
            [(f"d{i}", [13.0] if i % 10 else [3.0]) for i in range(100)],
            "doc_id string, foo array<double>",
        )
        schema = SObject((
            ("doc_id", SText()),
            ("foo", SArray(SNumber((NGt(10),)), (AEq(1),))),
        ))
        r1 = run_validation_checkpointed(
            spark, df, schema, fmt, n_buckets=4, run_id="r1",
            input_snapshot="snapA",
        )
        assert sorted(r1["processed_buckets"]) == [0, 1, 2, 3]
        assert r1["totals"]["ValidationError"] == 10
        assert r1["totals"]["Valid"] == 90

        # resume: same snapshot+spec → everything skipped
        r2 = run_validation_checkpointed(
            spark, df, schema, fmt, n_buckets=4, run_id="r2",
            input_snapshot="snapA",
        )
        assert r2["processed_buckets"] == []
        assert sorted(r2["skipped_buckets"]) == [0, 1, 2, 3]

        # new snapshot → reprocessed
        r3 = run_validation_checkpointed(
            spark, df, schema, fmt, n_buckets=4, run_id="r3",
            input_snapshot="snapB",
        )
        assert sorted(r3["processed_buckets"]) == [0, 1, 2, 3]

        # per-partition pass/fail from metrics only
        pf = partition_passfail(spark, fmt)
        rows = pf.where(F.col("input_snapshot") == "snapA").collect()
        assert len(rows) == 4
        assert sum(r["n_rows"] for r in rows) == 100
        assert all(not r["passed"] for r in rows)  # every bucket has bad rows

    def test_snapshot_manifest(self, spark, tmp_path):
        fmt = ParquetDirFormat(root=str(tmp_path))
        df1 = spark.range(5).select(F.col("id"))
        df2 = spark.range(5, 8).select(F.col("id"))
        s1 = fmt.write(df1, "t", mode="overwrite")
        s2 = fmt.write(df2, "t", mode="append")
        assert fmt.read(spark, "t").count() == 8
        assert fmt.read(spark, "t", snapshot_id=s1).count() == 5
        snaps = fmt.snapshots(spark, "t")
        assert [s["snapshot_id"] for s in snaps] == [s1, s2]
        assert snaps[1]["parent_id"] == s1
