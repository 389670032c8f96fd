"""Production-shape e2e: spark-submit --py-files zip → checkpointed
validation job → resume run skips completed buckets.

Exercises the exact deployment path the README documents (package zip,
spark-submit entrypoint, TableFormat outputs) in a separate JVM — not
the test session."""

from __future__ import annotations

import glob
import json
import os
import subprocess
import zipfile

import pyspark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = os.path.join(
    os.path.dirname(pyspark.__file__), "bin", "spark-submit"
)

SPEC = {
    "type": "object",
    "fields": [
        ["text", {"type": "text", "constraints": [{"op": "TGe", "n": 1}]}],
        ["lang", {"type": "text", "constraints": [
            {"op": "TEnum", "values": ["en", "de", "fr", "es"]}]}],
        ["n_chars", {"type": "number", "constraints": [
            {"op": "NGe", "n": 0}, {"op": "NLe", "n": 500}]}],
    ],
}


def _submit(args, cwd):
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[2]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.driver.memory=2g",
            *args,
        ],
        cwd=cwd, capture_output=True, text=True, timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "run_id" in d:
                return d
    raise AssertionError(
        f"no JSON summary in stdout:\n{proc.stdout[-2000:]}"
    )


def test_spark_submit_checkpointed_job_and_resume(tmp_path):
    pkg_zip = str(tmp_path / "schematic_spark.zip")
    with zipfile.ZipFile(pkg_zip, "w") as z:
        for f in glob.glob(
            os.path.join(REPO, "schematic_spark", "**", "*.py"),
            recursive=True,
        ):
            z.write(f, os.path.relpath(f, REPO))

    spec_path = str(tmp_path / "spec.json")
    with open(spec_path, "w") as f:
        json.dump(SPEC, f)
    out_root = str(tmp_path / "out")

    common = [
        "--py-files", pkg_zip,
        os.path.join(REPO, "scripts", "run_validation_job.py"),
        "--input", "/root/testdata/sf0.001/documents.parquet",
        "--spec", spec_path,
        "--output-root", out_root,
        "--key-col", "doc_id",
        "--n-buckets", "4",
        "--run-id", "e2e-1",
        "--input-snapshot", "snap-e2e",
    ]
    first = _submit(common, cwd=str(tmp_path))
    assert sorted(first["processed_buckets"]) == [0, 1, 2, 3]
    assert first["skipped_buckets"] == []
    # violations landed, partitioned by bucket
    viol_files = glob.glob(
        os.path.join(out_root, "_schematic_violations", "**", "*.parquet"),
        recursive=True,
    )
    assert viol_files, os.listdir(out_root)
    # bucket-partitioned directory layout
    assert any("bucket=" in p for p in viol_files), viol_files[:5]

    # resume: same snapshot + spec → every bucket skipped, no new work
    second = _submit(common, cwd=str(tmp_path))
    assert second["processed_buckets"] == []
    assert sorted(second["skipped_buckets"]) == [0, 1, 2, 3]
