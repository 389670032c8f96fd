"""Data-layout control: range-clustered writes.

At 100 TB the scan cost of every later query is set by how the writer
laid out files: parquet keeps min/max statistics per file and row
group, and readers skip chunks whose range cannot match a predicate —
but only if the writer actually clustered values. ``clustered_write``
range-partitions rows on the cluster key(s) and sorts within each
partition, so each output file covers a narrow, near-disjoint key
range (the poor man's Z-order for a single key prefix; with Iceberg on
the classpath the same intent is expressed as a sort order on the
table).

``file_key_ranges`` reads the per-file footer stats back (pyarrow) so
tests can assert the clustering actually happened rather than trusting
the writer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def clustered_write(
    df: DataFrame,
    path: str,
    *,
    cluster_cols: tuple[str, ...],
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write parquet range-clustered on ``cluster_cols``: global range
    partitioning (one sampling pass chooses the boundaries) + in-file
    sort, so file/row-group min-max stats are tight."""
    part = (
        df.repartitionByRange(n_files, *cluster_cols)
        if n_files is not None
        else df.repartitionByRange(*cluster_cols)
    )
    part.sortWithinPartitions(*cluster_cols).write.mode(mode).parquet(path)


def file_key_ranges(path: str, column: str) -> list[tuple]:
    """Per-file (min, max) of ``column`` from parquet footers — no data
    read. Sorted by min."""
    import glob
    import os

    import pyarrow.parquet as pq

    out = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(column)
        mn = mx = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                continue
            mn = st.min if mn is None else min(mn, st.min)
            mx = st.max if mx is None else max(mx, st.max)
        if mn is not None:
            out.append((mn, mx))
    return sorted(out)
