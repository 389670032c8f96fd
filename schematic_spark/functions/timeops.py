"""Timezone-robust timestamp arithmetic.

Spark 4 reads parquet ``timestamp[us]`` columns without timezone
metadata as ``TIMESTAMP_NTZ``; ``unix_micros`` only accepts the
session-zoned ``TIMESTAMP`` type, and casting NTZ→LTZ silently bakes the
session timezone into every value (a correctness bug the moment the
driver runs outside UTC). ``epoch_micros`` dispatches on the column's
actual type: NTZ values are measured against the naive epoch with
``timestamp_diff`` (timezone never enters), zoned values keep
``unix_micros``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DataType, TimestampNTZType

_NTZ_EPOCH = "1970-01-01 00:00:00"


def epoch_micros(c: Column, dtype: DataType) -> Column:
    """Microseconds since epoch, exact (bigint), for either timestamp
    flavor; the caller passes the column's resolved ``DataType``."""
    if isinstance(dtype, TimestampNTZType):
        return F.timestamp_diff(
            "MICROSECOND", F.lit(_NTZ_EPOCH).cast("timestamp_ntz"), c
        )
    return F.unix_micros(c)
