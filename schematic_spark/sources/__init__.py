from .json_ingest import MALFORMED, validate_json_strings  # noqa: F401
from .checkpoint import (  # noqa: F401
    LINEAGE_TABLE,
    METRICS_TABLE,
    CheckpointedRun,
    partition_passfail,
    run_validation_checkpointed,
    spec_fingerprint,
)
from .table_format import (  # noqa: F401
    IcebergFormat,
    ParquetDirFormat,
    TableFormat,
    iceberg_available,
    resolve_format,
)
