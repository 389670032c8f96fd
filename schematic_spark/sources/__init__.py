from .bucketed import (  # noqa: F401
    bucketed_join,
    read_bucketed,
    write_bucketed,
)
from .json_ingest import MALFORMED, validate_json_strings  # noqa: F401
from .layout import (  # noqa: F401
    clustered_write,
    file_key_ranges,
    spread_for_compute,
)
from .checkpoint import (  # noqa: F401
    LINEAGE_TABLE,
    METRICS_TABLE,
    VIOLATIONS_TABLE,
    CheckpointedRun,
    partition_passfail,
    read_violations,
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
