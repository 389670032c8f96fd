from .validate_stream import (  # noqa: F401
    streaming_violations,
    validate_stream,
    windowed_verdict_counts,
)
