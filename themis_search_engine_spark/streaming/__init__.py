"""Structured Streaming surface: incremental index ingestion."""

from .ingest import (  # noqa: F401
    finalize_stream,
    ingest_pages_stream,
    serve_pages_stream,
    windowed_ingest_rate,
)
from .stateful import streaming_exact_dedup  # noqa: F401
