from .ingest import (
    TRANSCRIPT_SCHEMA,
    StreamIngestor,
    file_stream_source,
    start_stream_build,
)

__all__ = [
    "TRANSCRIPT_SCHEMA",
    "StreamIngestor",
    "file_stream_source",
    "start_stream_build",
]
