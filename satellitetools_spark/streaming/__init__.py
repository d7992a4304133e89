from .ingest import (
    stream_documents,
    streaming_first_seen,
    streaming_kmv,
    streaming_qi,
    streaming_scene_counts,
    streaming_sessions,
    streaming_zscore,
)

__all__ = ["stream_documents", "streaming_first_seen", "streaming_kmv",
           "streaming_qi", "streaming_scene_counts", "streaming_sessions",
           "streaming_zscore"]
