from .incremental import (
    dedup_stream,
    incremental_materialization,
    mention_rate_stream,
    stream_documents,
)

__all__ = [
    "dedup_stream",
    "incremental_materialization",
    "mention_rate_stream",
    "stream_documents",
]
