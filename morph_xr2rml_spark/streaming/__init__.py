from .incremental import (
    incremental_materialization,
    mention_rate_stream,
    stream_documents,
)

__all__ = [
    "incremental_materialization",
    "mention_rate_stream",
    "stream_documents",
]
