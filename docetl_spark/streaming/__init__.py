from docetl_spark.streaming.stateful import stateful_fold
from docetl_spark.streaming.stream import (
    read_change_stream,
    stream_changes,
    stream_dedup_ingest,
    stream_ivf_ingest,
)

__all__ = [
    "read_change_stream",
    "stream_changes",
    "stream_dedup_ingest",
    "stream_ivf_ingest",
    "stateful_fold",
]
