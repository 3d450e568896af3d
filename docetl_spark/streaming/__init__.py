from docetl_spark.streaming.feed_source import LakeFeedDataSource, feed_schema, register_lakefeed
from docetl_spark.streaming.stateful import stateful_fold
from docetl_spark.streaming.stream import (
    read_change_stream,
    stream_changes,
    stream_dedup_ingest,
    stream_ivf_ingest,
)

__all__ = [
    "LakeFeedDataSource",
    "feed_schema",
    "read_change_stream",
    "register_lakefeed",
    "stream_changes",
    "stream_dedup_ingest",
    "stream_ivf_ingest",
    "stateful_fold",
]
