from docetl_spark.cdc.merge import MergeMetrics, dedup_last_writer, merge_apply
from docetl_spark.cdc.replay import create_cdc_table, read_state, replay_events

__all__ = [
    "MergeMetrics",
    "dedup_last_writer",
    "merge_apply",
    "create_cdc_table",
    "read_state",
    "replay_events",
]
