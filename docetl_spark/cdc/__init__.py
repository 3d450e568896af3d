from docetl_spark.cdc.merge import MergeMetrics, dedup_last_writer, merge_apply
from docetl_spark.cdc.replay import compact_state, create_cdc_table, read_keys, read_metrics, read_state, replay_events

__all__ = [
    "MergeMetrics",
    "dedup_last_writer",
    "merge_apply",
    "compact_state",
    "read_keys",
    "read_metrics",
    "create_cdc_table",
    "read_state",
    "replay_events",
]
