from docetl_spark.cdc.changes import changes_as_batch, read_changes, replicate
from docetl_spark.cdc.merge import MergeMetrics, dedup_last_writer, merge_apply
from docetl_spark.cdc.replay import compact_state, create_cdc_table, read_keys, read_metrics, read_state, replay_events

__all__ = [
    "MergeMetrics",
    "changes_as_batch",
    "dedup_last_writer",
    "merge_apply",
    "compact_state",
    "read_changes",
    "read_keys",
    "read_metrics",
    "create_cdc_table",
    "read_state",
    "replay_events",
    "replicate",
]
