from docetl_spark.sources.testgen import gen_change_events, final_state_oracle

__all__ = ["gen_change_events", "final_state_oracle"]
