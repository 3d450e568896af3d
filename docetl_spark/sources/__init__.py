from docetl_spark.sources.parsing import PARSERS, apply_parsing, get_parser
from docetl_spark.sources.testgen import final_state_oracle, gen_change_events

__all__ = ["gen_change_events", "final_state_oracle", "apply_parsing", "get_parser", "PARSERS"]
