"""DocETL operator inventory (SURVEY.md §2) as pure DataFrame -> DataFrame
functions. Every operator is declarative-first: built-in pyspark.sql
functions where semantics allow, Arrow-batched pandas UDFs where they
don't, never row-at-a-time Python."""

from docetl_spark.operators.map_ops import add_uuid, code_filter, code_map, drop_keys, parallel_map
from docetl_spark.operators.reduce_ops import code_reduce, reduce_fold, reduce_merge, value_sample
from docetl_spark.operators.skew import salted_agg
from docetl_spark.operators.unnest import unnest
from docetl_spark.operators.split_gather import gather, split
from docetl_spark.operators.sample_ops import sample, topk
from docetl_spark.operators.join_ops import equijoin
from docetl_spark.operators.resolve_ops import resolve
from docetl_spark.operators.rank_ops import rank
from docetl_spark.operators.extract_ops import extract_lines, extract_regex
from docetl_spark.operators.cluster_ops import cluster, cluster_blocked, link_resolve

__all__ = [
    "cluster",
    "cluster_blocked",
    "link_resolve",
    "add_uuid",
    "code_filter",
    "code_map",
    "drop_keys",
    "parallel_map",
    "code_reduce",
    "reduce_fold",
    "reduce_merge",
    "value_sample",
    "salted_agg",
    "unnest",
    "split",
    "gather",
    "sample",
    "topk",
    "equijoin",
    "resolve",
    "rank",
    "extract_regex",
    "extract_lines",
]
