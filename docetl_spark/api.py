"""Fluent DataFrame-native API — the analogue of the reference's pandas
``df.semantic.*`` accessor (docetl/apis/pd_accessors.py:62-905): each call
runs one operator and returns a new wrapper carrying the operation history
(the `_semantic_history` analogue, pd_accessors.py:102-124).

    from docetl_spark.api import ops

    out = (
        ops(df)
        .filter("n_chars > 64")
        .map(fp="md5(lower(text))")
        .split(split_key="text", method="token_count", num_tokens=128)
        .df
    )

Everything stays a lazy Spark plan; ``.df`` unwraps. Column-expression
strings are Spark SQL (the deterministic stand-in for prompt-driven
semantic ops — bind a vectorized TransformFn via ``.map_batches`` for the
pluggable-LLM path).
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class OpsFrame:
    def __init__(self, df: DataFrame, history: tuple = ()):
        self.df = df
        self.history = history

    def _next(self, df: DataFrame, op: str, **conf) -> "OpsFrame":
        return OpsFrame(df, self.history + ({"op": op, **conf},))

    # -- map family ---------------------------------------------------------
    def map(self, **exprs: str | Column) -> "OpsFrame":
        out = self.df
        for name, e in exprs.items():
            out = out.withColumn(name, F.expr(e) if isinstance(e, str) else e)
        return self._next(out, "map", cols=list(exprs))

    def map_batches(self, fn: Callable[[pd.DataFrame], pd.DataFrame], schema) -> "OpsFrame":
        """Arrow-vectorized whole-row transform (the LLM-map plug point)."""

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                yield fn(pdf)

        return self._next(self.df.mapInPandas(run, schema=schema), "map_batches")

    def filter(self, predicate: str | Column) -> "OpsFrame":
        p = F.expr(predicate) if isinstance(predicate, str) else predicate
        return self._next(self.df.filter(p), "filter")

    def drop_keys(self, *keys: str) -> "OpsFrame":
        return self._next(self.df.drop(*keys), "drop_keys", keys=list(keys))

    def add_uuid(self, id_key: str = "doc_id") -> "OpsFrame":
        from docetl_spark.operators import add_uuid
        return self._next(add_uuid(self.df, id_key=id_key), "add_uuid")

    def extract(self, document_keys, pattern: str, name: str = "extract") -> "OpsFrame":
        from docetl_spark.operators import extract_regex
        return self._next(extract_regex(self.df, document_keys, pattern, name=name), "extract")

    # -- restructuring -------------------------------------------------------
    def split(self, **kw) -> "OpsFrame":
        from docetl_spark.operators import split
        return self._next(split(self.df, **kw), "split")

    def gather(self, **kw) -> "OpsFrame":
        from docetl_spark.operators import gather
        return self._next(gather(self.df, **kw), "gather")

    def unnest(self, unnest_key: str, **kw) -> "OpsFrame":
        from docetl_spark.operators import unnest
        return self._next(unnest(self.df, unnest_key, **kw), "unnest")

    # -- aggregation / resolution (pd_accessors.py agg ≈ resolve+reduce) ----
    def agg(self, reduce_key, **sql_aggs: str) -> "OpsFrame":
        keys = [reduce_key] if isinstance(reduce_key, str) else list(reduce_key)
        aggs = [F.expr(e).alias(n) for n, e in sql_aggs.items()]
        out = self.df.agg(*aggs) if keys == ["_all"] else self.df.groupBy(*keys).agg(*aggs)
        return self._next(out, "agg", reduce_key=keys)

    def reduce(self, reduce_key, fn, output_schema, **kw) -> "OpsFrame":
        from docetl_spark.operators import code_reduce
        return self._next(code_reduce(self.df, reduce_key, fn, output_schema, **kw), "reduce")

    def resolve(self, **kw) -> "OpsFrame":
        from docetl_spark.operators import resolve
        return self._next(resolve(self.df, **kw), "resolve")

    def link_resolve(self, **kw) -> "OpsFrame":
        from docetl_spark.operators import link_resolve
        return self._next(link_resolve(self.df, **kw), "link_resolve")

    def cluster(self, embedding_col: str, **kw) -> "OpsFrame":
        from docetl_spark.operators import cluster
        return self._next(cluster(self.df, embedding_col, **kw), "cluster")

    # -- joins (pd_accessors.py merge ≈ equijoin) ----------------------------
    def merge(self, right: "OpsFrame | DataFrame", **kw) -> "OpsFrame":
        from docetl_spark.operators import equijoin
        rdf = right.df if isinstance(right, OpsFrame) else right
        return self._next(equijoin(self.df, rdf, **kw), "merge")

    # -- sorts / limits ------------------------------------------------------
    def sample(self, **kw) -> "OpsFrame":
        from docetl_spark.operators import sample
        return self._next(sample(self.df, **kw), "sample")

    def topk(self, k, **kw) -> "OpsFrame":
        from docetl_spark.operators import topk
        return self._next(topk(self.df, k, **kw), "topk")

    def rank(self, score=None, **kw) -> "OpsFrame":
        from docetl_spark.operators import rank
        return self._next(rank(self.df, score, **kw), "rank")

    def rank_likert(self, rater, **kw) -> "OpsFrame":
        from docetl_spark.operators.rank_ops import rank_likert
        return self._next(rank_likert(self.df, rater, **kw), "rank_likert")

    def rank_calibrated(self, embedding_col: str, anchors, **kw) -> "OpsFrame":
        from docetl_spark.operators.rank_ops import rank_calibrated
        return self._next(rank_calibrated(self.df, embedding_col, anchors, **kw), "rank_calibrated")

    def extract_pointer(self, document_keys, pointer_pattern: str, **kw) -> "OpsFrame":
        from docetl_spark.operators.extract_ops import extract_pointer
        return self._next(extract_pointer(self.df, document_keys, pointer_pattern, **kw), "extract_pointer")

    # -- ingestion fan-out (dataset.py parsing analogue) -----------------------
    def parse(self, tools, user_tools=None) -> "OpsFrame":
        from docetl_spark.sources.parsing import apply_parsing
        return self._next(apply_parsing(self.df, tools, user_tools), "parse")


def ops(df: DataFrame) -> OpsFrame:
    return OpsFrame(df)
