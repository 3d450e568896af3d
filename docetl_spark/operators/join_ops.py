"""Equijoin operator (SURVEY.md §2.4; reference docetl/operations/equijoin.py).

The reference's fuzzy join = blocking phase (candidate pairs) + verify
phase (LLM pairwise check) + per-side match limits + collision suffixing.
Spark-first decomposition:

* equality blocking conditions -> a plain hash/broadcast equi-join
  (Catalyst picks broadcast for a small side; AQE splits skewed
  partitions) — what the reference approximates with a multiprocessing
  cross-product (equijoin.py:253-268);
* non-equi blocking -> join on the extracted equality conjuncts if any,
  else an explicit cross join with the predicate as a filter;
* embedding blocking -> cosine-threshold similarity join
  (functions.dedup.embedding_similarity_join);
* verify phase -> a pluggable expression or pandas predicate over the
  joined pairs (deterministic in tests; LLM-backed in production);
* per-side ``limits`` -> row_number over a per-key window
  (equijoin.py:474-478);
* colliding column names suffixed ``_left`` / ``_right``
  (equijoin.py:480-483).
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def _suffix_collisions(left: DataFrame, right: DataFrame) -> tuple[DataFrame, DataFrame, list[str]]:
    common = [c for c in left.columns if c in set(right.columns)]
    for c in common:
        left = left.withColumnRenamed(c, f"{c}_left")
        right = right.withColumnRenamed(c, f"{c}_right")
    return left, right, common


def equijoin(
    left: DataFrame,
    right: DataFrame,
    condition: Column | str | None = None,
    verify: Column | Callable[[pd.DataFrame], pd.Series] | None = None,
    limit_left: int | None = None,
    limit_right: int | None = None,
    broadcast_right: bool | None = None,
) -> DataFrame:
    """Inner fuzzy join. ``condition`` references suffixed columns for
    collisions (e.g. ``F.col("id_left") == F.col("user_id")``) or any
    column unique to one side. ``limit_left`` caps matches per left row
    (and vice versa). ``verify`` filters candidate pairs post-join.
    """
    lkey, rkey = "_ljid", "_rjid"
    left2, right2, _ = _suffix_collisions(left, right)
    # stable per-row ids for the limit windows (content-derived, not
    # monotonically_increasing_id — deterministic across retries)
    left2 = left2.withColumn(lkey, F.xxhash64(*[F.col(c) for c in left2.columns]))
    right2 = right2.withColumn(rkey, F.xxhash64(*[F.col(c) for c in right2.columns]))
    if broadcast_right:
        right2 = F.broadcast(right2)

    if condition is None:
        joined = left2.crossJoin(right2)
    else:
        cond = F.expr(condition) if isinstance(condition, str) else condition
        joined = left2.join(right2, cond, "inner")

    if verify is not None:
        if isinstance(verify, Column):
            joined = joined.filter(verify)
        else:
            fn = verify

            def run(batches):
                for pdf in batches:
                    yield pdf[fn(pdf).astype(bool)]

            joined = joined.mapInPandas(run, schema=joined.schema)

    order = F.xxhash64(F.col(lkey), F.col(rkey))
    if limit_left:
        w = Window.partitionBy(lkey).orderBy(order)
        joined = joined.withColumn("_rnl", F.row_number().over(w)).filter(F.col("_rnl") <= limit_left).drop("_rnl")
    if limit_right:
        w = Window.partitionBy(rkey).orderBy(order)
        joined = joined.withColumn("_rnr", F.row_number().over(w)).filter(F.col("_rnr") <= limit_right).drop("_rnr")
    return joined.drop(lkey, rkey)
