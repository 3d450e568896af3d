"""Sample + topk operators (SURVEY.md §2.6).

Reference: docetl/operations/sample.py (uniform/first/custom/outliers/
top_embedding/top_fts, stratified variants) and topk.py (facade).
Deterministic by construction: "random" sampling orders by a seeded hash —
the same rows win at any parallelism (sklearn's train_test_split in the
reference is seeded too; a hash order is the distributed equivalent).
"""

from __future__ import annotations

import math
from typing import Sequence

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from docetl_spark.functions.vectors import cosine_sim_col


def _hash_order(df: DataFrame, seed: int) -> F.Column:
    return F.xxhash64(*[F.col(c) for c in df.columns], F.lit(seed))


def sample(
    df: DataFrame,
    method: str = "uniform",
    samples: int | float | Sequence[dict] | None = None,
    seed: int = 42,
    stratify_key: str | None = None,
    samples_per_group: int | None = None,
    # outliers / top_embedding kwargs
    embedding_col: str | None = None,
    query_vec: Sequence[float] | None = None,
    std: float | None = None,
    keep: str = "inside",
) -> DataFrame:
    """Down-sample rows (sample.py:12-682).

    Methods: ``uniform`` (int count or float fraction, seeded),
    ``first`` (head-n in hash order — deterministic), ``custom`` (keep rows
    matching a list of key dicts, via broadcast semi-join),
    ``outliers`` (distance from the embedding centroid, cutoff by ``std``
    stddevs; keep inside/outside), ``top_embedding`` handled by ``topk``.
    Stratification: ``stratify_key`` + int/fraction or ``samples_per_group``.
    """
    if samples is None and (
        method == "first" or (method == "uniform" and samples_per_group is None)
    ):
        # fail early with a config error — falling through would reach
        # int(None)/df.sample(fraction=None) and die with a bare TypeError
        raise ValueError(
            f"sample method={method!r} needs samples"
            + (" or samples_per_group" if method == "uniform" else "")
        )
    if samples_per_group is not None and not stratify_key:
        # samples_per_group is a per-stratum quota; without strata it
        # would silently fall through to the exact-count path and die on
        # int(None)
        raise ValueError("samples_per_group requires stratify_key")
    if isinstance(stratify_key, (list, tuple)) and not (method == "uniform" and samples_per_group):
        # composite strata (the doc-chunking macro's [split_id, extra])
        # are only defined for the per-group-quota path; the fraction and
        # proportional-count paths key joins on a single column
        raise ValueError("list stratify_key requires method='uniform' with samples_per_group")
    if method == "uniform":
        if stratify_key and samples_per_group:
            w = Window.partitionBy(stratify_key).orderBy(_hash_order(df, seed))
            return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= samples_per_group).drop("_rn")
        if isinstance(samples, float):
            if stratify_key:
                fracs = {r[0]: samples for r in df.select(stratify_key).distinct().collect()}
                return df.sampleBy(stratify_key, fractions=fracs, seed=seed)
            return df.sample(fraction=samples, seed=seed)
        if stratify_key:
            # int count + stratify_key: proportional per-stratum quota
            # ceil(samples * n_g / N) — the distributed analogue of the
            # reference's sklearn stratified train_test_split
            # (sample.py:via stratify=). Quota join is a broadcast of
            # |strata| rows; selection order is the seeded hash, so the
            # same rows win at any parallelism. Total may exceed `samples`
            # by < |strata| rows (ceiling), matching per-group fairness.
            counts = df.groupBy(stratify_key).agg(F.count(F.lit(1)).alias("_n"))
            total = counts.agg(F.sum("_n")).collect()[0][0]
            if not total:
                return df.limit(0)  # empty input: empty sample, same schema
            quota = F.ceil(F.lit(int(samples)) * F.col("_n") / F.lit(int(total)))
            w = Window.partitionBy(stratify_key).orderBy(_hash_order(df, seed))
            # null-safe quota join: NULL is a stratum too (it was counted in
            # `total`, so a plain equi-join would both drop its rows and
            # deflate every other stratum's share)
            quotas = counts.withColumn("_quota", quota).withColumnRenamed(stratify_key, "_sk").drop("_n")
            return (
                df.join(F.broadcast(quotas), on=F.col(stratify_key).eqNullSafe(F.col("_sk")))
                .withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") <= F.col("_quota"))
                .drop("_rn", "_quota", "_sk")
            )
        # exact-count deterministic sample: global sort by seeded hash, take n
        return df.orderBy(_hash_order(df, seed)).limit(int(samples))
    if method == "first":
        return df.limit(int(samples))
    if method == "custom":
        if not samples:
            raise ValueError("custom sampling needs a list of key dicts")
        keys = list(samples[0].keys())
        spark = df.sparkSession
        lookup = spark.createDataFrame([tuple(s[k] for k in keys) for s in samples], ", ".join(f"{k} {_ddl(df, k)}" for k in keys))
        return df.join(F.broadcast(lookup), on=keys, how="left_semi")
    if method == "outliers":
        if embedding_col is None:
            raise ValueError("outliers needs embedding_col")
        center = df.agg(
            *[F.avg(F.element_at(F.col(embedding_col), i + 1)).alias(f"c{i}") for i in range(_dim(df, embedding_col))]
        ).collect()[0]
        cvec = [float(x) for x in center]
        dist = _l2_dist_col(embedding_col, cvec)
        scored = df.withColumn("_dist", dist)
        if std is not None:
            stats = scored.agg(F.avg("_dist").alias("m"), F.stddev_pop("_dist").alias("s")).collect()[0]
            cutoff = float(stats["m"]) + float(std) * float(stats["s"] or 0.0)
        else:
            n = int(samples)
            cutoff_row = scored.orderBy("_dist").limit(n).agg(F.max("_dist")).collect()[0]
            cutoff = float(cutoff_row[0])
        cond = F.col("_dist") <= cutoff if keep == "inside" else F.col("_dist") > cutoff
        return scored.filter(cond).drop("_dist")
    raise ValueError(f"unknown sample method {method!r}")


def _ddl(df: DataFrame, col: str) -> str:
    return df.schema[col].dataType.simpleString()


def _dim(df: DataFrame, col: str) -> int:
    row = df.select(F.size(F.col(col)).alias("n")).first()
    return int(row["n"])


def _l2_dist_col(embedding_col: str, center: list[float]) -> F.Column:
    """L2 distance to a constant vector (Arrow kernel — the zip_with/
    aggregate fold it replaces is CodegenFallback, bit-identical values)."""
    from docetl_spark.functions.vectors import l2_dist_const

    return l2_dist_const(embedding_col, center)


def topk(
    df: DataFrame,
    k: int | float,
    method: str = "score",
    score_col: str | F.Column | None = None,
    direction: str = "desc",
    stratify_key: str | None = None,
    # embedding method
    embedding_col: str | None = None,
    query_vec: Sequence[float] | None = None,
    # fts method
    text_col: str | None = None,
    query: str | None = None,
    bm25_stats=None,  # pre-fit functions.text.Bm25Stats: fit once, score many
    name: str = "topk",
    tiebreak_cols: Sequence[str] | None = None,
    # llm_compare facade (topk.py:182-235): picker-refined rank head-k
    picker=None,
    rerank_call_budget: int = 100,
    num_top_items_per_window: int = 3,
    overlap_fraction: float = 0.5,
    initial_method: str | None = None,
) -> DataFrame:
    """Top-k rows by a score (topk.py:12-235 facade).

    Methods: ``score`` (existing column/expression), ``embedding``
    (cosine similarity to ``query_vec``), ``fts`` (Okapi BM25 with corpus
    IDF — reference parity, see functions.text.bm25_score; two eager
    stats jobs), ``fts_simple`` (corpus-independent tf proxy, no stats
    jobs), ``llm_compare``
    (delegates to the rank operator exactly like the reference facade
    topk.py:182-235: initial ordering from ``initial_method`` — one of
    score/embedding/fts, the reference hardwires embedding — refined by
    the picky-window ``picker`` under ``rerank_call_budget`` calls
    [default 100, topk.py:214], head-k returned; fractional k =
    ``int(k * count)``, topk.py:206-210,:232-234). Adds ``_{name}_rank``
    and ``_{name}_score``; fractional k = ceil(fraction * rows per
    stratum) for the sampling methods. Implemented as rank-over-window
    ≤ k: one shuffle, no global sort when stratified.
    """
    if method == "llm_compare":
        from docetl_spark.operators.rank_ops import rank

        if stratify_key:
            # RankOperation has no stratified mode; the reference facade
            # would silently drop the key — fail loudly instead
            raise ValueError("llm_compare does not support stratify_key")
        base = initial_method or ("embedding" if embedding_col else "fts" if text_col else "score")
        if base == "embedding":
            initial = cosine_sim_col(embedding_col, list(query_vec))
        elif base == "fts":
            from docetl_spark.functions.text import bm25_score

            initial = bm25_score(df, text_col, query, stats=bm25_stats)
        elif base == "fts_simple":
            from docetl_spark.functions.text import fts_score

            initial = fts_score(F.col(text_col), query)
        else:
            initial = F.col(score_col) if isinstance(score_col, str) else score_col
        kk = int(k) if not (isinstance(k, float) and 0 < k < 1) else max(1, int(k * df.count()))
        return rank(
            df, score=initial, direction="desc", name=name, k=kk,
            picker=picker, rerank_call_budget=rerank_call_budget,
            num_top_items_per_window=num_top_items_per_window,
            overlap_fraction=overlap_fraction,
            tiebreak_cols=list(tiebreak_cols) if tiebreak_cols else None,
        )
    if method == "score":
        score = F.col(score_col) if isinstance(score_col, str) else score_col
    elif method == "embedding":
        score = cosine_sim_col(embedding_col, list(query_vec))
    elif method == "fts":
        # Real BM25 with corpus IDF, exactly the reference's BM25Okapi
        # scorer (sample.py:516-640) — eager stats jobs at call time
        # unless a pre-fit ``bm25_stats`` is passed (fit once, score many;
        # see functions.text.Bm25Stats)
        from docetl_spark.functions.text import bm25_score

        score = bm25_score(df, text_col, query, stats=bm25_stats)
    elif method == "fts_simple":
        # corpus-independent tf/log-length proxy (no stats jobs): for
        # per-group or streaming contexts where a corpus scan per call is
        # unaffordable
        from docetl_spark.functions.text import fts_score

        score = fts_score(F.col(text_col), query)
    else:
        raise ValueError(f"unknown topk method {method!r}")

    scored = df.withColumn(f"_{name}_score", score.cast("double"))
    order = F.col(f"_{name}_score").desc() if direction == "desc" else F.col(f"_{name}_score").asc()
    # default tiebreak: content hash (deterministic); pass tiebreak_cols for
    # an ordering reproducible in external SQL oracles
    if tiebreak_cols:
        tiebreak = F.struct(*[F.col(c) for c in tiebreak_cols])
    else:
        tiebreak = F.xxhash64(*[F.col(c) for c in df.columns])

    if stratify_key:
        w = Window.partitionBy(stratify_key).orderBy(order, tiebreak)
        ranked = scored.withColumn(f"_{name}_rank", F.row_number().over(w))
        if isinstance(k, float) and 0 < k < 1:
            counts = df.groupBy(stratify_key).agg(F.count(F.lit(1)).alias("_n"))
            ranked = ranked.join(F.broadcast(counts), on=stratify_key)
            return ranked.filter(F.col(f"_{name}_rank") <= F.ceil(F.lit(k) * F.col("_n"))).drop("_n")
        return ranked.filter(F.col(f"_{name}_rank") <= int(k))

    # Global top-k: orderBy().limit() compiles to TakeOrderedAndProject —
    # per-partition heaps + a k-row merge, never a single-task global sort.
    if isinstance(k, float) and 0 < k < 1:
        k = max(1, math.ceil(k * df.count()))
    top = scored.orderBy(order, tiebreak).limit(int(k))
    # rank window runs over ≤ k rows (post-limit), so the unpartitioned
    # WindowExec warning it triggers is moot — the "single partition" holds
    # at most k rows by construction. (A constant partition key does NOT
    # suppress it: Catalyst constant-folds the literal out of the spec.)
    return top.withColumn(
        f"_{name}_rank", F.row_number().over(Window.orderBy(order, tiebreak))
    )
