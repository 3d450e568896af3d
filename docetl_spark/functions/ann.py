"""Approximate-nearest-neighbor search over an embedding column.

* ``knn_brute`` — exact cosine top-k: query-set broadcast cross join +
  per-query TakeOrdered window. The correctness baseline; O(|Q|·|corpus|)
  but fully distributed and shuffle-light (queries broadcast).
* ``knn_lsh`` — the scale path: seeded random-hyperplane buckets with
  multi-probe (flip each single bit), so a query only scans its own and
  adjacent buckets: candidate set shrinks ~2^planes-fold. Falls back to
  exact ranking within candidates.

Both return (query id, neighbor id, cosine, rank<=k).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from docetl_spark.functions.dedup import hyperplane_bucket
from docetl_spark.functions.vectors import cosine, l2_normalize


def knn_brute(
    corpus: DataFrame, queries: DataFrame, id_col: str, vec_col: str, k: int = 10,
    query_id_col: str | None = None,
) -> DataFrame:
    query_id_col = query_id_col or id_col
    c = corpus.select(F.col(id_col).alias("_nid"), l2_normalize(vec_col).alias("_cv"))
    q = queries.select(F.col(query_id_col).alias("_qid"), l2_normalize(vec_col).alias("_qv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("_nid") != F.col("_qid"))
        .withColumn("cosine", cosine("_cv", "_qv").cast("double"))
    )
    w = Window.partitionBy("_qid").orderBy(F.desc("cosine"), F.col("_nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("_qid").alias("query_id"), F.col("_nid").alias("neighbor_id"), "cosine", "rank")
    )


def knn_lsh(
    corpus: DataFrame, queries: DataFrame, id_col: str, vec_col: str, dim: int,
    k: int = 10, planes: int = 8, seed: int = 42, query_id_col: str | None = None,
    tables: int = 3, probe_bits: int = 1,
) -> DataFrame:
    """``tables`` independent hyperplane tables (different seeds) union
    their candidates — the standard LSH recall lever: a true neighbor is
    missed only if it separates from the query in EVERY table. Candidate
    (query, neighbor) id pairs dedup BEFORE scoring so the final rank
    window sees each pair once; vectors join back onto the (small)
    candidate set rather than riding through the bucket joins.

    ``probe_bits`` is the multi-probe depth: 1 visits the query's bucket
    plus every single-bit flip (planes+1 probes/table); 2 adds all 2-bit
    flips (+C(planes,2)) — the second recall lever when a true neighbor
    straddles two hyperplanes. Probes multiply only the QUERY side, which
    is tiny; the corpus carries one row per table either way."""
    from itertools import combinations

    query_id_col = query_id_col or id_col
    c = corpus.select(F.col(id_col).alias("_nid"), l2_normalize(vec_col).alias("_cv"))
    q = queries.select(F.col(query_id_col).alias("_qid"), l2_normalize(vec_col).alias("_qv"))

    flips = [0] + [1 << p for p in range(planes)]
    if probe_bits >= 2:
        flips += [(1 << a) | (1 << b) for a, b in combinations(range(planes), 2)]

    c_b0 = c.select(
        "_nid",
        *[hyperplane_bucket("_cv", dim, planes, seed + t).alias(f"_b0_{t}") for t in range(tables)],
    )
    c_ids = c_b0.select(
        "_nid",
        F.explode(F.array(*[
            F.struct(F.lit(t).alias("_t"), F.col(f"_b0_{t}").alias("_b")) for t in range(tables)
        ])).alias("_tb"),
    ).select("_nid", "_tb._t", "_tb._b")
    # materialize per-table base buckets as columns FIRST: inlining the
    # hyperplane fold into every probe struct duplicates its (large)
    # expression tree tables*probes times — Catalyst does not CSE it and
    # codegen compile time explodes
    q_b0 = q.select(
        "_qid", "_qv",
        *[hyperplane_bucket("_qv", dim, planes, seed + t).alias(f"_b0_{t}") for t in range(tables)],
    )
    q_ids = q_b0.select(
        "_qid",
        F.explode(F.array(*[
            F.struct(F.lit(t).alias("_t"), F.col(f"_b0_{t}").bitwiseXOR(F.lit(m)).alias("_b"))
            for t in range(tables)
            for m in flips
        ])).alias("_tb"),
    ).select("_qid", "_tb._t", "_tb._b")

    pairs = (
        c_ids.join(q_ids, ["_t", "_b"])
        .filter(F.col("_nid") != F.col("_qid"))
        .select("_qid", "_nid")
        .distinct()
    )
    scored = (
        pairs.join(c, "_nid")
        .join(F.broadcast(q), "_qid")
        .withColumn("cosine", cosine("_cv", "_qv").cast("double"))
    )
    w = Window.partitionBy("_qid").orderBy(F.desc("cosine"), F.col("_nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("_qid").alias("query_id"), F.col("_nid").alias("neighbor_id"), "cosine", "rank")
    )
