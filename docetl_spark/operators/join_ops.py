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


def _cap_comparisons(
    joined: DataFrame,
    lkey: str,
    rkey: str,
    limit_comparisons: int,
    length_cols: tuple[str, str] | None,
) -> DataFrame:
    """Deterministic comparison-budget cap before the verify phase
    (reference equijoin.py:271-294 + stratified_length_sample :549-602).

    Reference protocol: group blocked pairs by the longer-avg-length side's
    item, order each group by the other item's length (longest first), and
    take limit//n_groups (+1 for the remainder) per group. Distributed
    form: per-stratum rank window with the same priority, per-stratum cap
    of base+1, then an exact global TakeOrdered at the budget preferring
    low per-stratum ranks — the same round-robin fairness, deterministic
    via hash tiebreaks instead of dict order. Every job here is bounded:
    the post-cap set is <= ~2x the budget."""
    # one diagnostic job covers everything the cap decision needs: pair
    # count, side-length averages, and both candidate stratum counts.
    # The (expensive) blocked join is persisted so it executes exactly
    # once: the stats collect below materializes it, and the capped output
    # reads the cached partitions instead of re-running the join (which at
    # scale is an embedding similarity join — the dominant cost here).
    # MEMORY_AND_DISK: blocked pair sets can exceed executor memory.
    from pyspark import StorageLevel

    joined = joined.persist(StorageLevel.MEMORY_AND_DISK)
    probes = [
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(F.col(lkey)).alias("nl"),
        F.count_distinct(F.col(rkey)).alias("nr"),
    ]
    if length_cols:
        ll, rl = F.length(F.col(length_cols[0])), F.length(F.col(length_cols[1]))
        probes += [F.avg(ll).alias("avg_l"), F.avg(rl).alias("avg_r")]
    stats = joined.agg(*probes).collect()[0]
    if stats["n"] <= limit_comparisons:
        # Under the budget, the whole blocked set IS the output and is
        # bounded (n <= limit). Pin it executor-locally and release the
        # cache entry — persist() without unpersist() would pin the blocked
        # pair set for the session (a steady leak when equijoin runs per
        # micro-batch in replay/streaming loops).
        out = joined.localCheckpoint(eager=True)
        joined.unpersist()
        return out
    tie = F.xxhash64(F.col(lkey), F.col(rkey))
    if length_cols:
        use_left = (stats["avg_l"] or 0.0) > (stats["avg_r"] or 0.0)
        stratum, prio = (lkey, rl) if use_left else (rkey, ll)
        n_strata = int(stats["nl"] if use_left else stats["nr"])
        prio_sort = [prio.desc(), tie]
    else:
        # No length priority: hash order only. (A literal-int priority like
        # F.lit(0) is NOT safe here — Dataset.sort resolves integer literals
        # as ORDER BY ordinals, so lit(0).desc() is "position 0" and fails
        # analysis.)
        stratum = lkey
        n_strata = int(stats["nl"])
        prio_sort = [tie]
    base = max(1, limit_comparisons // max(n_strata, 1))
    w = Window.partitionBy(stratum).orderBy(*prio_sort)
    capped = joined.withColumn("_cmp_rn", F.row_number().over(w)).filter(F.col("_cmp_rn") <= base + 1)
    out = capped.orderBy(F.col("_cmp_rn"), *prio_sort).limit(limit_comparisons).drop("_cmp_rn")
    # Materialize the capped output (<= limit rows) off the cached blocked
    # set, then drop the cache — same leak rationale as the fast path.
    out = out.localCheckpoint(eager=True)
    joined.unpersist()
    return out


def equijoin(
    left: DataFrame,
    right: DataFrame,
    condition: Column | str | None = None,
    verify: Column | Callable[[pd.DataFrame], pd.Series] | None = None,
    limit_left: int | None = None,
    limit_right: int | None = None,
    broadcast_right: bool | None = None,
    embedding_blocking: tuple[str, str, float] | None = None,
    embedding_dim: int | None = None,
    lsh_planes: int = 0,
    lsh_seed: int = 42,
    limit_comparisons: int | None = None,
    comparison_length_cols: tuple[str, str] | None = None,
) -> DataFrame:
    """Inner fuzzy join. ``condition`` references suffixed columns for
    collisions (e.g. ``F.col("id_left") == F.col("user_id")``) or any
    column unique to one side. ``limit_left`` caps matches per left row
    (and vice versa). ``verify`` filters candidate pairs post-join.

    ``embedding_blocking=(left_vec_col, right_vec_col, threshold)`` is the
    reference's cosine blocking phase (equijoin.py:300-405): only pairs
    with cosine >= threshold become candidates. With ``lsh_planes > 0``
    (requires ``embedding_dim``) candidates first block on seeded
    random-hyperplane buckets with single-bit multi-probe — the scale path
    that avoids the |L|x|R| cross product entirely (the bucket join is an
    equi-join Catalyst can hash/broadcast) — then exact-cosine filter.
    Composes with ``condition``/``verify``/limits.
    """
    from docetl_spark.functions.vectors import cosine, l2_normalize

    lkey, rkey = "_ljid", "_rjid"
    left2, right2, common = _suffix_collisions(left, right)
    # stable per-row ids for the limit windows (content-derived, not
    # monotonically_increasing_id — deterministic across retries)
    left2 = left2.withColumn(lkey, F.xxhash64(*[F.col(c) for c in left2.columns]))
    right2 = right2.withColumn(rkey, F.xxhash64(*[F.col(c) for c in right2.columns]))

    sim_filter = None
    if embedding_blocking is not None:
        vl, vr, thr = embedding_blocking
        vl = f"{vl}_left" if vl in common else vl
        vr = f"{vr}_right" if vr in common else vr
        left2 = left2.withColumn("_nvl", l2_normalize(vl))
        right2 = right2.withColumn("_nvr", l2_normalize(vr))
        sim_filter = cosine(F.col("_nvl"), F.col("_nvr")) >= F.lit(thr)
        if lsh_planes > 0:
            if not embedding_dim:
                raise ValueError("lsh_planes requires embedding_dim")
            from docetl_spark.functions.dedup import hyperplane_bucket

            right2 = right2.withColumn("_bkt", hyperplane_bucket("_nvr", embedding_dim, lsh_planes, lsh_seed))
            # materialize the base bucket ONCE before the probe fan-out:
            # inlining the bucket kernel into every probe would evaluate it
            # planes+1 times (each call builds a distinct UDF expression —
            # nothing CSEs them; same lesson as ann._lsh_candidate_pairs)
            left2 = left2.withColumn("_b0", hyperplane_bucket("_nvl", embedding_dim, lsh_planes, lsh_seed))
            probes = F.array(F.col("_b0"), *[F.col("_b0").bitwiseXOR(F.lit(1 << p)) for p in range(lsh_planes)])
            left2 = left2.withColumn("_bkt", F.explode(probes)).drop("_b0")

    if broadcast_right:
        right2 = F.broadcast(right2)

    cond = F.expr(condition) if isinstance(condition, str) else condition
    if embedding_blocking is not None and lsh_planes > 0:
        joined = left2.join(right2, "_bkt", "inner").drop("_bkt").filter(sim_filter)
        if cond is not None:
            joined = joined.filter(cond)
    elif embedding_blocking is not None:
        base = left2.join(right2, cond, "inner") if cond is not None else left2.crossJoin(right2)
        joined = base.filter(sim_filter)
    elif cond is not None:
        joined = left2.join(right2, cond, "inner")
    else:
        joined = left2.crossJoin(right2)
    if embedding_blocking is not None:
        joined = joined.drop("_nvl", "_nvr")

    if limit_comparisons is not None:
        # budget cap on candidate pairs BEFORE the (expensive) verify phase
        joined = _cap_comparisons(joined, lkey, rkey, int(limit_comparisons), comparison_length_cols)

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
