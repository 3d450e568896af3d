"""Resolve operator — entity resolution (SURVEY.md §2.4; reference
docetl/operations/resolve.py, 772 LoC).

Pipeline: blocking -> candidate pairs -> match edges -> connected
components -> per-cluster canonicalization written back onto every member.

Spark-first choices:

* blocking-key equality pairs come from a self-equi-join (hash join),
  never an O(n²) loop; embedding blocking goes through the LSH/threshold
  similarity join in functions.dedup;
* the reference's union-find with path compression (resolve.py:25-29,
  :447-477) is replaced by **iterative min-label propagation** over the
  edge DataFrame — the standard distributed connected-components loop
  (converges in O(graph diameter) rounds; each round one shuffle;
  lineage cut with localCheckpoint every round);
* canonicalization = grouped apply per cluster: majority vote (pandas
  ``mode``) per column, mirroring resolve.py:729-741, or a custom
  ``resolution_fn``.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

RID = "_rid"
CLUSTER = "_cluster_id"


def _pairs_by_blocking_keys(nodes: DataFrame, blocking_keys: list[str]) -> DataFrame:
    """Candidate pairs sharing the exact blocking-key tuple (hash self-join).
    Reference short-circuits key-equal pairs to matches (resolve.py:193-200)."""
    a = nodes.select(*blocking_keys, F.col(RID).alias("_id1"))
    b = nodes.select(*blocking_keys, F.col(RID).alias("_id2"))
    return (
        a.join(b, on=blocking_keys, how="inner")
        .filter(F.col("_id1") < F.col("_id2"))
        .select("_id1", "_id2")
    )


def connected_components(edges: DataFrame, max_iter: int = 20) -> DataFrame:
    """Min-label propagation: returns (node, component) where component is
    the min node id reachable. ``edges``: columns _id1, _id2 (undirected).

    Scale notes: each iteration is one groupBy shuffle over the edge list;
    blocking bounds component sizes in practice (resolve runs CC per
    blocking partition — SURVEY §7.3 risk 4). localCheckpoint every
    iteration keeps the plan from growing exponentially.
    """
    sym = edges.select(F.col("_id1").alias("src"), F.col("_id2").alias("dst")).unionByName(
        edges.select(F.col("_id2").alias("src"), F.col("_id1").alias("dst"))
    )
    nodes = sym.select(F.col("src").alias("node")).distinct()
    labels = nodes.withColumn("comp", F.col("node")).localCheckpoint(eager=True)
    sym = sym.localCheckpoint(eager=True)

    for _ in range(max_iter):
        neigh = (
            sym.join(labels, sym.src == labels.node, "inner")
            .select(F.col("dst").alias("node"), F.col("comp"))
            .groupBy("node")
            .agg(F.min("comp").alias("ncomp"))
        )
        new_labels = (
            labels.join(neigh, on="node", how="left")
            .select("node", F.least(F.col("comp"), F.coalesce(F.col("ncomp"), F.col("comp"))).alias("comp"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), on="node")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("node"), F.col("comp"))


def resolve(
    df: DataFrame,
    blocking_keys: list[str] | None = None,
    compare: Column | Callable[[pd.DataFrame], pd.Series] | None = None,
    pair_candidates: DataFrame | None = None,
    resolution_fn: Callable[[pd.DataFrame], dict] | None = None,
    canonical_cols: list[str] | None = None,
    name: str = "resolve",
    max_iter: int = 20,
    limit_comparisons: int | None = None,
) -> DataFrame:
    """Deduplicate/canonicalize rows in place; adds ``_cluster_id``.

    * ``blocking_keys``: pairs sharing the key tuple become candidates
      (and matches, if ``compare`` is None — the reference's zero-cost
      short circuit).
    * ``pair_candidates``: optional precomputed candidate pairs
      (_id1,_id2) e.g. from an embedding similarity join; the ids must be
      ``xxhash64`` of all columns (see ``row_id``).
    * ``compare``: predicate over pair rows (columns suffixed _1/_2) that
      confirms a match.
    * canonicalization: ``resolution_fn(group)->dict`` or per-column
      majority vote over ``canonical_cols`` (default: all non-system
      string columns).
    """
    nodes = df.withColumn(RID, row_id(df))

    if blocking_keys and compare is None and pair_candidates is None:
        # Zero-cost short circuit (resolve.py:193-200): key-equal pairs ARE
        # matches, so by transitivity every row sharing the blocking-key
        # tuple is one cluster — cluster id = min rid per key tuple, ONE
        # shuffle. The pair/CC machinery would materialize O(block²) edges
        # (a 5-value key over 15k rows = 22M pairs) to compute the same
        # thing.
        from pyspark.sql import Window

        # NULL-keyed rows stay singletons, matching the pair-join path
        # (SQL join null semantics never pair them); without the guard the
        # window would lump every NULL-keyed row into one cluster.
        all_nonnull = F.lit(True)
        for k in blocking_keys:
            all_nonnull = all_nonnull & F.col(k).isNotNull()
        out = nodes.withColumn(
            CLUSTER,
            F.when(all_nonnull, F.min(RID).over(Window.partitionBy(*blocking_keys))).otherwise(F.col(RID)),
        )
        return _canonicalize(out, df, resolution_fn, canonical_cols)

    pair_sets = []
    if blocking_keys:
        pair_sets.append(_pairs_by_blocking_keys(nodes, blocking_keys))
    if pair_candidates is not None:
        pair_sets.append(pair_candidates.select("_id1", "_id2"))
    if not pair_sets:
        raise ValueError("resolve needs blocking_keys and/or pair_candidates")

    if limit_comparisons is not None:
        # comparison-budget cap with the reference's prioritization
        # (resolve.py:413-440): key-blocked ("code") pairs outrank
        # embedding/candidate pairs; within a tier the reference
        # random.samples — here a content-hash order, deterministic at any
        # parallelism. TakeOrderedAndProject keeps this bounded: no global
        # sort materializes.
        tagged = [
            p.withColumn("_tier", F.lit(tier)) for tier, p in enumerate(pair_sets)
        ]
        union = tagged[0]
        for p in tagged[1:]:
            union = union.unionByName(p)
        pairs = (
            union.groupBy("_id1", "_id2").agg(F.min("_tier").alias("_tier"))
            .orderBy("_tier", F.xxhash64("_id1", "_id2"))
            .limit(int(limit_comparisons))
            .drop("_tier")
        )
    else:
        pairs = pair_sets[0]
        for p in pair_sets[1:]:
            pairs = pairs.unionByName(p)
        pairs = pairs.distinct()

    if compare is not None:
        l = nodes.select(F.col(RID).alias("_id1"), *[F.col(c).alias(f"{c}_1") for c in df.columns])
        r = nodes.select(F.col(RID).alias("_id2"), *[F.col(c).alias(f"{c}_2") for c in df.columns])
        enriched = pairs.join(l, "_id1").join(r, "_id2")
        if isinstance(compare, Column):
            matched = enriched.filter(compare)
        else:
            fn = compare

            def run(batches):
                for pdf in batches:
                    yield pdf[fn(pdf).astype(bool)]

            matched = enriched.mapInPandas(run, schema=enriched.schema)
        edges = matched.select("_id1", "_id2")
    else:
        edges = pairs

    comp = connected_components(edges, max_iter=max_iter)
    out = nodes.join(comp, nodes[RID] == comp["node"], "left").select(
        *df.columns, RID, F.coalesce(F.col("comp"), F.col(RID)).alias(CLUSTER)
    )
    return _canonicalize(out, df, resolution_fn, canonical_cols)


def _canonicalize(out: DataFrame, df: DataFrame, resolution_fn, canonical_cols) -> DataFrame:
    """Per-cluster canonical values written onto every member: custom
    ``resolution_fn(group)->dict`` or per-column majority vote with stable
    lexicographic tie-break (resolve.py:597-673, :729-741)."""
    canon_cols = canonical_cols or [c for c in df.columns]
    schema_fields = [out.schema[CLUSTER]] + [df.schema[c] for c in canon_cols]
    canon_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in schema_fields)

    if resolution_fn is None:

        def resolution(pdf: pd.DataFrame) -> dict:
            # majority vote per key; ties break lexicographically (stable)
            res = {}
            for c in canon_cols:
                counts = pdf[c].value_counts()
                if len(counts):
                    top = counts[counts == counts.max()]
                    res[c] = sorted(top.index)[0]
                else:
                    res[c] = None
            return res

    else:
        resolution = resolution_fn

    def run_canon(pdf: pd.DataFrame) -> pd.DataFrame:
        vals = resolution(pdf)
        row = {CLUSTER: pdf[CLUSTER].iloc[0], **{c: vals.get(c) for c in canon_cols}}
        return pd.DataFrame([row])

    canon = out.groupBy(CLUSTER).applyInPandas(run_canon, schema=canon_schema)
    keep = [c for c in df.columns if c not in canon_cols]
    return (
        out.select(CLUSTER, *keep)
        .join(canon, on=CLUSTER, how="inner")
        .select(*df.columns, CLUSTER)
    )


def row_id(df: DataFrame) -> Column:
    """Deterministic node id: xxhash64 over all columns (identical rows
    collapse to one node — they are trivially the same entity)."""
    return F.xxhash64(*[F.col(c) for c in df.columns])
