"""Cluster + link_resolve operators (SURVEY.md §2.6, §2.4).

``cluster`` — reference docetl/operations/cluster.py:13-283: agglomerative
(Ward) full tree over row embeddings, optional collapse by distance-gap
quantile, per-internal-node summaries, and each leaf row annotated with
``clusters`` = tuple of ancestor summaries (nearest ancestor first,
cluster.py:275-282).

Spark-first shape: embeddings are computed distributed (caller-supplied
vectorized fn or an existing ``array<float>`` column); the dendrogram
itself is inherently sequential, so vectors are collected to the driver —
EXACTLY like the reference, which fits sklearn in memory — and the
leaf->path annotation is joined back as a DataFrame. At scale you don't
full-dendrogram 10^10 rows; you block first (e.g. by repo) and cluster
per block via ``groupBy().applyInPandas``, or switch to Spark ML
BisectingKMeans — this module keeps exact reference parity for the
driver-sized case and exposes ``cluster_blocked`` for the distributed one.

``link_resolve`` — reference docetl/operations/link_resolve.py:15-198:
values in a row's ``link_key`` list that match no ``id_key`` value get
re-pointed to the most similar id (similarity >= threshold, optional
match confirm); replacements substituted in place (:142-146). Spark shape:
explode -> anti-join (dangling links) -> similarity join against the id
dimension (broadcast: the id side is a distinct-values dim) -> rebuild
arrays with posexplode/collect_list, order preserved.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# Ward agglomerative dendrogram (numpy; sklearn semantics, no sklearn dep)
# ---------------------------------------------------------------------------

def ward_tree(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Ward-linkage agglomerative clustering of rows of ``x``.

    Returns (children, distances) exactly shaped like sklearn's
    AgglomerativeClustering(compute_full_tree=True).children_ /
    .distances_: n-1 merges, node ids n..2n-2, Lance-Williams ward update.
    """
    n = len(x)
    if n < 2:
        return np.zeros((0, 2), dtype=int), np.zeros(0)
    # ward merge distances seed as plain euclidean between singletons
    # (scipy/sklearn convention), then update via Lance-Williams below
    sq = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    d = np.sqrt(sq)
    np.fill_diagonal(d, np.inf)
    size = np.ones(n)
    active = np.arange(n)  # active[i] = current node id occupying slot i
    alive = np.ones(n, dtype=bool)
    children = np.zeros((n - 1, 2), dtype=int)
    dists = np.zeros(n - 1)
    for m in range(n - 1):
        flat = np.argmin(d)
        i, j = divmod(flat, n)
        if d[i, j] == np.inf:  # pragma: no cover - numerical guard
            break
        lo, hi = (i, j) if active[i] < active[j] else (j, i)
        children[m] = (active[lo], active[hi])
        dists[m] = d[i, j]
        # Lance-Williams ward update of slot i; kill slot j
        si, sj = size[i], size[j]
        k = alive.copy()
        k[i] = k[j] = False
        sk = size[k]
        d2 = d[:, :] ** 2
        new = np.sqrt(
            ((si + sk) * d2[i, k] + (sj + sk) * d2[j, k] - sk * d2[i, j]) / (si + sj + sk)
        )
        d[i, k] = new
        d[k, i] = new
        d[j, :] = np.inf
        d[:, j] = np.inf
        alive[j] = False
        size[i] = si + sj
        active[i] = n + m
    return children, dists


def _build_tree(children: np.ndarray, dists: np.ndarray, n: int):
    """Reference cluster.py:141-157 tree shape: leaves are {'_leaf': idx},
    internal nodes {'children': [...], 'distance': d}."""

    def build(i: int):
        if i < n:
            return {"_leaf": int(i)}
        m = i - n
        return {
            "children": [build(int(children[m, 0])), build(int(children[m, 1]))],
            "distance": float(dists[m]),
        }

    return build(n + len(children) - 1)


def _tree_distance_gaps(t) -> set:
    res = set()
    if "children" in t:
        res.update(
            t["distance"] - c["distance"] for c in t["children"] if "distance" in c
        )
        for c in t["children"]:
            res.update(_tree_distance_gaps(c))
    return res


def _annotate_sizes(t) -> int:
    """Default bottom-up summary: subtree size (cluster.py:210-273 with the
    LLM summary replaced by the deterministic stand-in)."""
    if "children" not in t:
        return 1
    n = sum(_annotate_sizes(c) for c in t["children"])
    t["size"] = n
    return n


def _collapse(t, parent_dist=None, collapse=None):
    """Reference cluster.py:176-208: absorb children whose distance gap to
    the parent is below the collapse threshold (flattens tight subtrees)."""
    if "children" not in t:
        return [t]
    if (
        "distance" in t
        and parent_dist is not None
        and collapse is not None
        and parent_dist - t["distance"] < collapse
    ):
        return [g for c in t["children"] for g in _collapse(c, parent_dist, collapse)]
    res = dict(t)
    res["children"] = [
        g for c in t["children"] for g in _collapse(c, t["distance"], collapse)
    ]
    return [res]


def cluster(
    df: DataFrame,
    embedding_col: str,
    summary_fn: Callable[[list[dict]], dict] | None = None,
    collapse: float | None = None,
    output_key: str = "clusters",
    max_driver_rows: int = 100_000,
) -> DataFrame:
    """Annotate every row with its dendrogram ancestor path.

    ``embedding_col`` is an ``array<numeric>`` column (compute it upstream
    with a vectorized pandas UDF — the deterministic stand-in for the
    reference's LLM embeddings). ``summary_fn(children)->dict`` is the
    deterministic stand-in for the summary LLM call
    (cluster.py:210-273); children are dicts with ``distance``/``size``
    plus whatever previous summaries produced. Default summary: subtree
    size + merge distance. Output column ``clusters`` is an
    ``array<string>`` of JSON-ish summaries, nearest ancestor first
    (cluster.py:275-282).
    """
    import json

    n_rows = df.count()
    if n_rows > max_driver_rows:
        raise ValueError(
            f"cluster(): {n_rows} rows exceeds max_driver_rows={max_driver_rows}; "
            "block the data first (cluster per group via applyInPandas) or use "
            "an approximate method — the exact dendrogram is driver-sized by design"
        )
    rid = "_cluster_rid"
    with_id = df.withColumn(rid, F.xxhash64(*[F.col(c) for c in df.columns]))
    # deterministic driver-side row order -> deterministic tie-breaks in
    # the dendrogram regardless of input partitioning
    pdf = with_id.select(rid, embedding_col).orderBy(rid).toPandas()
    if len(pdf) <= 1:
        return df.withColumn(output_key, F.array().cast("array<string>"))
    # collapse duplicate rids (identical rows) — one leaf per distinct row
    pdf = pdf.drop_duplicates(subset=[rid]).reset_index(drop=True)
    x = np.asarray([np.asarray(v, dtype=float) for v in pdf[embedding_col]])

    children, dists = ward_tree(x)
    tree = _build_tree(children, dists, len(pdf))
    if collapse is not None:
        gaps = np.array(sorted(_tree_distance_gaps(tree)))
        thr = float(gaps[int(len(gaps) * collapse)]) if len(gaps) else None
        tree = _collapse(tree, collapse=thr)[0]

    if summary_fn is None:

        def summary_fn(children_summaries: list[dict]) -> dict:
            return {"size": sum(c.get("size", 1) for c in children_summaries)}

    def annotate(t) -> dict:
        """Bottom-up summaries (cluster.py:210-273)."""
        if "children" not in t:
            return {"size": 1}
        child_summaries = [annotate(c) for c in t["children"]]
        s = summary_fn(child_summaries)
        t.update(s)
        return {**s, "distance": t["distance"]}

    annotate(tree)

    paths: dict[int, list[str]] = {}

    def walk(t, path=()):
        if "children" in t:
            item = {k: v for k, v in t.items() if k != "children"}
            for c in t["children"]:
                walk(c, (item,) + path)
        else:
            paths[int(pdf[rid].iloc[t["_leaf"]])] = [
                json.dumps(p, sort_keys=True, default=str) for p in path
            ]

    walk(tree)
    path_df = df.sparkSession.createDataFrame(
        [(k, v) for k, v in paths.items()], f"{rid} long, {output_key} array<string>"
    )
    return (
        with_id.join(F.broadcast(path_df), rid, "left")
        .withColumn(output_key, F.coalesce(F.col(output_key), F.array().cast("array<string>")))
        .drop(rid)
    )


def cluster_blocked(
    df: DataFrame,
    block_keys: list[str],
    embedding_col: str,
    output_key: str = "clusters",
    collapse: float | None = None,
) -> DataFrame:
    """Distributed variant: one exact dendrogram per block, computed in
    parallel with ``applyInPandas`` (the 10^10-row path: block first —
    SURVEY.md §7.3 risk 4 — then each group is driver-of-its-own-task)."""
    import json as _json

    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(output_key, T.ArrayType(T.StringType()), True)]
    )

    def per_block(pdf: pd.DataFrame) -> pd.DataFrame:
        # deterministic in-group order -> deterministic dendrogram
        sort_cols = [c for c in pdf.columns if c != embedding_col]
        pdf = pdf.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
        x = np.asarray([np.asarray(v, dtype=float) for v in pdf[embedding_col]])
        if len(pdf) <= 1:
            pdf[output_key] = [[] for _ in range(len(pdf))]
            return pdf
        children, dists = ward_tree(x)
        tree = _build_tree(children, dists, len(pdf))
        if collapse is not None:
            gaps = np.array(sorted(_tree_distance_gaps(tree)))
            if len(gaps):
                tree = _collapse(tree, collapse=float(gaps[int(len(gaps) * collapse)]))[0]
        _annotate_sizes(tree)
        paths: dict[int, list[str]] = {}

        def walk(t, path=()):
            if "children" in t:
                item = {k: v for k, v in t.items() if k != "children"}
                for c in t["children"]:
                    walk(c, (item,) + path)
            else:
                paths[t["_leaf"]] = [_json.dumps(p, sort_keys=True) for p in path]

        walk(tree)
        pdf[output_key] = [paths.get(i, []) for i in range(len(pdf))]
        return pdf

    return df.groupBy(*block_keys).applyInPandas(per_block, schema=out_schema)


# ---------------------------------------------------------------------------
# link_resolve
# ---------------------------------------------------------------------------

def token_jaccard(a: Column, b: Column) -> Column:
    """Deterministic stand-in for embedding cosine over short strings:
    token-set Jaccard, computed JVM-side."""
    ta = F.array_distinct(F.split(F.lower(a), r"\s+"))
    tb = F.array_distinct(F.split(F.lower(b), r"\s+"))
    inter = F.size(F.array_intersect(ta, tb)).cast("double")
    union = F.size(F.array_union(ta, tb)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def link_resolve(
    df: DataFrame,
    id_key: str,
    link_key: str,
    blocking_threshold: float = 0.5,
    similarity: Callable[[Column, Column], Column] = token_jaccard,
    confirm: Callable[[Column, Column], Column] | None = None,
) -> DataFrame:
    """Repair dangling foreign keys in ``link_key`` arrays.

    Link values that exactly match some row's ``id_key`` stay; each
    dangling value is replaced by the id value with the highest
    ``similarity`` >= ``blocking_threshold`` (optionally also passing
    ``confirm``), ties broken by id value — deterministic where the
    reference's last-LLM-response-wins dict write
    (link_resolve.py:142-146) is not. Array order is preserved.
    """
    ids = df.select(F.col(id_key).alias("_id_value")).distinct()
    links = df.select(F.explode(link_key).alias("_link_value")).distinct()
    dangling = links.join(ids, links["_link_value"] == ids["_id_value"], "left_anti")

    scored = dangling.crossJoin(F.broadcast(ids)).withColumn(
        "_sim", similarity(F.col("_link_value"), F.col("_id_value"))
    ).filter(F.col("_sim") >= blocking_threshold)
    if confirm is not None:
        scored = scored.filter(confirm(F.col("_link_value"), F.col("_id_value")))
    best = scored.groupBy("_link_value").agg(
        F.max(F.struct(F.col("_sim"), F.col("_id_value").alias("_v"))).alias("_w")
    ).select("_link_value", F.col("_w._v").alias("_replacement"))

    rid = "_lr_rid"
    # content-derived row id (repo convention: replay-stable, never
    # monotonically_increasing_id). Exact-duplicate rows share a rid; the
    # distinct() below collapses their identical (rid, pos, link) triples so
    # the rebuilt arrays don't double up, and the join-back fans the single
    # repaired array out to each duplicate row — same output either way.
    with_id = df.withColumn(rid, F.xxhash64(*[F.col(c) for c in df.columns]))
    # inner posexplode: rows with empty/null link arrays are absent from
    # ``repaired`` and keep their original value via the final coalesce
    exploded = with_id.select(rid, F.posexplode(link_key).alias("_pos", "_link_value")).distinct()
    repaired = (
        exploded.join(F.broadcast(best), "_link_value", "left")
        .withColumn("_fixed", F.coalesce(F.col("_replacement"), F.col("_link_value")))
        .groupBy(rid)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("_pos"), F.col("_fixed")))),
                lambda s: s["_fixed"],
            ).alias("_new_links")
        )
    )
    return (
        with_id.join(repaired, rid, "left")
        .withColumn(link_key, F.coalesce(F.col("_new_links"), F.col(link_key)))
        .drop(rid, "_new_links")
    )
