"""Exactly-once incremental near-dup dedup ingest.

The composition a 100 TB training-data pipeline actually runs: the deduped
corpus lives as a lake table (docs + their minhash signatures); each fenced
batch of incoming documents is

1. signed (Arrow minhash kernel) and LSH-banded,
2. blocked against the STORED corpus via a band-bucket equi-join (never
   all-pairs — the stored side re-derives band buckets from its persisted
   signatures, so the index costs num_hashes longs per doc; scale note:
   this is an O(|corpus|) narrow column scan per batch, which the lake's
   column pruning makes cheap but not free — at 10^10 docs, materialize
   the banded (bucket, doc_id) projection as its own bucketed table so a
   batch joins only its buckets, the same pruning story as read_keys),
3. exact-verified (n-gram jaccard on the candidate pairs only),
4. greedily deduped: a doc is dropped iff it near-dups any RETAINED
   earlier doc — stored docs count as earlier; within the batch "earlier"
   is ascending id (the arrival order of a stream that assigns monotone
   ids). This is the standard streaming dedup rule, and it is
   BATCH-INVARIANT: because each doc's decision depends only on decisions
   of earlier docs, any split of an id-ordered stream into batches yields
   the same retained set as one big batch (certified by the
   ``incremental_dedup_docs`` contract query),
5. committed through ``merge_apply`` — the fence makes redelivered or
   replayed batches no-ops, so a crash between steps never double-indexes
   or re-drops.

Reference anchor: this extends docetl's resolve/near-dup machinery
(SURVEY §2.4) to the incremental setting the reference never covers —
the "beyond the reference" dedup pillar fused with the CDC spine.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from docetl_spark.cdc.merge import FENCE_PROP, MergeMetrics, merge_apply
from docetl_spark.functions.dedup import (
    band_buckets,
    minhash_signature,
    shingles,
)
from docetl_spark.lake.table import LakeTable

SIG_COL = "_sig"


def greedy_first_kept(
    pairs: DataFrame, max_iter: int = 50, driver_threshold: int = 100_000
) -> DataFrame:
    """Greedy (lexicographically-first) dedup decisions over a sparse
    near-dup pair graph.

    ``pairs``: (_id1, _id2) with _id1 < _id2. Returns (_id, kept) for every
    id APPEARING in pairs; ids absent from the graph are trivially kept
    (callers left-join and coalesce to true). Semantics: process ids
    ascending; keep a doc iff none of its smaller neighbors was kept.

    Distributed round-based evaluation (same shape as the CC loop in
    resolve_ops): each round decides every node whose smaller neighbors
    are all decided — kept if they all dropped, dropped if any kept.
    Rounds = longest dependency chain in the pair graph (tiny for
    real near-dup graphs); each round is one join over the pair set,
    localCheckpoint-pinned so lineage stays flat.
    """
    from pyspark.sql import types as T

    out_schema = T.StructType([
        T.StructField("_id", pairs.schema["_id1"].dataType, True),
        T.StructField("kept", T.BooleanType(), True),
    ])
    # one job answers both "empty?" and "driver-sized?"
    # one job answers "empty?", "driver-sized?" AND fetches the driver
    # path's rows — the verify pipeline behind `pairs` is expensive and
    # must not run once for a count and again for a collect
    rows = pairs.select("_id1", "_id2").limit(driver_threshold + 1).collect()
    if not rows:
        return pairs.sparkSession.createDataFrame([], out_schema)
    if len(rows) <= driver_threshold:
        # guarded driver fast path (the cluster()-style contract): real
        # near-dup graphs are sparse, and the sequential greedy over a
        # collected edge list replaces ~6 Spark jobs per decision round
        # with one collect. Above the threshold the distributed
        # round-based loop below takes over (re-running the pair plan).
        smaller: dict = {}
        for r in rows:
            s, t = (r["_id1"], r["_id2"]) if r["_id1"] < r["_id2"] else (r["_id2"], r["_id1"])
            smaller.setdefault(t, set()).add(s)
            smaller.setdefault(s, set())
        kept: dict = {}
        for x in sorted(smaller):
            kept[x] = not any(kept[y] for y in smaller[x])
        return pairs.sparkSession.createDataFrame(sorted(kept.items()), out_schema)

    edges = pairs.select(
        F.least("_id1", "_id2").alias("_s"), F.greatest("_id1", "_id2").alias("_t")
    ).distinct().localCheckpoint()
    nodes = (
        edges.select(F.col("_s").alias("_id"))
        .unionByName(edges.select(F.col("_t").alias("_id")))
        .distinct()
        .localCheckpoint()
    )
    # round 0: nodes with no smaller neighbor are kept
    decided = (
        nodes.join(edges, nodes["_id"] == edges["_t"], "left_anti")
        .select("_id", F.lit(True).alias("kept"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        undecided = nodes.join(decided, "_id", "left_anti")
        if undecided.isEmpty():
            break
        # smaller-neighbor decision summary per undecided node
        nbrs = (
            undecided.join(edges, undecided["_id"] == edges["_t"])
            .select("_id", F.col("_s"))
            .join(decided.withColumnRenamed("_id", "_s"), "_s", "left")
            .groupBy("_id")
            .agg(
                F.max(F.coalesce(F.col("kept"), F.lit(False))).alias("_any_kept"),
                F.min(F.col("kept").isNotNull()).alias("_all_decided"),
            )
        )
        newly = (
            nbrs.filter(F.col("_any_kept") | F.col("_all_decided"))
            .select("_id", (~F.col("_any_kept")).alias("kept"))
        )
        if newly.isEmpty():  # pragma: no cover - cycle guard (graph is a DAG by _s < _t)
            break
        decided = decided.unionByName(newly).localCheckpoint()
    # never return a partial decision set: undecided tails would silently
    # default to kept downstream, diverging from the greedy contract
    if not nodes.join(decided, "_id", "left_anti").isEmpty():
        raise ValueError(
            f"greedy_first_kept did not converge in {max_iter} rounds — the pair "
            "graph has a longer dependency chain; raise max_iter"
        )
    return decided


@dataclass
class DedupIngestMetrics:
    merge: MergeMetrics
    batch_docs: int = 0
    dropped_cross: int = 0
    dropped_within: int = 0
    kept: int = 0


def dedup_ingest(
    spark: SparkSession,
    table: LakeTable,
    batch: DataFrame,
    batch_id: int,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.8,
    mode: str = "cow",
) -> DedupIngestMetrics:
    """Ingest one fenced batch into the deduped corpus ``table``.

    The table must be keyed on ``id_col`` (create with
    ``LakeTable.create(path, key_cols=[id_col], ...)`` /
    ``create_cdc_table``); the stored schema is the batch schema plus
    ``_sig array<long>``. Kept rows commit as insert ops with
    ``lsn = id`` (ids are unique, LWW is vacuous). A batch whose id has
    already committed is fully skipped — the dedup work itself is fenced,
    not just the write.
    """
    from docetl_spark.cdc.replay import read_state

    id_type = batch.schema[id_col].dataType.typeName()
    if id_type not in ("byte", "short", "integer", "long"):
        # the greedy "earlier" ordering and the synthesized lsn both need a
        # numeric id; a string id would order lexicographically ("10"<"9")
        # and cast to a NULL lsn silently
        raise ValueError(
            f"dedup_ingest needs an integral id_col; {id_col!r} is {id_type} "
            "(derive one upstream, e.g. xxhash64 of a natural key)"
        )
    snap = table.snapshot()
    if batch_id <= int(snap.properties.get(FENCE_PROP, "-1")):
        return DedupIngestMetrics(
            merge=MergeMetrics(batch_id=batch_id, skipped=True, snapshot_version=snap.version)
        )

    signed = batch.withColumn(SIG_COL, minhash_signature(F.col(text_col), num_hashes, shingle_n))
    signed = signed.localCheckpoint()  # pin: sigs feed banding, verify, and the write
    jac = F.round(
        F.size(F.array_intersect("_sh1", "_sh2"))
        / F.greatest(F.size(F.array_union("_sh1", "_sh2")), F.lit(1)),
        6,
    ).cast("double")

    def verified(cands: DataFrame, left: DataFrame, right: DataFrame) -> DataFrame:
        """Exact n-gram jaccard >= threshold over candidate (_id1,_id2)."""
        s1 = left.select(F.col(id_col).alias("_id1"), shingles(text_col, shingle_n).alias("_sh1"))
        s2 = right.select(F.col(id_col).alias("_id2"), shingles(text_col, shingle_n).alias("_sh2"))
        return (
            cands.join(s1, "_id1").join(s2, "_id2")
            .filter(jac >= threshold)
            .select("_id1", "_id2")
        )

    bb = band_buckets(SIG_COL, num_hashes, bands)
    batch_banded = signed.select(F.col(id_col).alias("_bid"), F.explode(bb).alias("_bucket"))

    stored = read_state(spark, table)
    has_stored = bool(snap.files) or snap.properties.get("cdc.has-deltas") == "true"
    dropped_cross = spark.createDataFrame([], f"_id {batch.schema[id_col].dataType.simpleString()}")
    if has_stored:
        stored_banded = stored.select(
            F.col(id_col).alias("_sid"), F.explode(band_buckets(SIG_COL, num_hashes, bands)).alias("_bucket")
        )
        cross_cands = (
            batch_banded.join(stored_banded, "_bucket")
            .select(F.col("_sid").alias("_id1"), F.col("_bid").alias("_id2"))
            .distinct()
        )
        cross_pairs = verified(cross_cands, stored, signed)
        dropped_cross = cross_pairs.select(F.col("_id2").alias("_id")).distinct()

    # broadcast the (pair-bounded) drop list: the left side carries full
    # document text and must never shuffle (cdc/merge.py design rule)
    survivors = signed.join(
        F.broadcast(dropped_cross.withColumnRenamed("_id", id_col)), id_col, "left_anti"
    ).localCheckpoint()

    # within-batch pairs among cross-survivors, then the greedy rule
    surv_banded = survivors.select(F.col(id_col).alias("_bid"), F.explode(bb).alias("_bucket"))
    within_cands = (
        surv_banded.alias("a").join(surv_banded.alias("b"), "_bucket")
        .filter(F.col("a._bid") < F.col("b._bid"))
        .select(F.col("a._bid").alias("_id1"), F.col("b._bid").alias("_id2"))
        .distinct()
    )
    within_pairs = verified(within_cands, survivors, survivors)
    decisions = greedy_first_kept(within_pairs)
    kept_rows = (
        survivors.join(
            F.broadcast(decisions.withColumnRenamed("_id", id_col)), id_col, "left"
        )
        .filter(F.coalesce(F.col("kept"), F.lit(True)))
        .drop("kept")
    )

    n_batch = signed.count()
    n_surv = survivors.count()
    changes = kept_rows.select(
        F.col(id_col).cast("long").alias("lsn"),
        F.lit("I").alias("op"),
        *[c for c in kept_rows.columns],
    )
    metrics = merge_apply(spark, table, changes, batch_id, mode=mode)
    n_kept = metrics.keys_in_batch if not metrics.skipped else 0
    return DedupIngestMetrics(
        merge=metrics,
        batch_docs=n_batch,
        dropped_cross=n_batch - n_surv,
        dropped_within=n_surv - n_kept,
        kept=n_kept,
    )
