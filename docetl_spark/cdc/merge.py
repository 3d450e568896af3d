"""The merge-apply stage: one CDC microbatch -> one lake-table snapshot.

Semantics (north rule): key-partitioned MERGE upsert keyed on the table's
merge key, last-writer-wins per event LSN, delete support, idempotent
batch-id fencing (exactly-once), in-flight additive + widening schema
evolution, per-batch lineage metrics.

Scale design notes
------------------
* **One shuffle per batch.** The LWW dedup is a ``groupBy(key).agg(max_by)``
  — Spark executes it as partial (map-side combine) + final aggregation, so
  a hot key that dominates the batch is pre-collapsed on every input
  partition before the shuffle. This is the hash-aggregation form of salting;
  an *explicit* two-level salted variant is available for transform stages
  that need it (``docetl_spark.operators.skew.salted_agg``).
* **Copy-on-write touches only affected buckets.** Keys hash into
  ``num_buckets`` buckets via xxhash64 over the full composite key; the
  merge anti-joins ONLY those buckets' current files against the batch keys.
  A batch touching 1% of key space reads+rewrites ~1% of the table.
* **AQE everywhere** — the survivors anti-join is sized at runtime
  (broadcast when the deduped batch is small, skew-split otherwise).

The reference's analogue is in-memory ``{**item, **output}`` row merging
(docetl/operations/map.py:414) plus JSON checkpoints
(docetl/runner.py:546-663); here both become transactional table commits.
"""

from __future__ import annotations

import time
import uuid
from dataclasses import dataclass, field, asdict
from typing import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from docetl_spark.lake.table import LakeTable, Snapshot
from docetl_spark.schema import merge_schemas

FENCE_PROP = "cdc.last-batch-id"
CONTROL_COLS = ("lsn", "batch_id", "op")
DELETED_COL = "_deleted"  # tombstone flag: deletes keep (key, lsn) so a
# late-arriving event with a smaller LSN cannot resurrect a deleted row.

TransformStage = Callable[[DataFrame], DataFrame]


@dataclass
class MergeMetrics:
    """Per-batch lineage record (north rule: offsets, row counts, merge stats)."""

    batch_id: int
    skipped: bool = False
    events_in: int = 0
    keys_in_batch: int = 0
    upserts: int = 0
    deletes: int = 0
    buckets_touched: int = 0
    min_lsn: int | None = None
    max_lsn: int | None = None
    snapshot_version: int | None = None
    duration_sec: float = 0.0
    bucket_rows: dict[str, int] = field(default_factory=dict)

    def to_dict(self) -> dict:
        return asdict(self)


def _align(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Project ``df`` onto ``schema``: missing columns become typed nulls,
    shared columns cast to the (possibly widened) target type."""
    have = set(df.columns)
    cols = [
        (F.col(f.name).cast(f.dataType) if f.name in have else F.lit(None).cast(f.dataType)).alias(f.name)
        for f in schema.fields
    ]
    return df.select(*cols)


def dedup_last_writer(
    batch: DataFrame, key_cols: list[str], order_col: str = "lsn", count_col: str | None = None
) -> DataFrame:
    """Collapse a batch to one winning event per key: max ``order_col`` wins.

    Implemented as a struct-max aggregate under ``groupBy(key)`` rather than
    a row_number window: the aggregate gets map-side partial combine
    (skew-safe) and ties on lsn break deterministically by the struct
    comparison. Mirrors LWW-by-LSN from the north rule. If ``count_col`` is
    given, a per-key pre-dedup event count rides along (same shuffle, free).
    """
    payload = [c for c in batch.columns if c not in key_cols]
    packed = F.struct(F.col(order_col), *[F.col(c) for c in payload if c != order_col])
    aggs = [F.max(packed).alias("_w")]
    if count_col:
        aggs.append(F.count(F.lit(1)).alias(count_col))
    won = batch.groupBy(*key_cols).agg(*aggs)
    out_cols = [F.col(k) for k in key_cols] + [
        F.col(f"_w.{c}").alias(c) for c in [order_col] + [c for c in payload if c != order_col]
    ]
    if count_col:
        out_cols.append(F.col(count_col))
    return won.select(*out_cols)


def merge_apply(
    spark: SparkSession,
    table: LakeTable,
    batch: DataFrame,
    batch_id: int,
    stages: Iterable[TransformStage] = (),
    fence_prop: str = FENCE_PROP,
) -> MergeMetrics:
    """Apply one microbatch of change events to ``table``.

    ``batch`` columns: ``lsn long, op string in {I,U,D}``, the table's key
    columns, plus any payload columns (which may include columns the table
    has never seen -> additive schema evolution, or wider numeric types ->
    widening evolution). ``stages`` are vectorized DataFrame transforms run
    on the batch BEFORE the merge (the DocETL map/filter analogues).
    """
    t0 = time.time()
    snap = table.snapshot()
    last = int(snap.properties.get(fence_prop, "-1"))
    if batch_id <= last:
        # Fence: this batch already committed — idempotent replay no-op.
        return MergeMetrics(batch_id=batch_id, skipped=True, snapshot_version=snap.version)

    for stage in stages:
        batch = stage(batch)

    key_cols = snap.key_cols
    # -- in-flight schema evolution -------------------------------------
    payload_fields = [f for f in batch.schema.fields if f.name not in CONTROL_COLS]
    incoming = T.StructType(
        payload_fields
        + [T.StructField("lsn", T.LongType(), True), T.StructField(DELETED_COL, T.BooleanType(), True)]
    )
    evolved = merge_schemas(snap.schema, incoming)
    snap_for_bucket = Snapshot(**{**snap.__dict__, "schema": evolved})

    # -- LWW dedup within batch (one shuffle, map-side combine) ----------
    winners = dedup_last_writer(batch, key_cols, count_col="_events").persist()
    try:
        stats = winners.agg(
            F.count(F.lit(1)).alias("keys"),
            F.sum("_events").alias("events"),
            F.sum((F.col("op") == "D").cast("long")).alias("dels"),
            F.min("lsn").alias("min_lsn"),
            F.max("lsn").alias("max_lsn"),
        ).collect()[0]
        n_keys = stats["keys"] or 0
        n_del = int(stats["dels"] or 0)

        metrics = MergeMetrics(
            batch_id=batch_id,
            events_in=int(stats["events"] or 0),
            keys_in_batch=n_keys,
            upserts=n_keys - n_del,
            deletes=n_del,
            min_lsn=stats["min_lsn"],
            max_lsn=stats["max_lsn"],
        )

        if n_keys == 0:
            # Nothing to merge, still advance the fence atomically.
            new_snap = table.commit({}, set(), schema=evolved,
                                    properties={fence_prop: str(batch_id)},
                                    summary={"operation": "merge", **metrics.to_dict()},
                                    expected_version=snap.version)
            metrics.snapshot_version = new_snap.version
            metrics.duration_sec = time.time() - t0
            return metrics

        # -- affected buckets (small driver-side list, <= num_buckets) ---
        wb = winners.withColumn("_bucket", table.bucket_expr(snap_for_bucket))
        bucket_counts = {r["_bucket"]: r["cnt"] for r in
                         wb.groupBy("_bucket").agg(F.count(F.lit(1)).alias("cnt")).collect()}
        affected = sorted(bucket_counts)

        # -- merge: union current bucket state with batch winners, then a
        # second LWW dedup — a row survives with whichever side has the
        # higher LSN, so out-of-order batches and late events are safe.
        current = _align(table.read_buckets(spark, affected, snap), evolved)
        winners_t = winners.withColumn(DELETED_COL, F.col("op") == F.lit("D"))
        new_state = dedup_last_writer(
            current.unionByName(_align(winners_t, evolved)), key_cols
        )

        tag = f"snap{snap.version + 1:08d}-{uuid.uuid4().hex[:8]}"
        new_files = table.write_bucket_files(new_state, snap_for_bucket, tag)

        new_snap = table.commit(
            new_files,
            replaced_buckets=set(affected),
            schema=evolved,
            properties={fence_prop: str(batch_id)},
            summary={"operation": "merge", **metrics.to_dict()},
            expected_version=snap.version,
        )
        metrics.buckets_touched = len(affected)
        metrics.bucket_rows = {str(b): int(c) for b, c in bucket_counts.items()}
        metrics.snapshot_version = new_snap.version
        metrics.duration_sec = time.time() - t0
        return metrics
    finally:
        winners.unpersist()
