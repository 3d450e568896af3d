"""Deterministic synthetic CDC workload over the north-rule input table
``(repo, path, commit, lang, content)`` — FIXTURES.md F1/F2.

Generated entirely with JVM-side column expressions over ``spark.range``:
no Python executes per row, so generation itself scales to 10^10 events on
a cluster, and the same (seed, n) always produces byte-identical data.

Skew is built in on purpose: repo ids follow a power-law (repo 0 is hot),
exercising the salted/partial-agg paths. The final-state oracle is pure
SQL over the same events (window max-LSN per key), so engine output can be
verified without re-deriving any generator internals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ["python", "java", "go", "rust", "js", "md"]


def gen_change_events(
    spark: SparkSession,
    n_events: int,
    n_keys: int | None = None,
    batch_size: int = 10_000,
    seed: int = 42,
    skew: float = 2.0,
    p_delete: float = 0.05,
    partitions: int | None = None,
    unique_keys: bool = False,
) -> DataFrame:
    """Columns: lsn, batch_id, op, repo, path, commit, lang, content.

    * ``lsn`` = sequence number (strictly increasing, the LWW tiebreaker).
    * key space has ``n_keys`` distinct (repo, path, commit) triples; each
      event targets key ``key_id`` drawn power-law-skewed (hot repos).
    * ``op``: I for a key's plausible first write, U/D afterwards by hash.
    * ``content`` is a deterministic pseudo-text derived from (key, lsn),
      50-500+ chars, so updates genuinely change row bytes.
    """
    n_keys = n_keys or max(1, n_events // 4)
    df = spark.range(0, n_events, numPartitions=partitions)  # id = lsn
    u = (F.pmod(F.xxhash64(F.col("id"), F.lit(seed)), F.lit(1_000_000)) / 1_000_000.0)
    if unique_keys:
        # insert-only initial load: every event is its own key (bijective)
        key_id = F.col("id")
    else:
        # Power-law key choice: floor(n_keys * u^skew) concentrates mass near 0.
        key_id = F.floor(F.lit(n_keys) * F.pow(u, F.lit(skew))).cast("long")
    h = F.xxhash64(key_id, F.lit(seed))
    repo_id = F.pmod(h, F.lit(max(1, n_keys // 50)))
    path_id = F.pmod(F.xxhash64(key_id, F.lit(seed + 1)), F.lit(200))
    u_op = F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 2)), F.lit(1_000)) / 1000.0

    content_seed = F.sha2(F.concat_ws("|", key_id.cast("string"), F.col("id").cast("string")), 256)
    reps = (F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 3)), F.lit(8)) + F.lit(1)).cast("int")

    return df.select(
        F.col("id").alias("lsn"),
        (F.col("id") / batch_size).cast("long").alias("batch_id"),
        F.when(u_op < p_delete, "D").when(u_op < 2 * p_delete, "I").otherwise("U").alias("op"),
        F.concat(F.lit("org"), F.pmod(repo_id, F.lit(97)).cast("string"), F.lit("/repo"), repo_id.cast("string")).alias("repo"),
        F.concat(F.lit("src/mod"), F.pmod(path_id, F.lit(20)).cast("string"), F.lit("/file"), path_id.cast("string"), F.lit(".py")).alias("path"),
        F.sha2(F.concat_ws("|", F.lit("commit"), key_id.cast("string")), 256).substr(1, 40).alias("commit"),
        F.element_at(F.array(*[F.lit(l) for l in LANGS]), (F.pmod(h, F.lit(len(LANGS))) + 1).cast("int")).alias("lang"),
        F.when(u_op < p_delete, F.lit(None).cast("string")).otherwise(F.repeat(content_seed, reps)).alias("content"),
    )


def final_state_oracle(
    events: DataFrame, key_cols: tuple[str, ...] = ("repo", "path", "commit")
) -> DataFrame:
    """Reference final state: per key, the max-LSN event wins; D -> absent.

    Pure declarative SQL (window-free struct-max aggregate) so it runs
    identically in Spark and DuckDB for cross-checks. ``key_cols`` MUST
    match the lake table's merge key: resolving on a coarser key (e.g.
    (repo, path) while the oracle keeps per-commit rows) silently compares
    different semantics — distinct commits collide on (repo, path) and the
    engine rightly LWWs them into one row.
    """
    key_cols = list(key_cols)
    payload = [c for c in events.columns if c not in key_cols]
    packed = F.struct(*[F.col(c) for c in ["lsn"] + [c for c in payload if c != "lsn"]])
    won = events.groupBy(*key_cols).agg(F.max(packed).alias("w"))
    out = won.select(*key_cols, *[F.col(f"w.{c}").alias(c) for c in ["lsn"] + [c for c in payload if c != "lsn"]])
    return out.filter(F.col("op") != "D").drop("op", "batch_id")
