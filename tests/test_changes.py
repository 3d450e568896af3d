"""Change data feed: incremental reads + lake-to-lake replication.

The feed contract (cdc/changes.py): MOR commits serve changes from their
delta files for free; CoW commits need the merge_apply(changelog=True)
sidecar; state-preserving rewrites (compact/rebucket) contribute nothing;
consumers compose the feed with the same LWW rules the engine itself uses.
"""

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from docetl_spark.cdc import (
    changes_as_batch,
    create_cdc_table,
    compact_state,
    dedup_last_writer,
    merge_apply,
    read_changes,
    read_state,
    replay_events,
    replicate,
)
from docetl_spark.cdc.changes import CHANGE_TYPE_COL, COMMIT_TS_COL, COMMIT_VERSION_COL
from docetl_spark.cdc.merge import FENCE_PROP
from docetl_spark.sources.testgen import final_state_oracle, gen_change_events

KEYS = ["repo", "path", "commit"]


@pytest.fixture()
def events(spark):
    return gen_change_events(spark, n_events=3000, n_keys=400, batch_size=750, seed=7).cache()


def _rows(df, *cols):
    sel = df.select(*cols) if cols else df
    return sorted(tuple(r) for r in sel.collect())


def _expected_per_batch_winners(events):
    """Per (key, batch) max-LSN event with its change type — what every
    MOR commit (and, on a monotone-LSN stream, every CoW changelog) emits."""
    w = dedup_last_writer(events, [*KEYS, "batch_id"])
    return w.select(
        *KEYS, "lsn", "content",
        F.when(F.col("op") == "D", "delete").otherwise("upsert").alias(CHANGE_TYPE_COL),
    )


def _feed_rows(feed):
    return _rows(feed, *KEYS, "lsn", "content", CHANGE_TYPE_COL)


def test_mor_feed_is_per_batch_winners(spark, tmp_path, events):
    table = create_cdc_table(str(tmp_path / "t"), KEYS, num_buckets=8)
    replay_events(spark, table, events, mode="mor")

    feed = read_changes(spark, table, since_version=1)
    assert _feed_rows(feed) == _rows(_expected_per_batch_winners(events),
                                     *KEYS, "lsn", "content", CHANGE_TYPE_COL)
    # one commit per batch, ascending commit versions follow batch order
    versions = [r[0] for r in feed.select(COMMIT_VERSION_COL).distinct().sort(COMMIT_VERSION_COL).collect()]
    assert len(versions) == 4
    per_v_max_lsn = {
        r[0]: r[1] for r in feed.groupBy(COMMIT_VERSION_COL).agg(F.max("lsn")).collect()
    }
    assert [per_v_max_lsn[v] for v in versions] == sorted(per_v_max_lsn.values())
    # consumer-side LWW over the feed reproduces the table's final state
    net = dedup_last_writer(feed.drop(COMMIT_VERSION_COL, COMMIT_TS_COL), KEYS)
    live = net.filter(F.col(CHANGE_TYPE_COL) != "delete").drop(CHANGE_TYPE_COL, "_deleted")
    want = final_state_oracle(events)
    assert _rows(live, *KEYS, "lsn", "content") == _rows(want, *KEYS, "lsn", "content")


def test_feed_version_slice(spark, tmp_path, events):
    table = create_cdc_table(str(tmp_path / "t"), KEYS, num_buckets=8)
    replay_events(spark, table, events, mode="mor")
    # versions: 1=create, 2..5 = batches 0..3
    feed = read_changes(spark, table, since_version=3, to_version=4)
    want = _expected_per_batch_winners(events.filter(F.col("batch_id") == 2))
    assert _feed_rows(feed) == _rows(want, *KEYS, "lsn", "content", CHANGE_TYPE_COL)
    # empty slice: since == to
    assert read_changes(spark, table, 5, 5).count() == 0
    with pytest.raises(ValueError):
        read_changes(spark, table, 5, 4)


def test_cow_without_changelog_raises(spark, tmp_path, events):
    table = create_cdc_table(str(tmp_path / "t"), KEYS, num_buckets=8)
    replay_events(spark, table, events)  # cow, no changelog
    with pytest.raises(ValueError, match="changelog"):
        read_changes(spark, table, since_version=1).count()


def test_cow_changelog_feed_matches_mor(spark, tmp_path, events):
    """On a monotone-LSN stream CoW changelogs equal the MOR feed, and the
    winner plan's sidecar rides vacuum-safe in the commit summary."""
    table = create_cdc_table(str(tmp_path / "t"), KEYS, num_buckets=8)
    replay_events(spark, table, events, changelog=True)
    feed = read_changes(spark, table, since_version=1)
    assert _feed_rows(feed) == _rows(_expected_per_batch_winners(events),
                                     *KEYS, "lsn", "content", CHANGE_TYPE_COL)
    # every merge commit recorded its sidecar
    merges = [h for h in table.history() if h["operation"] == "merge"]
    assert merges and all(h["summary"].get("changelog") for h in merges)
    # final state unchanged by the changelog machinery
    assert _rows(read_state(spark, table), *KEYS, "lsn") == _rows(
        final_state_oracle(events), *KEYS, "lsn")


def test_cow_changelog_excludes_lww_beaten_keys(spark, tmp_path):
    """An out-of-order CoW batch whose key loses to stored state emits NO
    change for that key (net semantics) — unlike MOR's per-commit feed."""
    t = create_cdc_table(str(tmp_path / "t"), ["k"], num_buckets=4)
    b1 = spark.createDataFrame(
        [Row(lsn=10, op="U", k="a", content="new"), Row(lsn=11, op="U", k="b", content="b1")])
    b2 = spark.createDataFrame(
        [Row(lsn=5, op="U", k="a", content="stale"), Row(lsn=12, op="U", k="c", content="c1")])
    merge_apply(spark, t, b1, 1, changelog=True)
    v_after_b1 = t.current_version()
    merge_apply(spark, t, b2, 2, changelog=True)

    feed2 = read_changes(spark, t, since_version=v_after_b1)
    assert _rows(feed2, "k", "lsn", CHANGE_TYPE_COL) == [("c", 12, "upsert")]
    # the stale 'a' update was never applied anywhere
    assert _rows(read_state(spark, t), "k", "content") == [
        ("a", "new"), ("b", "b1"), ("c", "c1")]


def test_state_preserving_rewrites_are_skipped(spark, tmp_path, events):
    table = create_cdc_table(str(tmp_path / "t"), KEYS, num_buckets=8)
    first = events.filter(F.col("batch_id") <= 1)
    replay_events(spark, table, first, mode="mor")
    compact_state(spark, table)  # folds deltas: rewrite, no logical change
    replay_events(spark, table, events, mode="mor")  # batches 2,3
    table.rebucket(spark, 16)

    feed = read_changes(spark, table, since_version=1)
    assert _feed_rows(feed) == _rows(_expected_per_batch_winners(events),
                                     *KEYS, "lsn", "content", CHANGE_TYPE_COL)
    ops = {h["operation"] for h in table.history()}
    assert {"compact", "rebucket"} <= ops  # the rewrites really happened


def test_feed_aligns_in_range_schema_evolution(spark, tmp_path):
    t = create_cdc_table(str(tmp_path / "t"), ["k"], num_buckets=4)
    b1 = spark.createDataFrame([Row(lsn=1, op="I", k="a", content="x")])
    b2 = spark.createDataFrame([Row(lsn=2, op="I", k="b", content="y", lang="py")])
    merge_apply(spark, t, b1, 1, mode="mor")
    merge_apply(spark, t, b2, 2, mode="mor")

    feed = read_changes(spark, t, since_version=1)
    assert "lang" in feed.columns  # aligned to the evolved end schema
    got = {r["k"]: r["lang"] for r in feed.collect()}
    assert got == {"a": None, "b": "py"}


def test_fence_only_and_empty_commits_yield_no_changes(spark, tmp_path, events):
    t = create_cdc_table(str(tmp_path / "t"), KEYS, num_buckets=8)
    empty = events.filter(F.lit(False))
    merge_apply(spark, t, empty, 1, mode="mor")  # fence-only commit
    assert read_changes(spark, t, since_version=1).count() == 0


def test_vacuum_is_the_feed_retention_window(spark, tmp_path, events):
    table = create_cdc_table(str(tmp_path / "t"), KEYS, num_buckets=8)
    replay_events(spark, table, events, changelog=True)
    v = table.current_version()  # 5
    # keep v3..v5: reading changes since v3 needs v3's file list as the
    # diff base plus the v4/v5 sidecars — the window bounds consumer lag
    table.vacuum(keep_versions=3)
    # retained range still serves changes (sidecars kept alive)
    feed = read_changes(spark, table, since_version=v - 2, to_version=v)
    want = _expected_per_batch_winners(events.filter(F.col("batch_id") >= 2))
    assert _feed_rows(feed) == _rows(want, *KEYS, "lsn", "content", CHANGE_TYPE_COL)
    # pruned range is gone — metadata deleted
    with pytest.raises(FileNotFoundError):
        read_changes(spark, table, since_version=1)


def test_replicate_exactly_once_resume(spark, tmp_path, events):
    src = create_cdc_table(str(tmp_path / "src"), KEYS, num_buckets=8)
    dst = create_cdc_table(str(tmp_path / "dst"), KEYS, num_buckets=4)
    first = events.filter(F.col("batch_id") <= 1)
    replay_events(spark, src, first, mode="mor")

    m1 = replicate(spark, src, dst)
    assert m1 and not any(m.skipped for m in m1)
    assert _rows(read_state(spark, dst), *KEYS, "lsn", "content") == _rows(
        read_state(spark, src), *KEYS, "lsn", "content")
    # idempotent: nothing new at the source -> no-op
    assert replicate(spark, src, dst) == []

    # source advances (and compacts mid-range); replica follows incrementally
    replay_events(spark, src, events, mode="mor")
    compact_state(spark, src)
    m2 = replicate(spark, src, dst)
    assert m2
    assert _rows(read_state(spark, dst), *KEYS, "lsn", "content") == _rows(
        final_state_oracle(events), *KEYS, "lsn", "content")
    # the fence is the cursor: last applied source version recorded
    assert int(dst.snapshot().properties[FENCE_PROP]) >= src.current_version() - 1


def test_replicate_partial_then_catchup(spark, tmp_path, events):
    """Stop the follower mid-history (to_version), restart with no bound:
    it picks up exactly after its fence."""
    src = create_cdc_table(str(tmp_path / "src"), KEYS, num_buckets=8)
    dst = create_cdc_table(str(tmp_path / "dst"), KEYS, num_buckets=4)
    replay_events(spark, src, events, mode="mor")  # versions 2..5

    replicate(spark, src, dst, to_version=3)  # batches 0,1 only
    want_partial = final_state_oracle(events.filter(F.col("batch_id") <= 1))
    assert _rows(read_state(spark, dst), *KEYS, "lsn") == _rows(want_partial, *KEYS, "lsn")

    replicate(spark, src, dst)
    assert _rows(read_state(spark, dst), *KEYS, "lsn", "content") == _rows(
        final_state_oracle(events), *KEYS, "lsn", "content")


def test_changes_as_batch_shape(spark, tmp_path, events):
    table = create_cdc_table(str(tmp_path / "t"), KEYS, num_buckets=8)
    replay_events(spark, table, events, mode="mor")
    batch = changes_as_batch(read_changes(spark, table, 1))
    assert {"lsn", "batch_id", "op"} <= set(batch.columns)
    assert "_deleted" not in batch.columns and CHANGE_TYPE_COL not in batch.columns
    assert set(r[0] for r in batch.select("op").distinct().collect()) <= {"U", "D"}
