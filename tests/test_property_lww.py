"""Property-based check of merge-apply semantics (hypothesis).

For ANY event stream (random keys, I/U/D ops, payloads), ANY batch
partitioning of it, and redelivery of any already-applied batch, the
final table state must equal the sequential last-writer-wins oracle
computed in plain Python. This generalizes the unit tests the same way a
fuzzer generalizes golden cases; goes beyond the reference's test suite
(which has no property testing)."""

import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from docetl_spark.cdc import create_cdc_table, merge_apply, read_state

KEYS = ["repo", "path", "commit"]

event_st = st.tuples(
    st.integers(min_value=0, max_value=5),    # key id
    st.sampled_from(["I", "U", "D"]),
    st.integers(min_value=0, max_value=99),   # payload
)


def py_oracle(events):
    """Sequential LWW: the max-lsn event per key decides; D -> absent."""
    last = {}
    for lsn, (k, op, payload) in enumerate(events):
        last[k] = (lsn, op, payload)
    return {
        k: (lsn, payload)
        for k, (lsn, op, payload) in last.items()
        if op != "D"
    }


@given(
    events=st.lists(event_st, min_size=1, max_size=50),
    n_batches=st.integers(min_value=1, max_value=4),
    redeliver=st.integers(min_value=0, max_value=3),
    mode=st.sampled_from(["cow", "mor"]),
)
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_any_stream_any_batching_matches_oracle(spark, events, n_batches, redeliver, mode):
    rows = [
        (lsn, min(lsn * n_batches // len(events), n_batches - 1),
         op, f"r{k}", f"p{k}", f"c{k}", payload)
        for lsn, (k, op, payload) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "lsn long, batch_id long, op string, repo string, path string, commit string, payload long"
    )

    root = tempfile.mkdtemp(prefix="prop_lww_")
    try:
        table = create_cdc_table(root + "/t", KEYS, num_buckets=4)
        applied = []
        for b in sorted(set(r[1] for r in rows)):
            m = merge_apply(spark, table, df.filter(df.batch_id == b), b, mode=mode)
            assert not m.skipped
            applied.append(b)

        # redeliver an already-applied batch: fence must no-op
        rb = applied[redeliver % len(applied)]
        v = table.snapshot().version
        m = merge_apply(spark, table, df.filter(df.batch_id == rb), rb, mode=mode)
        assert m.skipped and table.snapshot().version == v

        got = {
            (r["repo"], r["path"], r["commit"]): (r["lsn"], r["payload"])
            for r in read_state(spark, table).collect()
        }
        want = {(f"r{k}", f"p{k}", f"c{k}"): v for k, v in py_oracle(events).items()}
        assert got == want
    finally:
        shutil.rmtree(root, ignore_errors=True)


@given(
    events=st.lists(event_st, min_size=1, max_size=40),
    n_batches=st.integers(min_value=2, max_value=4),
    maint_after=st.integers(min_value=0, max_value=3),
    maintenance=st.sampled_from(["rebucket_up", "rebucket_down", "compact", "vacuum"]),
    mode=st.sampled_from(["cow", "mor"]),
)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_maintenance_interleaved_anywhere_preserves_semantics(
    spark, events, n_batches, maint_after, maintenance, mode
):
    """Rebucket / compaction / vacuum injected between ANY two batches of
    ANY stream must leave the final state equal to the sequential LWW
    oracle, keep the fence intact, and keep later merges correct."""
    from docetl_spark.cdc import compact_state

    rows = [
        (lsn, min(lsn * n_batches // len(events), n_batches - 1),
         op, f"r{k}", f"p{k}", f"c{k}", payload)
        for lsn, (k, op, payload) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "lsn long, batch_id long, op string, repo string, path string, commit string, payload long"
    )
    batches = sorted(set(r[1] for r in rows))

    root = tempfile.mkdtemp(prefix="prop_maint_")
    try:
        table = create_cdc_table(root + "/t", KEYS, num_buckets=4)
        maint_point = batches[maint_after % len(batches)]
        for b in batches:
            merge_apply(spark, table, df.filter(df.batch_id == b), b, mode=mode)
            if b == maint_point:
                if maintenance == "rebucket_up":
                    table.rebucket(spark, 8)
                elif maintenance == "rebucket_down":
                    table.rebucket(spark, 2)
                elif maintenance == "compact":
                    compact_state(spark, table)
                else:
                    table.vacuum(keep_versions=1)
                # fence survives maintenance: redeliver -> no-op
                m = merge_apply(spark, table, df.filter(df.batch_id == b), b, mode=mode)
                assert m.skipped

        got = {
            (r["repo"], r["path"], r["commit"]): (r["lsn"], r["payload"])
            for r in read_state(spark, table).collect()
        }
        want = {(f"r{k}", f"p{k}", f"c{k}"): v for k, v in py_oracle(events).items()}
        assert got == want
    finally:
        shutil.rmtree(root, ignore_errors=True)


@given(
    events=st.lists(event_st, min_size=1, max_size=50),
    n_batches=st.integers(min_value=2, max_value=6),
    group=st.integers(min_value=1, max_value=4),
    prefix=st.integers(min_value=0, max_value=3),
    mode=st.sampled_from(["cow", "mor"]),
)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_coalesced_replay_any_grouping_matches_oracle(
    spark, events, n_batches, group, prefix, mode
):
    """replay_events(coalesce_batches=N) for ANY stream, ANY group size,
    and ANY already-applied prefix (applied UNgrouped, resumed grouped)
    must equal the sequential LWW oracle — the associativity claim,
    fuzzed."""
    from pyspark.sql import functions as F

    from docetl_spark.cdc import replay_events

    rows = [
        (lsn, min(lsn * n_batches // len(events), n_batches - 1),
         op, f"r{k}", f"p{k}", f"c{k}", payload)
        for lsn, (k, op, payload) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "lsn long, batch_id long, op string, repo string, path string, commit string, payload long"
    )
    batches = sorted(set(r[1] for r in rows))

    root = tempfile.mkdtemp(prefix="prop_coal_")
    try:
        table = create_cdc_table(root + "/t", KEYS, num_buckets=4)
        # apply an arbitrary prefix sequentially (ungrouped)...
        cut = batches[: prefix % len(batches)]
        if cut:
            replay_events(spark, table, df.filter(F.col("batch_id").isin(cut)))
            # maintenance between the prefix and the coalesced resume:
            # compaction must not disturb the fence or the group merge
            from docetl_spark.cdc import compact_state

            compact_state(spark, table)
        # ...then resume the remainder coalesced
        metrics = replay_events(spark, table, df, coalesce_batches=group)
        assert all(not m.skipped for m in metrics)
        # fence = last batch id; full re-replay is a no-op
        assert replay_events(spark, table, df, coalesce_batches=group) == []

        got = {
            (r["repo"], r["path"], r["commit"]): (r["lsn"], r["payload"])
            for r in read_state(spark, table).collect()
        }
        want = {(f"r{k}", f"p{k}", f"c{k}"): v for k, v in py_oracle(events).items()}
        assert got == want
    finally:
        shutil.rmtree(root, ignore_errors=True)


@given(
    events=st.lists(event_st, min_size=1, max_size=40),
    n_batches=st.integers(min_value=2, max_value=4),
    x_types=st.lists(st.sampled_from(["int", "long", "float", "double"]), min_size=4, max_size=4),
    extra_mask=st.lists(st.booleans(), min_size=4, max_size=4),
    mode=st.sampled_from(["cow", "mor"]),
)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_in_flight_schema_evolution_any_stream(
    spark, events, n_batches, x_types, extra_mask, mode
):
    """North-rule pillar fuzzed: each batch ships its OWN payload schema —
    column `x` with a per-batch type from the widening chain
    (int/long/double in any order) and column `extra` present only in
    some batches. The evolved table must read every key's winning values
    through the final widened schema, with `extra` null unless the
    WINNING event's batch carried it."""
    rows = [
        (lsn, min(lsn * n_batches // len(events), n_batches - 1),
         op, f"r{k}", f"p{k}", f"c{k}", payload)
        for lsn, (k, op, payload) in enumerate(events)
    ]
    batches = sorted(set(r[1] for r in rows))

    root = tempfile.mkdtemp(prefix="prop_evo_")
    try:
        table = create_cdc_table(root + "/t", KEYS, num_buckets=4)
        for b in batches:
            t = x_types[b]
            # float batches pin the FLOAT->DOUBLE metadata-only evolution
            # (probed OK on this Spark build's vectorized reader — top-level
            # and nested — unlike long->double, which needs the rewrite);
            # payloads 0-99 are exact in float32 so values stay comparable
            if t == "double":
                xval = lambda p: p + 0.5
            elif t == "float":
                xval = lambda p: float(p)
            else:
                xval = lambda p: p
            brows = [
                ((lsn, op, r_, p_, c_, xval(payload), payload * 10)
                 if extra_mask[b] else (lsn, op, r_, p_, c_, xval(payload)))
                for (lsn, bb, op, r_, p_, c_, payload) in rows if bb == b
            ]
            schema = f"lsn long, op string, repo string, path string, commit string, x {t}"
            if extra_mask[b]:
                schema += ", extra long"
            bdf = spark.createDataFrame(brows, schema)
            m = merge_apply(spark, table, bdf, b, mode=mode)
            assert not m.skipped
        state = read_state(spark, table)
        has_extra = any(extra_mask[b] for b in batches)
        assert ("extra" in state.columns) == has_extra
        got = {
            (r["repo"], r["path"], r["commit"]):
                (r["lsn"], float(r["x"]), r["extra"] if has_extra else None)
            for r in state.collect()
        }
        want = {}
        last = {}
        for lsn, (k, op, payload) in enumerate(events):
            last[k] = (lsn, op, payload)
        for k, (lsn, op, payload) in last.items():
            if op == "D":
                continue
            b = min(lsn * n_batches // len(events), n_batches - 1)
            x = payload + 0.5 if x_types[b] == "double" else float(payload)
            extra = payload * 10 if extra_mask[b] else None
            want[(f"r{k}", f"p{k}", f"c{k}")] = (lsn, x, extra)
        assert got == want
    finally:
        shutil.rmtree(root, ignore_errors=True)
