"""Stage middleware: cache (reference cache.py:86-105) and per-task rate
limiting (ratelimiter.py) around vectorized batch transforms."""

import os
import time

import pandas as pd

from docetl_spark.cdc.middleware import as_stage, cached, rate_limited

# defined per-test as local closures so cloudpickle ships them by value
# to executors (a module-level fn in a test file isn't importable there)
def _make_fn():
    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf[["doc_id"]].copy()
        out["out"] = pdf["doc_id"] * 2
        return out

    return fn


def test_cached_skips_recompute(spark, tmp_path, sf_dir):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select("doc_id").limit(50)
    fn = cached(_make_fn(), str(tmp_path / "cache"), config_key="x2")
    stage = as_stage(fn, "doc_id long, out long")

    first = sorted(r["out"] for r in stage(docs).collect())
    # cache dir now holds one entry per arrow batch
    n_entries = len(os.listdir(str(tmp_path / "cache")))
    assert n_entries >= 1
    second = sorted(r["out"] for r in stage(docs).collect())
    assert first == second
    # second run served from cache: no new entries
    assert len(os.listdir(str(tmp_path / "cache"))) == n_entries


def test_cached_config_key_separates_results(tmp_path):
    pdf = pd.DataFrame({"doc_id": [1, 2]})
    a = cached(_make_fn(), str(tmp_path / "c"), config_key="a")
    b = cached(_make_fn(), str(tmp_path / "c"), config_key="b")
    a(pdf), b(pdf)
    assert len(os.listdir(str(tmp_path / "c"))) == 2


def test_rate_limited_throttles():
    fn = rate_limited(lambda pdf: pdf, rows_per_sec=1000.0)
    pdf = pd.DataFrame({"x": range(500)})
    t0 = time.monotonic()
    fn(pdf)  # no wait for the first batch
    fn(pdf)  # must wait ~0.5s (500 rows / 1000 rps debt)
    assert time.monotonic() - t0 >= 0.45


# -- validation-retry + gleaning (reference api.py:307-510) -------------------


def test_validated_retries_until_pass():
    # fn succeeds only when it sees _retry_attempt >= 1 (the engine's
    # feedback channel): first pass fails the rule, retry fixes it
    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        attempt = pdf["_retry_attempt"] if "_retry_attempt" in pdf.columns else pd.Series(0, index=pdf.index)
        out = pdf[["doc_id"]].copy()
        out["val"] = pdf["doc_id"].where(attempt.to_numpy() >= 1, -1)
        return out

    from docetl_spark.cdc.middleware import validated

    wrapped = validated(fn, rule=lambda out: out["val"] >= 0, num_retries=2)
    got = wrapped(pd.DataFrame({"doc_id": [1, 2, 3]}))
    assert got["val"].tolist() == [1, 2, 3]


def test_validated_round_cap_and_on_fail():
    from docetl_spark.cdc.middleware import validated

    calls = {"n": 0}

    def always_bad(pdf: pd.DataFrame) -> pd.DataFrame:
        calls["n"] += 1
        out = pdf[["doc_id"]].copy()
        out["val"] = -1
        return out

    rule = lambda out: out["val"] >= 0  # noqa: E731
    kept = validated(always_bad, rule, num_retries=2, on_fail="keep")(pd.DataFrame({"doc_id": [1]}))
    assert kept["val"].tolist() == [-1] and calls["n"] == 3  # 1 + 2 retries (round cap)

    dropped = validated(always_bad, rule, num_retries=1, on_fail="drop")(pd.DataFrame({"doc_id": [1]}))
    assert len(dropped) == 0

    import pytest as _pytest

    with _pytest.raises(ValueError, match="failed validation"):
        validated(always_bad, rule, num_retries=0, on_fail="raise")(pd.DataFrame({"doc_id": [1]}))


def test_validated_only_failing_rows_retry():
    from docetl_spark.cdc.middleware import validated

    seen = []

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        seen.append(sorted(pdf["doc_id"].tolist()))
        out = pdf[["doc_id"]].copy()
        if "_retry_attempt" in pdf.columns:
            out["val"] = pdf["doc_id"]  # retry fixes
        else:
            out["val"] = pdf["doc_id"].where(pdf["doc_id"] % 2 == 0, -1)
        return out

    got = validated(fn, rule=lambda o: o["val"] >= 0, num_retries=1)(pd.DataFrame({"doc_id": [1, 2, 3, 4]}))
    assert got["val"].tolist() == [1, 2, 3, 4]
    assert seen == [[1, 2, 3, 4], [1, 3]]  # only odd (failing) rows re-ran


def test_gleaned_refine_rounds_and_early_exit():
    from docetl_spark.cdc.middleware import gleaned

    rounds_seen = []

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf[["doc_id"]].copy()
        out["score"] = 0.0
        return out

    def judge(out: pd.DataFrame) -> pd.Series:
        return out["score"] < 1.0  # refine until score reaches 1

    def refine(src: pd.DataFrame, cur: pd.DataFrame, rnd: int) -> pd.DataFrame:
        rounds_seen.append((rnd, len(cur)))
        out = cur.copy()
        out["score"] = out["score"] + 0.5
        return out

    got = gleaned(fn, judge, refine, num_rounds=5)(pd.DataFrame({"doc_id": [1, 2]}))
    assert got["score"].tolist() == [1.0, 1.0]
    # 2 refine rounds then early exit (judge satisfied), never 5
    assert rounds_seen == [(0, 2), (1, 2)]


def test_gleaned_composes_with_cache(tmp_path):
    from docetl_spark.cdc.middleware import cached, gleaned

    work = {"fn": 0, "refine": 0}

    def fn(pdf):
        work["fn"] += 1
        out = pdf[["doc_id"]].copy()
        out["score"] = 0.0
        return out

    def refine(src, cur, rnd):
        work["refine"] += 1
        out = cur.copy()
        out["score"] = 1.0
        return out

    pipeline = cached(gleaned(fn, lambda o: o["score"] < 1.0, refine, num_rounds=2),
                      str(tmp_path / "c"), config_key="glean")
    pdf = pd.DataFrame({"doc_id": [1, 2]})
    a = pipeline(pdf)
    b = pipeline(pdf)  # cache hit: no extra fn/refine work
    assert a.equals(b)
    assert work == {"fn": 1, "refine": 1}


def test_validated_through_spark_stage(spark):
    from docetl_spark.cdc.middleware import as_stage, validated

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        attempt = pdf["_retry_attempt"] if "_retry_attempt" in pdf.columns else pd.Series(0, index=pdf.index)
        out = pdf[["id"]].copy()
        out["ok"] = ((pdf["id"] % 3 != 0) | (attempt.to_numpy() > 0)).astype(bool)
        return out

    stage = as_stage(validated(fn, rule=lambda o: o["ok"], num_retries=1), "id long, ok boolean")
    out = stage(spark.range(30))
    assert out.count() == 30 and out.filter("NOT ok").count() == 0


def test_validated_retry_preserves_dtypes_and_rejects_column_drift():
    # retries assign column-by-column, never through a mixed-dtype ndarray
    # that would upcast output columns to object (ADVICE r2 #4)
    import pytest

    def fn(pdf):
        attempt = pdf["_retry_attempt"].iloc[0] if "_retry_attempt" in pdf.columns else 0
        return pd.DataFrame({
            "n": pdf["x"].astype("int64") + (100 if attempt else 0),
            "s": ["ok" if attempt else "bad"] * len(pdf),
        })

    wrapped = __import__("docetl_spark.cdc.middleware", fromlist=["validated"]).validated(
        fn, rule=lambda out: out["s"] == "ok", num_retries=2
    )
    out = wrapped(pd.DataFrame({"x": [1, 2, 3]}))
    assert str(out["n"].dtype) == "int64"  # not object
    assert list(out["n"]) == [101, 102, 103]
    assert list(out["s"]) == ["ok", "ok", "ok"]

    def drifting(pdf):
        if "_retry_attempt" in pdf.columns:
            return pd.DataFrame({"n": pdf["x"], "extra": pdf["x"]})
        return pd.DataFrame({"n": pdf["x"], "s": ["bad"] * len(pdf)})

    wrapped2 = __import__("docetl_spark.cdc.middleware", fromlist=["validated"]).validated(
        drifting, rule=lambda out: out["s"] == "ok", num_retries=1
    )
    with pytest.raises(ValueError, match="changed the output columns"):
        wrapped2(pd.DataFrame({"x": [1]}))


def test_calibrate_improves_config_then_converges():
    # reference map.py:182-253: sample -> improve config -> rebuilt fn
    from docetl_spark.cdc.middleware import calibrate

    def make_fn(cfg):
        def fn(pdf):
            return pd.DataFrame({"y": pdf["x"] * cfg["scale"]})
        return fn

    # improver: nudge scale until sampled outputs average >= 10
    def improve(sin, sout, cfg):
        if sout["y"].mean() < 10:
            return {**cfg, "scale": cfg["scale"] * 2}
        return cfg

    sample = pd.DataFrame({"x": [1.0, 2.0, 3.0]})
    fn, cfg = calibrate(make_fn, {"scale": 1.0}, sample, improve, num_rounds=10)
    assert cfg["scale"] == 8.0  # 2*8=16 mean>=10 at scale 8 (mean x =2 -> 16)
    out = fn(pd.DataFrame({"x": [5.0]}))
    assert list(out["y"]) == [40.0]


def test_observed_system_column(spark):
    """_observability_{name} (reference map.py:415-419): per-row stage
    provenance from the middleware stack, linking rows to the cache key."""
    import json

    from docetl_spark.cdc.middleware import _batch_key, as_stage, observed

    def fn(pdf):
        out = pdf.copy()
        out["out"] = out["doc_id"] * 2
        return out

    stage = as_stage(observed(fn, "enrich", config_key="v1"),
                     "doc_id long, out long, _observability_enrich string")
    df = spark.createDataFrame([(i,) for i in range(5)], "doc_id long")
    rows = stage(df).collect()
    assert len(rows) == 5
    payloads = [json.loads(r["_observability_enrich"]) for r in rows]
    for p in payloads:
        assert p["stage"] == "enrich" and p["config_key"] == "v1"
        assert p["rows_in"] >= 1 and len(p["batch_fingerprint"]) == 64
    # the fingerprint is the cached() key of the input batch: recomputing
    # it over the same single-partition batch matches
    one = df.coalesce(1)
    [row] = stage(one).limit(1).collect()
    got = json.loads(row["_observability_enrich"])["batch_fingerprint"]
    assert got == _batch_key(one.toPandas(), "v1")
