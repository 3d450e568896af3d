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
