"""Streaming stateful fold: scratchpad carried across microbatches
(reference reduce.py:631-699 recast onto applyInPandasWithState)."""

import os

import pandas as pd
from pyspark.sql import functions as F

from docetl_spark.streaming.stateful import stateful_fold


def test_scratchpad_carries_across_microbatches(spark, tmp_path):
    # two WAL segments -> two microbatches (maxFilesPerTrigger=1)
    wal = str(tmp_path / "wal")
    os.makedirs(wal)
    seg1 = pd.DataFrame({"lsn": [0, 1, 2, 3], "user": ["a", "a", "b", "a"], "v": [1, 2, 3, 4]})
    seg2 = pd.DataFrame({"lsn": [4, 5], "user": ["a", "b"], "v": [10, 20]})
    seg1.to_parquet(os.path.join(wal, "seg-0.parquet"), index=False)

    stream = spark.readStream.schema("lsn long, user string, v long").option(
        "maxFilesPerTrigger", 1
    ).parquet(wal)

    def fold(state, pdf: pd.DataFrame) -> dict:
        return {
            "total": int(state.get("total") or 0) + int(pdf["v"].sum()),
            "n": int(state.get("n") or 0) + len(pdf),
            "last_lsn": int(pdf["lsn"].iloc[-1]),
        }

    out = stateful_fold(stream, ["user"], fold, "total long, n long, last_lsn long")
    sink = str(tmp_path / "sink")

    q = out.writeStream.format("memory").queryName("fold_sink").outputMode("update").option(
        "checkpointLocation", str(tmp_path / "ckpt")
    ).start()
    try:
        q.processAllAvailable()
        seg2.to_parquet(os.path.join(wal, "seg-1.parquet"), index=False)
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.sql("select * from fold_sink").collect()
    # last update per user carries the cumulative scratchpad
    last = {}
    for r in rows:
        if r["user"] not in last or r["last_lsn"] > last[r["user"]]["last_lsn"]:
            last[r["user"]] = r
    assert last["a"]["total"] == 1 + 2 + 4 + 10 and last["a"]["n"] == 4
    assert last["b"]["total"] == 3 + 20 and last["b"]["n"] == 2
