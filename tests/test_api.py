"""Fluent API tests (reference: pandas accessor, docetl/apis/pd_accessors.py;
its tests: tests/test_pandas_accessors.py)."""

import os

from docetl_spark.api import ops

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def _docs(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))


def test_fluent_chain_filter_map_agg(spark):
    o = (
        ops(_docs(spark))
        .filter("n_chars > 64")
        .map(fp="md5(lower(text))", n2="n_chars * 2")
        .agg("lang", n_docs="count(1)", max2="max(n2)")
    )
    rows = {r["lang"]: r for r in o.df.collect()}
    want = _docs(spark).filter("n_chars > 64").groupBy("lang").count().collect()
    for r in want:
        assert rows[r["lang"]]["n_docs"] == r["count"]
    assert [h["op"] for h in o.history] == ["filter", "map", "agg"]


def test_fluent_split_and_merge(spark):
    docs = ops(_docs(spark).select("doc_id", "text", "lang")).filter("doc_id < 10")
    chunks = docs.split(split_key="text", method="token_count", num_tokens=40, name="sp")
    assert "text_chunk" in chunks.df.columns
    assert chunks.df.count() >= docs.df.count()

    from pyspark.sql import functions as F
    langs = _docs(spark).select(F.col("lang").alias("lang_r")).distinct()
    joined = docs.merge(langs, condition=F.expr("lang = lang_r"))
    assert joined.df.count() == docs.df.count()


def test_fluent_map_batches(spark):
    import pandas as pd

    def enrich(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf[["doc_id"]].copy()
        pdf["flag"] = pdf["doc_id"] % 2 == 0
        return pdf

    o = ops(_docs(spark)).map_batches(enrich, schema="doc_id long, flag boolean")
    got = {r["doc_id"]: r["flag"] for r in o.df.filter("doc_id < 6").collect()}
    assert got == {i: i % 2 == 0 for i in range(6)}


def test_accessor_parse_fanout(spark):
    from docetl_spark.api import ops

    df = spark.createDataFrame([("a\nb\nc",), ("x\ny",)], "text string")
    out = ops(df).parse([{"function": "split_lines", "input_key": "text", "output_key": "line"}])
    assert out.df.count() == 5
    assert out.history[-1]["op"] == "parse"
