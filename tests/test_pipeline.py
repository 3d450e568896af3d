"""YAML pipeline runner tests (reference lifecycle: docetl/runner.py;
checkpoint-prefix-hash reuse: runner.py:264-286, :546-663)."""

import os

import yaml

from docetl_spark.plans import Pipeline

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def _write(tmp_path, cfg):
    p = str(tmp_path / "pipeline.yaml")
    with open(p, "w") as f:
        yaml.safe_dump(cfg, f)
    return p


def test_pipeline_filter_map_reduce(spark, tmp_path):
    cfg = {
        "datasets": {"docs": {"path": os.path.join(SF_DIR, "documents.parquet")}},
        "steps": [
            {
                "name": "clean",
                "input": "docs",
                "operations": [
                    {"op": "filter", "where": "n_chars > 64"},
                    {"op": "map", "expr": {"fp": "md5(lower(text))"}},
                    {"op": "reduce", "reduce_key": "lang", "aggs": {
                        "n_docs": "count(1)", "avg_chars": "round(avg(n_chars), 2)"}},
                ],
            }
        ],
        "output": {"path": str(tmp_path / "out"), "format": "parquet"},
    }
    out = Pipeline.from_yaml(_write(tmp_path, cfg)).save(spark)
    rows = {r["lang"]: r for r in out.collect()}
    # oracle via direct DataFrame ops
    want = (
        spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        .filter("n_chars > 64").groupBy("lang").count()
    )
    for r in want.collect():
        assert rows[r["lang"]]["n_docs"] == r["count"]
    assert os.path.isdir(str(tmp_path / "out"))


def test_pipeline_steps_chain_and_split(spark, tmp_path):
    cfg = {
        "datasets": {"docs": {"path": os.path.join(SF_DIR, "documents.parquet")}},
        "steps": [
            {"name": "s1", "input": "docs", "operations": [
                {"op": "filter", "where": "doc_id < 20"},
            ]},
            {"name": "s2", "input": "s1", "operations": [
                {"op": "split", "split_key": "text", "method": "token_count",
                 "num_tokens": 30, "name": "sp"},
            ]},
        ],
    }
    out = Pipeline.from_yaml(_write(tmp_path, cfg)).run(spark)
    assert "text_chunk" in out.columns and "sp_chunk_num" in out.columns
    assert out.count() >= 20


def test_pipeline_checkpoint_reuse_and_invalidation(spark, tmp_path):
    inter = str(tmp_path / "inter")
    cfg = {
        "datasets": {"docs": {"path": os.path.join(SF_DIR, "documents.parquet")}},
        "steps": [
            {"name": "s1", "input": "docs", "operations": [
                {"op": "filter", "where": "doc_id < 50"}]},
        ],
    }
    p = Pipeline.from_yaml(_write(tmp_path, cfg), intermediate_dir=inter)
    n1 = p.run(spark).count()
    ckpts = os.listdir(inter)
    assert len(ckpts) == 1

    # same config -> same checkpoint dir reused (no new dir)
    p2 = Pipeline.from_yaml(_write(tmp_path, cfg), intermediate_dir=inter)
    assert p2.run(spark).count() == n1
    assert os.listdir(inter) == ckpts

    # changed upstream config -> new hash -> new checkpoint
    cfg["steps"][0]["operations"][0]["where"] = "doc_id < 10"
    p3 = Pipeline.from_yaml(_write(tmp_path, cfg), intermediate_dir=inter)
    assert p3.run(spark).count() < n1
    assert len(os.listdir(inter)) == 2


def test_pipeline_observe_records_selectivity(spark, tmp_path):
    cfg = {
        "datasets": {"docs": {"path": os.path.join(SF_DIR, "documents.parquet")}},
        "steps": [
            {"name": "s1", "input": "docs", "operations": [
                {"op": "filter", "where": "doc_id < 30"}]},
            {"name": "s2", "input": "s1", "operations": [
                {"op": "filter", "where": "doc_id < 10"}]},
        ],
    }
    p = Pipeline.from_yaml(_write(tmp_path, cfg))
    p.observe = True
    p.run(spark)
    assert p.metrics["s1"]["rows_out"] == 30
    assert p.metrics["s2"]["rows_out"] == 10


def test_pipeline_rank_cluster_parsing_ops(spark, tmp_path):
    import yaml as _yaml

    from docetl_spark.plans.pipeline import Pipeline

    src = tmp_path / "d.csv"
    src.write_text("id,text\n" + "\n".join(f"{i},word{i} common tail" for i in range(20)) + "\n")
    cfg = {
        "datasets": {"d": {"path": str(src), "format": "csv"}},
        "steps": [
            {"name": "s1", "input": "d", "operations": [
                {"op": "parsing", "tools": [
                    {"function": "split_lines", "input_key": "text", "output_key": "line"}]},
                {"op": "rank", "score": "length(line) + id / 1e9", "k": 5, "name": "r"},
            ]},
        ],
    }
    out = Pipeline(cfg).run(spark)
    rows = out.orderBy("_r_rank").collect()
    assert len(rows) == 5 and rows[0]["_r_rank"] == 1


def test_pipeline_cluster_op(spark):
    from docetl_spark.plans.pipeline import Pipeline

    cfg = {
        "datasets": {},
        "steps": [],
    }
    # drive cluster through _apply_op directly (no file dataset needed)
    from docetl_spark.plans.pipeline import _apply_op

    df = spark.createDataFrame(
        [(i, [float(i % 3) * 10, 0.0]) for i in range(12)], "id long, emb array<double>"
    )
    out = _apply_op(df, {"op": "cluster", "embedding_col": "emb"}, {}, spark)
    rows = out.collect()
    assert len(rows) == 12 and all(len(r["clusters"]) >= 1 for r in rows)


def test_pipeline_extract_line_number_and_rank_likert(spark, tmp_path):
    cfg = {
        "datasets": {"docs": {"path": os.path.join(SF_DIR, "documents.parquet")}},
        "steps": [{
            "name": "s1", "input": "docs", "operations": [
                {"op": "extract", "extraction_method": "line_number",
                 "document_keys": ["text"], "pointer_pattern": "data",
                 "line_width": 60, "name": "ptr"},
                {"op": "rank", "initial_ordering_method": "likert",
                 "rater": "tests.helpers_rank:nchars_rater",
                 "k": 8, "tiebreak_cols": ["doc_id"], "name": "lk"},
            ],
        }],
    }
    out = Pipeline.from_yaml(_write(tmp_path, cfg)).run(spark)
    rows = out.orderBy("_lk_rank").collect()
    assert len(rows) == 8
    assert "text_extracted_ptr" in out.columns
    scores = [r["_lk_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_pipeline_chunked_map_macro(spark, tmp_path):
    """Doc-chunking macro (reference doc_chunking.py:300-428): one
    chunked_map YAML op expands to split -> gather -> [sample] -> map ->
    reduce and runs end-to-end. Without sampling, per-doc totals must
    equal a direct recomputation; with per-group sampling, every source
    doc keeps at most samples_per_group chunks, deterministically."""
    from pyspark.sql import functions as F

    base_cfg = {
        "op": "chunked_map", "name": "kw",
        "split_key": "text", "method": "delimiter",
        "delimiter": " ", "num_splits_to_group": 25,
        "sub_expr": {"rc": "length(text_chunk_rendered)",
                     "n_tok": "size(split(text_chunk, ' '))"},
        "reduce_aggs": {"doc_id": "max(doc_id)", "n_chunks": "count(*)",
                        "total_rc": "sum(rc)"},
    }
    cfg = {
        "datasets": {"docs": {"path": os.path.join(SF_DIR, "documents.parquet")}},
        "steps": [{"name": "s1", "input": "docs", "operations": [
            {"op": "filter", "where": "doc_id < 40"}, dict(base_cfg)]}],
    }
    out = Pipeline.from_yaml(_write(tmp_path, cfg)).run(spark)
    assert set(out.columns) == {"split_kw_id", "doc_id", "n_chunks", "total_rc"}
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 40
    # direct recomputation of chunk counts (split semantics)
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).filter("doc_id < 40")
    want = {
        r["doc_id"]: -(-r["n"] // 25)
        for r in docs.select("doc_id", F.size(F.split("text", " ")).alias("n")).collect()
    }
    for d, r in rows.items():
        assert r["n_chunks"] == max(1, want[d]), d
        assert r["total_rc"] > 0

    # sampling branch: stratified by split id, 2 chunks max per doc
    samp_cfg = dict(base_cfg)
    samp_cfg["sampling"] = {"samples_per_group": 2, "random_state": 7}
    samp_cfg["reduce_aggs"] = {"doc_id": "max(doc_id)", "n_chunks": "count(*)"}
    cfg["steps"][0]["operations"][1] = samp_cfg
    out2 = Pipeline.from_yaml(_write(tmp_path, cfg)).run(spark)
    rows2 = {r["doc_id"]: r["n_chunks"] for r in out2.collect()}
    assert len(rows2) == 40
    for d, n in rows2.items():
        assert 1 <= n <= 2 and n == min(2, rows[d]["n_chunks"]), d
    # deterministic across runs
    out3 = Pipeline.from_yaml(_write(tmp_path, cfg)).run(spark)
    assert {r["doc_id"]: r["n_chunks"] for r in out3.collect()} == rows2


def test_cli_build_and_run(spark, tmp_path, monkeypatch):
    """`cli build` expands chunked_map macros into the optimized YAML
    (docetl build's deterministic residue); the expanded YAML then runs
    identically to the macro form."""
    import subprocess
    import sys

    cfg = {
        "datasets": {"docs": {"path": os.path.join(SF_DIR, "documents.parquet")}},
        "steps": [{"name": "s1", "input": "docs", "operations": [
            {"op": "filter", "where": "doc_id < 10"},
            {"op": "chunked_map", "name": "kw", "split_key": "text",
             "method": "delimiter", "delimiter": " ", "num_splits_to_group": 30,
             "sub_expr": {"rc": "length(text_chunk_rendered)"},
             "reduce_aggs": {"doc_id": "max(doc_id)", "n_chunks": "count(*)"}},
        ]}],
    }
    src = _write(tmp_path, cfg)
    out_yaml = str(tmp_path / "opt.yaml")
    res = subprocess.run(
        [sys.executable, "-m", "docetl_spark.plans.cli", "build", src, "-o", out_yaml],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert res.returncode == 0, res.stderr
    assert "1 macro op(s) expanded" in res.stdout
    with open(out_yaml) as f:
        opt = yaml.safe_load(f)
    ops = opt["steps"][0]["operations"]
    assert [o["op"] for o in ops] == ["filter", "split", "gather", "map", "reduce"]
    assert ops[1]["name"] == "split_kw" and ops[4]["reduce_key"] == "split_kw_id"
    # the expanded plan runs and matches the macro form
    a = Pipeline.from_yaml(src).run(spark).orderBy("doc_id").collect()
    b = Pipeline.from_yaml(out_yaml).run(spark).orderBy("doc_id").collect()
    assert [(r["doc_id"], r["n_chunks"]) for r in a] == [(r["doc_id"], r["n_chunks"]) for r in b]


def test_cli_build_yml_suffix_and_inplace_guard(tmp_path):
    """build on a .yml input must not silently overwrite the source (the
    old .yaml-substring replace was a no-op for .yml)."""
    import subprocess
    import sys

    cfg = {"datasets": {}, "steps": [{"name": "s", "input": "x", "operations": [
        {"op": "filter", "where": "1=1"}]}]}
    src = str(tmp_path / "p.yml")
    with open(src, "w") as f:
        yaml.safe_dump(cfg, f)
    before = open(src).read()
    res = subprocess.run(
        [sys.executable, "-m", "docetl_spark.plans.cli", "build", src],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert res.returncode == 0, res.stderr
    assert open(src).read() == before  # source untouched
    assert os.path.exists(str(tmp_path / "p_opt.yml"))
    # explicit -o back onto the source refuses
    res2 = subprocess.run(
        [sys.executable, "-m", "docetl_spark.plans.cli", "build", src, "-o", src],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert res2.returncode != 0
    assert "refusing to overwrite" in (res2.stderr + res2.stdout)


def test_chunked_topk_macro_expansion_and_run(spark, tmp_path):
    """doc_chunking_topk macro (reference doc_chunking_topk.py:448-585):
    Map => split -> topk -> reduce with the reference's naming and the
    topk stratified on the split doc id; the filter flavor appends
    code_filter_{target}. Runs end-to-end: every doc keeps at most k
    chunks and the per-doc best score matches a direct recomputation."""
    from pyspark.sql import functions as F

    from docetl_spark.plans.macros import expand_macros

    macro = {
        "op": "chunked_topk", "name": "liab",
        "split_key": "text", "method": "delimiter",
        "delimiter": " ", "num_splits_to_group": 30,
        "topk_config": {"method": "fts", "k": 2, "query": "data quality",
                        "tiebreak_cols": ["doc_id", "split_liab_chunk_num"]},
        "reduce_aggs": {"doc_id": "max(doc_id)",
                        "n_kept": "count(*)",
                        "best_score": "round(max(_topk_liab_chunks_score), 6)"},
    }
    ops = expand_macros([macro])
    assert [o["op"] for o in ops] == ["split", "topk", "reduce"]
    assert ops[0]["name"] == "split_liab"
    assert ops[1]["name"] == "topk_liab_chunks"
    assert ops[1]["stratify_key"] == "split_liab_id"
    assert ops[2]["reduce_key"] == "split_liab_id"

    # filter flavor appends the boolean code_filter (reference :563-578)
    fops = expand_macros([{**macro, "is_filter": True, "bool_expr": "best_score > 0"}])
    assert [o["op"] for o in fops] == ["split", "topk", "reduce", "filter"]
    assert fops[3]["name"] == "code_filter_liab"

    cfg = {
        "datasets": {"docs": {"path": os.path.join(SF_DIR, "documents.parquet")}},
        "steps": [{"name": "s1", "input": "docs", "operations": [
            {"op": "filter", "where": "doc_id < 30"}, macro]}],
    }
    out = Pipeline.from_yaml(_write(tmp_path, cfg)).run(spark)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 30
    assert all(1 <= r["n_kept"] <= 2 for r in rows.values())


def test_cascade_filter_identical_state_and_selectivity(spark, tmp_path):
    """cascade_filter macro (reference cascade_filtering.py:347-390):
    code pre-filters first, llm pre-filters SORTED BY PREDICATE LENGTH,
    then the original filter — final state identical to the uncascaded
    filter, with per-stage observed selectivity recorded for the audit."""
    from docetl_spark.plans.macros import cascade_filtering, expand_macros

    ops = cascade_filtering(
        "keep_en_data",
        where="n_chars >= 400 AND lang = 'en' AND contains(text, 'data')",
        code_pre_filters=[{"name": "len_gate", "where": "n_chars >= 400"}],
        llm_pre_filters=[
            {"name": "mentions_data", "where": "contains(text, 'data')"},
            {"name": "is_en", "where": "lang = 'en'"},
        ],
    )
    # llm filters re-ordered shortest predicate first (:368-371)
    assert [o["name"] for o in ops] == [
        "len_gate_keep_en_data", "is_en_keep_en_data",
        "mentions_data_keep_en_data", "keep_en_data"]
    assert all(o["observe"] for o in ops)

    macro_cfg = {
        "op": "cascade_filter", "name": "keep_en_data",
        "where": "n_chars >= 400 AND lang = 'en' AND contains(text, 'data')",
        "code_pre_filters": [{"name": "len_gate", "where": "n_chars >= 400"}],
        "llm_pre_filters": [
            {"name": "mentions_data", "where": "contains(text, 'data')"},
            {"name": "is_en", "where": "lang = 'en'"}],
    }
    assert [o["name"] for o in expand_macros([macro_cfg])] == [o["name"] for o in ops]

    cfg = {
        "datasets": {"docs": {"path": os.path.join(SF_DIR, "documents.parquet")}},
        "steps": [{"name": "s1", "input": "docs", "operations": [macro_cfg]}],
    }
    p = Pipeline.from_yaml(_write(tmp_path, cfg))
    got = sorted(r["doc_id"] for r in p.run(spark).select("doc_id").collect())
    want = sorted(
        r["doc_id"] for r in spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        .filter("n_chars >= 400 AND lang = 'en' AND contains(text, 'data')")
        .select("doc_id").collect()
    )
    assert got == want  # cascade changes cost, never the final state

    sel = p.observed_selectivity()
    names = [o["name"] for o in ops]
    assert set(names) <= set(sel)
    # each stage sees at most what the previous one kept
    for a, b in zip(names, names[1:]):
        assert sel[b]["rows_in"] == sel[a]["rows_kept"]
    # the final (expensive) filter ran on a strict subset of the input
    assert sel[names[-1]]["rows_in"] < sel[names[0]]["rows_in"]


def test_hierarchical_reduce_macro(spark, tmp_path):
    """hierarchical_reduce macro (reference hierarchical_reduce.py:
    224-289): Reduce => [Map ->] Reduce(k1+k2) -> Reduce(k1). Algebraic
    rollup totals must equal the direct one-level reduce."""
    from docetl_spark.plans.macros import expand_macros, hierarchical_reduce

    ops = hierarchical_reduce(
        "events_by_user",
        reduce_key="user_id", additional_key="event_type",
        aggs_fine={"n": "count(*)", "v": "round(sum(value), 4)"},
        aggs_rollup={"n_events": "sum(n)", "n_types": "count(*)",
                     "best_type_v": "round(max(v), 4)"},
        map_expr={"event_type": "upper(event_type)"},
    )
    assert [o["op"] for o in ops] == ["map", "reduce", "reduce"]
    assert ops[1]["name"] == "events_by_user_by_event_type"
    assert ops[1]["reduce_key"] == ["user_id", "event_type"]
    assert ops[2]["reduce_key"] == "user_id"

    macro_cfg = {
        "op": "hierarchical_reduce", "name": "events_by_user",
        "reduce_key": "user_id", "additional_key": "event_type",
        "aggs_fine": {"n": "count(*)", "v": "round(sum(value), 4)"},
        "aggs_rollup": {"n_events": "sum(n)", "n_types": "count(*)",
                        "best_type_v": "round(max(v), 4)"},
    }
    assert [o["op"] for o in expand_macros([macro_cfg])] == ["reduce", "reduce"]

    cfg = {
        "datasets": {"events": {"path": os.path.join(SF_DIR, "events.parquet")}},
        "steps": [{"name": "s1", "input": "events", "operations": [macro_cfg]}],
    }
    out = Pipeline.from_yaml(_write(tmp_path, cfg)).run(spark)
    got = {r["user_id"]: r["n_events"] for r in out.collect()}
    want = {
        r["user_id"]: r["n"] for r in
        spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
        .groupBy("user_id").count().withColumnRenamed("count", "n").collect()
    }
    assert got == want


def test_observed_selectivity_nonblocking_before_action(spark, tmp_path):
    # observed_selectivity must PEEK, not block: on a lazy (never
    # materialized) observed pipeline it returns {} instead of hanging
    # the driver inside Observation.get
    cfg = {
        "datasets": {"docs": {"path": os.path.join(SF_DIR, "documents.parquet")}},
        "steps": [{"name": "s1", "input": "docs", "operations": [
            {"op": "filter", "name": "f1", "where": "n_chars >= 400",
             "observe": True},
        ]}],
    }
    p = Pipeline.from_yaml(_write(tmp_path, cfg))
    df = p.run(spark)          # lazy — no action yet
    assert p.observed_selectivity() == {}
    df.count()                 # first action lands the metrics
    sel = p.observed_selectivity()
    assert sel["f1"]["rows_in"] > 0


def test_chunked_map_backcompat_default_name(spark):
    # an UNNAMED chunked_map keeps its pre-r5 default target name "map"
    # (split_map / reduce_map columns); the r5 macros default to "op"
    from docetl_spark.plans.macros import expand_macros

    ops = expand_macros([{
        "op": "chunked_map", "split_key": "text",
        "sub_expr": {"n": "length(text_chunk)"}, "reduce_aggs": {"m": "max(n)"},
    }])
    assert ops[0]["name"] == "split_map"
    assert any(o.get("name") == "reduce_map" for o in ops)


def test_split_assume_distinct_plumbed(spark):
    # YAML split op and both chunking macros forward assume_distinct so
    # pipelines can use the single-pass (no duplicate-probe) split path
    from docetl_spark.plans.macros import doc_chunking, doc_chunking_topk

    ops = doc_chunking(
        "m", split_key="text", sub_expr={"n": "1"}, reduce_aggs={"s": "sum(n)"},
        assume_distinct=True,
    )
    assert ops[0]["op"] == "split" and ops[0]["assume_distinct"] is True
    ops2 = doc_chunking_topk(
        "m", split_key="text",
        topk_config={"method": "fts_simple", "k": 2, "query": "dup"},
        reduce_aggs={"s": "count(1)"}, assume_distinct=True,
    )
    assert ops2[0]["op"] == "split" and ops2[0]["assume_distinct"] is True


def test_observed_selectivity_reports_emptied_stages(spark, tmp_path):
    """A landed observation with rows_in == 0 (an upstream filter emptied
    the frame) must appear in the audit — that zero IS the over-pruning
    signal the audit exists to surface — distinct from 'never ran'."""
    cfg = {
        "datasets": {"docs": {"path": os.path.join(SF_DIR, "documents.parquet")}},
        "steps": [{"name": "s1", "input": "docs", "operations": [
            {"op": "filter", "name": "kill_all", "where": "n_chars < 0",
             "observe": True},
            {"op": "filter", "name": "downstream", "where": "lang = 'en'",
             "observe": True},
        ]}],
    }
    p = Pipeline.from_yaml(_write(tmp_path, cfg))
    assert p.run(spark).count() == 0
    sel = p.observed_selectivity()
    assert sel["kill_all"]["rows_in"] > 0 and sel["kill_all"]["rows_kept"] == 0
    assert sel["downstream"] == {"rows_in": 0, "rows_kept": 0, "selectivity": None}
