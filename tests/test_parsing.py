"""Parsing-tool fan-out (reference dataset.py:241-315 + parsing_tools.py;
mirrors tests/basic/test_pipeline_with_parsing.py's shape: a dataset of
file paths parses into text rows, then flows through the pipeline)."""

import os

import pytest

from docetl_spark.sources.parsing import PARSERS, apply_parsing, get_parser


@pytest.fixture()
def txt_files(tmp_path):
    paths = []
    for i in range(4):
        p = tmp_path / f"doc{i}.txt"
        p.write_text(f"file {i} body\n\nsecond paragraph {i}")
        paths.append(str(p))
    return paths


def test_txt_parse_then_fanout(spark, txt_files):
    df = spark.createDataFrame([(p, i) for i, p in enumerate(txt_files)], "path string, src long")
    out = apply_parsing(df, [
        {"function": "txt_to_string", "input_key": "path", "output_key": "text"},
        {"function": "split_paragraphs", "input_key": "text", "output_key": "para"},
    ])
    rows = out.collect()
    # 4 files x 2 paragraphs, original columns carried through (item.copy | res)
    assert len(rows) == 8
    assert {r["src"] for r in rows} == {0, 1, 2, 3}
    assert all(r["path"].endswith(".txt") and r["text"] and r["para"] for r in rows)


def test_jsonl_fanout(spark, tmp_path):
    p = tmp_path / "w.jsonl"
    p.write_text('{"a": 1}\n\n{"a": 2}\n{"a": 3}\n')
    df = spark.createDataFrame([(str(p),)], "path string")
    out = apply_parsing(df, [{"function": "jsonl_to_rows", "input_key": "path"}])
    assert out.count() == 3  # blank line skipped


def test_user_defined_tool_and_kwargs(spark):
    df = spark.createDataFrame([("a-b-c",)], "text string")

    def dash_split(item, input_key="text", output_key="piece", sep="-"):
        return [{output_key: x} for x in item[input_key].split(sep)]

    out = apply_parsing(df, [{"function": "dash_split", "output_key": "piece"}],
                        user_tools={"dash_split": dash_split})
    assert sorted(r["piece"] for r in out.collect()) == ["a", "b", "c"]


def test_codec_stubs_raise_not_implemented():
    for name in ("docx_to_string", "xlsx_to_string", "pptx_to_string", "whisper_speech_to_text"):
        with pytest.raises((NotImplementedError,)):
            PARSERS[name]({"path": "/nonexistent"})
    with pytest.raises(ValueError, match="not found"):
        get_parser("no_such_tool")


def test_pipeline_dataset_parsing_config(spark, tmp_path, txt_files):
    import yaml

    from docetl_spark.plans.pipeline import Pipeline

    cfg = {
        "datasets": {
            "files": {
                "path": str(tmp_path / "files.csv"),
                "format": "csv",
                "parsing": [
                    {"function": "txt_to_string", "input_key": "path", "output_key": "text"},
                    {"function": "split_paragraphs", "input_key": "text", "output_key": "para"},
                ],
            }
        },
        "steps": [
            {"name": "load", "input": "files",
             "operations": [{"op": "map", "expr": {"n_chars": "length(para)"}}]}
        ],
    }
    (tmp_path / "files.csv").write_text("path\n" + "\n".join(txt_files) + "\n")
    out = Pipeline(cfg).run(spark)
    rows = out.collect()
    assert len(rows) == 8 and all(r["n_chars"] > 0 for r in rows)


def test_parser_overwriting_typed_column_keeps_type(spark):
    # a parser whose output_key collides with an existing non-string
    # column must not silently retype it to string (review finding r2)
    df = spark.createDataFrame([(1, 5), (2, 7)], "id long, n long")

    def bump(item, input_key="n", output_key="n"):
        return [{output_key: item[input_key] + 1}]

    out = apply_parsing(df, [{"function": "bump", "output_key": "n"}], user_tools={"bump": bump})
    assert dict(out.dtypes)["n"] == "bigint"
    assert sorted(r["n"] for r in out.collect()) == [6, 8]
    # explicit override still works
    out2 = apply_parsing(
        df, [{"function": "bump", "output_key": "n", "output_schema": {"n": "double"}}],
        user_tools={"bump": lambda item, input_key="n", output_key="n": [{output_key: float(item[input_key])}]},
    )
    assert dict(out2.dtypes)["n"] == "double"
