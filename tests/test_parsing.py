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
    with pytest.raises((NotImplementedError,)):
        PARSERS["whisper_speech_to_text"]({"path": "/nonexistent"})
    with pytest.raises(ValueError, match="not found"):
        get_parser("no_such_tool")


# -- OOXML fixture writers (minimal valid zip+XML parts) ----------------------

_W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
_S = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_A = "http://schemas.openxmlformats.org/drawingml/2006/main"
_P = "http://schemas.openxmlformats.org/presentationml/2006/main"
_R = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
_PKR = "http://schemas.openxmlformats.org/package/2006/relationships"


def _make_docx(path):
    import zipfile

    doc = f"""<w:document xmlns:w="{_W}"><w:body>
      <w:p><w:r><w:t>Hello</w:t></w:r><w:r><w:t xml:space="preserve"> world</w:t></w:r></w:p>
      <w:p><w:r><w:t>tab</w:t><w:tab/><w:t>after</w:t><w:br/><w:t>newline</w:t></w:r></w:p>
      <w:p/>
      <w:tbl><w:tr><w:tc><w:p><w:r><w:t>IN TABLE</w:t></w:r></w:p></w:tc></w:tr></w:tbl>
      <w:p><w:r><w:t>last</w:t></w:r></w:p>
    </w:body></w:document>"""
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("word/document.xml", doc)


def _make_pptx(path):
    import zipfile

    def slide(*shapes):
        body = "".join(
            f'<p:sp><p:txBody xmlns:a="{_A}">'
            + "".join(f"<a:p><a:r><a:t>{t}</a:t></a:r></a:p>" for t in paras)
            + "</p:txBody></p:sp>"
            for paras in shapes
        )
        return f'<p:sld xmlns:p="{_P}"><p:cSld><p:spTree>{body}</p:spTree></p:cSld></p:sld>'

    with zipfile.ZipFile(path, "w") as z:
        # slide10 before slide2 in the archive: numeric ordering must win
        z.writestr("ppt/slides/slide10.xml", slide(["ten"]))
        z.writestr("ppt/slides/slide1.xml", slide(["title", "subtitle"], ["note one"]))
        z.writestr("ppt/slides/slide2.xml", slide(["second slide"]))


def _make_xlsx(path):
    import zipfile

    shared = (
        f'<sst xmlns="{_S}"><si><t>name</t></si><si><t>score</t></si>'
        "<si><t>alice</t></si><si><t>bob</t></si></sst>"
    )
    sheet1 = f"""<worksheet xmlns="{_S}"><sheetData>
      <row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>
      <row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2"><v>10</v></c></row>
      <row r="3"><c r="A3" t="s"><v>3</v></c><c r="B3"><v>2.5</v></c></row>
    </sheetData></worksheet>"""
    sheet2 = f"""<worksheet xmlns="{_S}"><sheetData>
      <row r="1"><c r="A1" t="inlineStr"><is><t>k</t></is></c></row>
      <row r="2"><c r="A2" t="b"><v>1</v></c></row>
    </sheetData></worksheet>"""
    wb = (
        f'<workbook xmlns="{_S}" xmlns:r="{_R}"><sheets>'
        '<sheet name="S1" sheetId="1" r:id="rId1"/>'
        '<sheet name="S2" sheetId="2" r:id="rId2"/></sheets></workbook>'
    )
    rels = (
        f'<Relationships xmlns="{_PKR}">'
        '<Relationship Id="rId1" Target="worksheets/sheet1.xml"/>'
        '<Relationship Id="rId2" Target="worksheets/sheet2.xml"/></Relationships>'
    )
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("xl/workbook.xml", wb)
        z.writestr("xl/_rels/workbook.xml.rels", rels)
        z.writestr("xl/sharedStrings.xml", shared)
        z.writestr("xl/worksheets/sheet1.xml", sheet1)
        z.writestr("xl/worksheets/sheet2.xml", sheet2)


def test_docx_parser(tmp_path):
    p = str(tmp_path / "d.docx")
    _make_docx(p)
    [row] = PARSERS["docx_to_string"]({"path": p})
    # body paragraphs only (python-docx Document.paragraphs excludes
    # table cells); tab -> \t, br -> \n inside a paragraph; empty
    # paragraph kept as an empty line
    assert row["text"] == "Hello world\ntab\tafter\nnewline\n\nlast"
    assert "IN TABLE" not in row["text"]


def test_pptx_parser(tmp_path):
    p = str(tmp_path / "s.pptx")
    _make_pptx(p)
    [row] = PARSERS["pptx_to_string"]({"path": p})
    # numeric slide order (1, 2, 10), shapes joined by newlines
    assert row["text"] == "title\nsubtitle\nnote one\nsecond slide\nten"
    per_slide = PARSERS["pptx_to_string"]({"path": p}, doc_per_slide=True)
    assert [r["text"] for r in per_slide] == ["title\nsubtitle\nnote one", "second slide", "ten"]


def test_xlsx_parser(tmp_path):
    p = str(tmp_path / "t.xlsx")
    _make_xlsx(p)
    # col orientation (reference default): "header: v1\nv2" + blank line
    [row] = PARSERS["xlsx_to_string"]({"path": p})
    assert row["text"] == "name: alice\nbob\n\nscore: 10\n2.5\n"
    # row orientation with typed values (int 10, float 2.5)
    [rrow] = PARSERS["xlsx_to_string"]({"path": p}, orientation="row")
    assert rrow["text"] == "name: alice | score: 10\nname: bob | score: 2.5"
    # col_order subsets + reorders
    [orow] = PARSERS["xlsx_to_string"]({"path": p}, orientation="row", col_order=["score"])
    assert orow["text"] == "score: 10\nscore: 2.5"
    # doc_per_sheet fans out; sheet2 exercises inlineStr + bool
    sheets = PARSERS["xlsx_to_string"]({"path": p}, doc_per_sheet=True)
    assert len(sheets) == 2
    assert sheets[1]["text"] == "k: True\n"


def test_office_parsers_through_fanout(spark, tmp_path):
    d, s = str(tmp_path / "a.docx"), str(tmp_path / "b.pptx")
    _make_docx(d)
    _make_pptx(s)
    df = spark.createDataFrame([(s,)], "path string")
    out = apply_parsing(df, [{"function": "pptx_to_string", "doc_per_slide": True}])
    rows = out.collect()
    assert len(rows) == 3  # 1 -> N slide fan-out through mapInPandas
    assert rows[0]["path"] == s  # original columns carried through
    df2 = spark.createDataFrame([(d,)], "path string")
    [drow] = apply_parsing(df2, [{"function": "docx_to_string"}]).collect()
    assert drow["text"].startswith("Hello world")


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


def test_pptx_presentation_order_wins(tmp_path):
    """Reordered decks: PowerPoint rewrites presentation.xml's sldIdLst
    without renaming slideN.xml parts — the manifest order must win over
    filename order (python-pptx semantics)."""
    import zipfile

    def slide(txt):
        return (f'<p:sld xmlns:p="{_P}"><p:cSld><p:spTree><p:sp>'
                f'<p:txBody xmlns:a="{_A}"><a:p><a:r><a:t>{txt}</a:t></a:r></a:p>'
                f"</p:txBody></p:sp></p:spTree></p:cSld></p:sld>")

    pres = (
        f'<p:presentation xmlns:p="{_P}" xmlns:r="{_R}"><p:sldIdLst>'
        '<p:sldId id="257" r:id="rId2"/><p:sldId id="256" r:id="rId1"/>'
        "</p:sldIdLst></p:presentation>"
    )
    rels = (
        f'<Relationships xmlns="{_PKR}">'
        '<Relationship Id="rId1" Target="slides/slide1.xml"/>'
        '<Relationship Id="rId2" Target="slides/slide2.xml"/></Relationships>'
    )
    p = str(tmp_path / "reordered.pptx")
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("ppt/presentation.xml", pres)
        z.writestr("ppt/_rels/presentation.xml.rels", rels)
        z.writestr("ppt/slides/slide1.xml", slide("first-authored"))
        z.writestr("ppt/slides/slide2.xml", slide("second-authored"))
    [row] = PARSERS["pptx_to_string"]({"path": p})
    # sldIdLst puts slide2 first
    assert row["text"] == "second-authored\nfirst-authored"


def test_xlsx_implied_cell_positions(tmp_path):
    """Cells without the optional r= reference take implied positions
    (document order), like openpyxl's reconstruction."""
    import zipfile

    sheet = f"""<worksheet xmlns="{_S}"><sheetData>
      <row><c t="inlineStr"><is><t>h1</t></is></c><c t="inlineStr"><is><t>h2</t></is></c></row>
      <row><c><v>1</v></c><c><v>2</v></c></row>
    </sheetData></worksheet>"""
    p = str(tmp_path / "implied.xlsx")
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    [row] = PARSERS["xlsx_to_string"]({"path": p}, orientation="row")
    assert row["text"] == "h1: 1 | h2: 2"
