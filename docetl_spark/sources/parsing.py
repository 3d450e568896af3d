"""Parsing-tool fan-out: file/field ingestion that turns one dataset item
into N derived rows (reference docetl/dataset.py:241-315 + parsing_tools.py).

The reference applies each parsing tool per item on a thread pool and
fans out ``[item.copy() | res for res in func(item, **kwargs)]``
(dataset.py:241-248). Here each tool is one ``mapInPandas`` stage: the
1->N fan-out happens inside the Arrow batch, so a million-file ingest
distributes across executors with no driver loop and no shuffle (parsing
is embarrassingly parallel; downstream repartitioning is the pipeline's
choice). Row-at-a-time Python inside the batch is inherent to parsing —
the same documented slow-path exception as functions/multimodal.py.

Deterministic parsers run real logic: txt/json file readers, paragraph /
line / sentence splitters, and stdlib zip+XML readers for the three OOXML
office formats (docx/xlsx/pptx — parsing_tools.py:100-226 semantics
without the python-docx/openpyxl/python-pptx dependencies). Only parsers
needing true heavyweight codecs (whisper speech-to-text,
parsing_tools.py:53) keep the reference signature behind a
``NotImplementedError`` gate, mirroring functions/multimodal.py.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

ParserFn = Callable[..., list[dict]]


# -- deterministic parsers (real) ---------------------------------------------

def txt_to_string(item: dict, input_key: str = "path", output_key: str = "text") -> list[dict]:
    """Read a text file path into one row (parsing_tools.py:157-169)."""
    with open(item[input_key], encoding="utf-8") as f:
        return [{output_key: f.read()}]


def json_to_string(item: dict, input_key: str = "path", output_key: str = "text") -> list[dict]:
    """Read a JSON file into its canonical string form."""
    with open(item[input_key], encoding="utf-8") as f:
        return [{output_key: json.dumps(json.load(f), sort_keys=True)}]


def jsonl_to_rows(item: dict, input_key: str = "path", output_key: str = "record") -> list[dict]:
    """One output row per JSONL line (fan-out file reader)."""
    out = []
    with open(item[input_key], encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if line:
                out.append({output_key: line})
    return out


def split_paragraphs(item: dict, input_key: str = "text", output_key: str = "paragraph") -> list[dict]:
    """One row per double-newline paragraph."""
    return [{output_key: p} for p in (item[input_key] or "").split("\n\n")]


def split_lines(item: dict, input_key: str = "text", output_key: str = "line") -> list[dict]:
    return [{output_key: ln} for ln in (item[input_key] or "").split("\n")]


def split_sentences(item: dict, input_key: str = "text", output_key: str = "sentence") -> list[dict]:
    """Naive '. ' sentence split — deterministic and SQL-reproducible."""
    return [{output_key: s} for s in (item[input_key] or "").split(". ")]


def word_windows(
    item: dict, input_key: str = "text", output_key: str = "window",
    window: int = 20, stride: int = 10,
) -> list[dict]:
    """Overlapping word windows (training-data chunking with context
    overlap): window of ``window`` whitespace tokens every ``stride``
    tokens; the tail window may be shorter. A real 1->N fan-out."""
    toks = (item[input_key] or "").split()
    if not toks:
        return [{output_key: ""}]
    return [{output_key: " ".join(toks[i : i + window])} for i in range(0, len(toks), stride)]


# -- OOXML parsers (stdlib zipfile + xml.etree; no optional libraries) --------
#
# docx/xlsx/pptx are zip archives of XML parts, so the reference's
# python-docx/openpyxl/python-pptx extraction semantics
# (parsing_tools.py:100-226) are reproducible with the stdlib. Element
# matching uses the `{*}tag` namespace wildcard (Python >= 3.8), so any
# producer's namespace prefixes work.

def _zip_xml(path: str, member: str):
    import xml.etree.ElementTree as ET
    import zipfile

    with zipfile.ZipFile(path) as zf:
        return ET.fromstring(zf.read(member))


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _docx_paragraph_text(p) -> str:
    # python-docx paragraph.text: concatenated run text, with w:tab -> \t
    # and w:br / w:cr -> \n
    parts: list[str] = []
    for el in p.iter():
        name = _local(el.tag)
        if name == "t":
            parts.append(el.text or "")
        elif name == "tab":
            parts.append("\t")
        elif name in ("br", "cr"):
            parts.append("\n")
    return "".join(parts)


def docx_to_string(item: dict, input_key: str = "path", output_key: str = "text") -> list[dict]:
    """Word document -> one row of text: body-level paragraphs joined by
    newlines (reference parsing_tools.py:172-186 via python-docx
    ``Document.paragraphs``, which walks top-level ``w:p`` only — table
    cell text is intentionally excluded, matching the library)."""
    root = _zip_xml(item[input_key], "word/document.xml")
    body = next((el for el in root if _local(el.tag) == "body"), root)
    paras = [_docx_paragraph_text(p) for p in body if _local(p.tag) == "p"]
    return [{output_key: "\n".join(paras)}]


def pptx_to_string(
    item: dict, input_key: str = "path", output_key: str = "text",
    doc_per_slide: bool = False,
) -> list[dict]:
    """PowerPoint -> text per presentation (or one row per slide with
    ``doc_per_slide``): for each slide in PRESENTATION order, every
    text-bearing shape (``txBody``) contributes its paragraphs joined by
    newlines (reference parsing_tools.py:189-226 via python-pptx
    ``shape.text`` semantics).

    Slide order comes from ``ppt/presentation.xml``'s ``sldIdLst``
    resolved through the presentation rels — PowerPoint reorders decks by
    rewriting that list WITHOUT renaming slideN.xml parts, so filename
    order is stale for reordered decks (python-pptx follows the list;
    numeric part order is only the fallback for archives missing the
    manifest)."""
    import zipfile

    path = item[input_key]
    with zipfile.ZipFile(path) as zf:
        import re as _re

        names = set(zf.namelist())
        slides: list[str] = []
        if "ppt/presentation.xml" in names and "ppt/_rels/presentation.xml.rels" in names:
            rels_root = _zip_xml(path, "ppt/_rels/presentation.xml.rels")
            rid_to_target = {
                rel.get("Id"): rel.get("Target")
                for rel in rels_root if _local(rel.tag) == "Relationship"
            }
            pres = _zip_xml(path, "ppt/presentation.xml")
            for el in pres.iter():
                if _local(el.tag) != "sldId":
                    continue
                # sldId carries BOTH a bare id= (the slide id number) and
                # the namespaced r:id= relationship — only the qualified
                # one resolves through the rels map
                rid = next(
                    (v for k, v in el.attrib.items() if "}" in k and _local(k) == "id"),
                    None,
                )
                target = rid_to_target.get(rid)
                if target:
                    member = target.lstrip("/")
                    if not member.startswith("ppt/"):
                        member = "ppt/" + member
                    if member in names:
                        slides.append(member)
        if not slides:
            slides = sorted(
                (m for m in names if _re.fullmatch(r"ppt/slides/slide\d+\.xml", m)),
                key=lambda m: int(_re.search(r"(\d+)", m).group(1)),
            )
    out: list[dict] = []
    all_shapes: list[str] = []
    for member in slides:
        root = _zip_xml(path, member)
        shape_texts = []
        for tx in root.iter():
            if _local(tx.tag) != "txBody":
                continue
            paras = [
                "".join(t.text or "" for t in p.iter() if _local(t.tag) == "t")
                for p in tx if _local(p.tag) == "p"
            ]
            shape_texts.append("\n".join(paras))
        if doc_per_slide:
            out.append({output_key: "\n".join(shape_texts)})
        else:
            all_shapes.extend(shape_texts)
    if not doc_per_slide:
        out = [{output_key: "\n".join(all_shapes)}]
    return out


def _xlsx_cell_value(c, shared: list[str]):
    t = c.get("t")
    if t == "inlineStr":
        return "".join(x.text or "" for x in c.iter() if _local(x.tag) == "t")
    v = next((x for x in c if _local(x.tag) == "v"), None)
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t == "str":
        return v.text
    if t == "b":
        return bool(int(v.text))
    # numeric: int when integral, float otherwise (openpyxl typing)
    txt = v.text
    try:
        f = float(txt)
    except ValueError:
        return txt
    return int(f) if f.is_integer() and "e" not in txt.lower() and "." not in txt else f


def _xlsx_sheet_grid(root, shared: list[str]) -> list[list]:
    """Sheet XML -> dense row-major grid (None for absent cells).

    The ``r=`` cell reference is OPTIONAL in OOXML (position is implied
    from document order when omitted — several minimal writers skip it to
    save space); an implied cursor tracks (row from the <row r=>, column
    = previous cell's column + 1), matching openpyxl's reconstruction."""
    import re as _re

    cells: dict[tuple[int, int], object] = {}
    max_r = max_c = 0
    implied_row = 0
    for row in root.iter():
        if _local(row.tag) != "row":
            continue
        implied_row = int(row.get("r")) if row.get("r") else implied_row + 1
        cur_col = 0
        for c in row:
            if _local(c.tag) != "c":
                continue
            ref = c.get("r") or ""
            m = _re.match(r"([A-Z]+)(\d+)", ref)
            if m:
                col = 0
                for ch in m.group(1):
                    col = col * 26 + (ord(ch) - 64)
                r = int(m.group(2))
            else:
                col = cur_col + 1
                r = implied_row
            cur_col = col
            cells[(r, col)] = _xlsx_cell_value(c, shared)
            max_r, max_c = max(max_r, r), max(max_c, col)
    return [[cells.get((r, c)) for c in range(1, max_c + 1)] for r in range(1, max_r + 1)]


def xlsx_to_string(
    item: dict, input_key: str = "path", output_key: str = "text",
    orientation: str = "col", col_order: list[str] | None = None,
    doc_per_sheet: bool = False,
) -> list[dict]:
    """Excel -> string form (reference parsing_tools.py:100-154):
    ``col`` orientation emits ``header: v1\\nv2...`` per column with a
    blank line between columns; ``row`` emits ``h1: v1 | h2: v2`` per
    data row (None headers skipped). ``col_order`` keeps only the named
    headers, in that order (the reference's filter compares header names
    against an iter_cols generator and so never matches — semantics-fixed
    here rather than bug-copied). ``doc_per_sheet`` fans out one row per
    worksheet, else the first sheet only."""
    import zipfile

    path = item[input_key]
    with zipfile.ZipFile(path) as zf:
        names = set(zf.namelist())
        shared: list[str] = []
        if "xl/sharedStrings.xml" in names:
            sroot = _zip_xml(path, "xl/sharedStrings.xml")
            for si in sroot:
                if _local(si.tag) == "si":
                    shared.append("".join(t.text or "" for t in si.iter() if _local(t.tag) == "t"))
        # workbook sheet order -> worksheet parts via the rels map
        sheet_members: list[str] = []
        if "xl/workbook.xml" in names and "xl/_rels/workbook.xml.rels" in names:
            rels_root = _zip_xml(path, "xl/_rels/workbook.xml.rels")
            rid_to_target = {
                rel.get("Id"): rel.get("Target") for rel in rels_root if _local(rel.tag) == "Relationship"
            }
            wb = _zip_xml(path, "xl/workbook.xml")
            for el in wb.iter():
                if _local(el.tag) != "sheet":
                    continue
                # relationship ids are NAMESPACED (r:id); an element can
                # also carry a bare id= attribute (sldId does in pptx), so
                # require a namespaced key — same guard as the pptx path
                rid = next((v for k, v in el.attrib.items() if "}" in k and _local(k) == "id"), None)
                target = rid_to_target.get(rid)
                if target:
                    sheet_members.append("xl/" + target.lstrip("/") if not target.startswith("xl/") else target)
        if not sheet_members:
            import re as _re

            sheet_members = sorted(
                (m for m in names if _re.fullmatch(r"xl/worksheets/sheet\d+\.xml", m)),
                key=lambda m: int(_re.search(r"(\d+)", m).group(1)),
            )

    def process(member: str) -> str:
        grid = _xlsx_sheet_grid(_zip_xml(path, member), shared)
        if not grid:
            return ""
        headers = list(grid[0])
        cols = list(range(len(headers)))
        if col_order:
            by_name = {h: i for i, h in enumerate(headers)}
            cols = [by_name[h] for h in col_order if h in by_name]
            headers = [headers[i] for i in cols]
        result: list[str] = []
        if orientation == "col":
            for h_pos, ci in enumerate(cols):
                column_values = [row[ci] if ci < len(row) else None for row in grid[1:]]
                result.append(f"{headers[h_pos]}: " + "\n".join(map(str, column_values)))
                result.append("")  # blank line between columns
        else:
            for row in grid[1:]:
                pairs = [
                    (headers[h_pos], row[ci] if ci < len(row) else None)
                    for h_pos, ci in enumerate(cols) if headers[h_pos]
                ]
                result.append(" | ".join(f"{h}: {v}" for h, v in pairs))
        return "\n".join(result)

    members = sheet_members if doc_per_sheet else sheet_members[:1]
    return [{output_key: process(m)} for m in members]


# -- heavy-codec parsers (reference signatures, gated on optional libs) -------

def _codec_stub(name: str, module: str) -> ParserFn:
    def parser(item: dict, input_key: str = "path", output_key: str = "text", **kw) -> list[dict]:
        try:
            __import__(module)
        except ImportError as e:
            raise NotImplementedError(
                f"{name} needs the optional '{module}' library, which this "
                f"environment does not ship (same stub policy as "
                f"functions/multimodal.py); register a custom parser via "
                f"apply_parsing(user_tools=...) to supply a real decoder"
            ) from e
        raise NotImplementedError(f"{name}: codec wiring pending the '{module}' library")

    parser.__name__ = name
    return parser


whisper_speech_to_text = _codec_stub("whisper_speech_to_text", "whisper")  # :53

PARSERS: dict[str, ParserFn] = {
    "txt_to_string": txt_to_string,
    "json_to_string": json_to_string,
    "jsonl_to_rows": jsonl_to_rows,
    "split_paragraphs": split_paragraphs,
    "split_lines": split_lines,
    "split_sentences": split_sentences,
    "word_windows": word_windows,
    "docx_to_string": docx_to_string,
    "xlsx_to_string": xlsx_to_string,
    "pptx_to_string": pptx_to_string,
    "whisper_speech_to_text": whisper_speech_to_text,
}


def get_parser(name: str, user_tools: dict[str, ParserFn] | None = None) -> ParserFn:
    if user_tools and name in user_tools:
        return user_tools[name]
    if name in PARSERS:
        return PARSERS[name]
    raise ValueError(f"parsing tool {name!r} not found; known: {sorted(PARSERS)}")


def apply_parsing(
    df: DataFrame,
    tools: Iterable[dict],
    user_tools: dict[str, ParserFn] | None = None,
) -> DataFrame:
    """Apply parsing tools in order; each is a 1->N mapInPandas fan-out.

    Tool config mirrors the reference YAML: ``function`` (registry or
    ``user_tools`` name), ``function_kwargs`` (merged with any remaining
    keys for the legacy flat form, dataset.py:266-272), plus optional
    ``output_schema`` ({col: spark_ddl_type}) for non-string outputs.
    New output columns default to string; existing columns keep their type
    (a tool may overwrite, e.g. re-chunking ``text``).
    """
    for tool in tools:
        cfg = dict(tool)
        func = get_parser(cfg.pop("function"), user_tools)
        out_types = cfg.pop("output_schema", None) or {}
        kwargs = cfg.pop("function_kwargs", {})
        kwargs.update(cfg)  # legacy flat kwargs form

        # probe output columns on an empty item set is impossible without a
        # sample; declare them: output_key (or parser default) + overrides
        probe_keys = [kwargs.get("output_key")] if kwargs.get("output_key") else None
        if probe_keys is None:
            import inspect

            sig = inspect.signature(func)
            default = sig.parameters.get("output_key")
            probe_keys = [default.default] if default and default.default is not inspect.Parameter.empty else []
        new_cols = [k for k in dict.fromkeys(list(probe_keys) + list(out_types)) if k]

        fields = list(df.schema.fields)
        have = {f.name for f in fields}
        for k in new_cols:
            if k in have:
                # existing column keeps its type unless output_schema
                # explicitly overrides it (a string default would clobber
                # e.g. a long column the parser overwrites with ints)
                if k in out_types:
                    dt = T._parse_datatype_string(out_types[k])
                    fields = [T.StructField(k, dt, True) if f.name == k else f for f in fields]
            else:
                dt = T._parse_datatype_string(out_types[k]) if k in out_types else T.StringType()
                fields.append(T.StructField(k, dt, True))
        schema = T.StructType(fields)
        out_names = [f.name for f in schema.fields]

        def run(batches, _func=func, _kw=dict(kwargs), _names=tuple(out_names)):
            for pdf in batches:
                rows = []
                for item in pdf.to_dict("records"):
                    for res in _func(item, **_kw):
                        rows.append({**item, **res})  # dataset.py:248
                yield pd.DataFrame(rows, columns=list(_names))

        df = df.mapInPandas(run, schema=schema)
    return df
