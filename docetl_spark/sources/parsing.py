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

Deterministic parsers run real logic (txt/json file readers, paragraph /
line / sentence splitters). Heavy-codec parsers (docx/xlsx/pptx/whisper,
parsing_tools.py:53-225) keep the reference's exact signature but raise
``NotImplementedError`` unless their optional library imports — this
container carries no document codecs, mirroring functions/multimodal.py.
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


docx_to_string = _codec_stub("docx_to_string", "docx")       # parsing_tools.py:172
xlsx_to_string = _codec_stub("xlsx_to_string", "openpyxl")   # parsing_tools.py:100
pptx_to_string = _codec_stub("pptx_to_string", "pptx")       # parsing_tools.py:189
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
