"""Extract operator (SURVEY.md §2.2; reference docetl/operations/extract.py).

The reference extracts spans from long text either by LLM-pointed line
numbers (extract.py:119) or regex (extract.py:259). Deterministic engine
forms: ``extract_regex`` (``regexp_extract_all`` per document key) and
``extract_lines`` (the line_number strategy with the LLM pointer replaced
by a caller-supplied ranges column / vectorized pointer fn). Results join
with newlines into ``{key}_extracted_{name}`` (suffix convention at
extract.py:50-54). Pure Column expressions.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def extract_regex(
    df: DataFrame,
    document_keys: Iterable[str],
    pattern: str,
    name: str = "extract",
    group: int = 0,
    join_with: str = "\n",
) -> DataFrame:
    for key in document_keys:
        df = df.withColumn(
            f"{key}_extracted_{name}",
            F.array_join(F.regexp_extract_all(F.col(key), F.lit(pattern), F.lit(group)), join_with),
        )
    return df


def extract_lines(
    df: DataFrame,
    document_key: str,
    ranges_col: str,
    name: str = "extract",
    join_with: str = "\n\n",
) -> DataFrame:
    """Line-number extraction (extract.py:119): slice 1-based inclusive
    line ranges out of the document. ``ranges_col`` is an
    ``array<struct<start:int, end:int>>`` column — in the reference the
    LLM produces these pointers from the line-numbered document; here any
    upstream stage (regex scan, vectorized model, static config) can."""
    lines = F.split(F.col(document_key), "\n")
    spans = F.transform(
        F.col(ranges_col),
        lambda r: F.array_join(
            F.slice(lines, r["start"], F.greatest(r["end"] - r["start"] + 1, F.lit(0))), "\n"
        ),
    )
    return df.withColumn(f"{document_key}_extracted_{name}", F.array_join(spans, join_with))
