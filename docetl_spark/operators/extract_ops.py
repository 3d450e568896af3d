"""Extract operator (SURVEY.md §2.2; reference docetl/operations/extract.py).

The reference extracts spans from long text either by LLM-pointed line
numbers or regex. The deterministic engine form is the regex strategy
(extract.py:259): ``regexp_extract_all`` per document key, results joined
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
