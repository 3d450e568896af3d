"""Unnest operator (SURVEY.md §2.5; reference docetl/operations/unnest.py).

List fields explode one row per element (element replaces the list under
the same key); struct fields expand selected subfields onto the parent row
(``expand_fields``); ``recursive``/``depth`` re-applies; ``keep_empty``
emits the row with a null element instead of dropping it. All built-in
Catalyst generators — zero Python.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def unnest(
    df: DataFrame,
    unnest_key: str,
    expand_fields: Iterable[str] = (),
    keep_empty: bool = False,
    recursive: bool = False,
    depth: int = 1,
) -> DataFrame:
    dt = df.schema[unnest_key].dataType
    if isinstance(dt, T.StructType):
        # dict expand: selected subfields onto the parent (unnest.py:142-152)
        fields = list(expand_fields) or [f.name for f in dt.fields]
        for f in fields:
            df = df.withColumn(f, F.col(f"{unnest_key}.{f}"))
        return df
    if not isinstance(dt, T.ArrayType):
        raise ValueError(f"unnest_key {unnest_key!r} is {dt.simpleString()}, need array or struct")

    explode = F.explode_outer if keep_empty else F.explode
    other = [c for c in df.columns if c != unnest_key]
    out = df.select(*other, explode(F.col(unnest_key)).alias(unnest_key))
    n = (depth if recursive else 1) - 1
    while n > 0 and isinstance(out.schema[unnest_key].dataType, T.ArrayType):
        out = out.select(*other, explode(F.col(unnest_key)).alias(unnest_key))
        n -= 1
    return out
