"""Map-family operators (SURVEY.md §2.2).

Reference semantics: docetl map/parallel_map/code_map/filter/code_filter/
add_uuid (docetl/operations/map.py, code_operations.py, filter.py,
add_uuid.py). Re-expressed as:

* expression maps -> plain ``withColumns`` (JVM, whole-stage codegen);
* pandas maps -> ``mapInPandas`` over Arrow batches (the north rule's
  vectorized transform stage — one Python call per ~10k rows, never per
  row);
* filter -> boolean column + ``df.filter`` so Catalyst can push the
  predicate into scans when it's expression-based.
"""

from __future__ import annotations

from typing import Callable, Iterable, Mapping

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PandasMapFn = Callable[[pd.DataFrame], pd.DataFrame]


def code_map(
    df: DataFrame,
    fn: PandasMapFn | None = None,
    output_schema: T.StructType | Mapping[str, str] | None = None,
    exprs: Mapping[str, Column] | None = None,
    drop: Iterable[str] = (),
) -> DataFrame:
    """Per-row transform, merged over the input row (``{**item, **output}``
    — reference docetl/operations/map.py:414 / code_operations.py:70-71).

    Two paths:
    * ``exprs``: named Column expressions — stays fully JVM-side; use this
      whenever the transform is expressible (the optimizer's
      "swap_with_code" fast path, for free).
    * ``fn``: a pandas-batch function returning the NEW/CHANGED columns
      (a pd.DataFrame aligned to the input batch index). ``output_schema``
      declares the added columns (DSL dict or StructType).
    """
    if exprs:
        df = df.withColumns(dict(exprs))
    if fn is not None:
        from docetl_spark.schema import parse_output_schema

        if output_schema is None:
            raise ValueError("output_schema required with fn")
        out_struct = (
            output_schema if isinstance(output_schema, T.StructType) else parse_output_schema(dict(output_schema))
        )
        in_fields = [f for f in df.schema.fields if f.name not in out_struct.fieldNames()]
        full = T.StructType(in_fields + list(out_struct.fields))

        def run(batches):
            for pdf in batches:
                out = fn(pdf)
                merged = pdf.copy()
                for c in out.columns:
                    merged[c] = out[c]
                yield merged[[f.name for f in full.fields]]

        df = df.mapInPandas(run, schema=full)
    if drop:
        df = df.drop(*drop)
    return df


def parallel_map(
    df: DataFrame,
    branches: Iterable[Mapping[str, Column]],
) -> DataFrame:
    """N independent projections over disjoint output keys, unioned into one
    row (reference docetl/operations/map.py:556-778). Expression branches
    compose into a single ``withColumns`` — Catalyst fuses them into one
    codegen stage, the column-parallel analogue of the reference's N
    concurrent prompts."""
    merged: dict[str, Column] = {}
    for br in branches:
        for k, c in br.items():
            if k in merged:
                raise ValueError(f"parallel_map branches overlap on output key {k!r}")
            merged[k] = c
    return df.withColumns(merged)


def code_filter(df: DataFrame, predicate: Column | Callable[[pd.DataFrame], pd.Series]) -> DataFrame:
    """Keep rows where the predicate holds (reference filter.py:93-98 drops
    the flag column — same here: the flag never materializes)."""
    if isinstance(predicate, Column):
        return df.filter(predicate)

    def run(batches):
        for pdf in batches:
            yield pdf[predicate(pdf).astype(bool)]

    return df.mapInPandas(run, schema=df.schema)


def drop_keys(df: DataFrame, keys: Iterable[str]) -> DataFrame:
    """The reference's drop_keys-only fast path (map.py:276-284)."""
    return df.drop(*keys)


def add_uuid(df: DataFrame, id_key: str = "doc_id", deterministic: bool = True) -> DataFrame:
    """Row id column (reference add_uuid.py:7-40 uses uuid4; we default to a
    content-derived sha256 so replays are byte-reproducible — SURVEY §7.3
    risk 1. Duplicate rows share an id by construction; pass
    deterministic=False for true uuid4)."""
    if deterministic:
        return df.withColumn(id_key, F.sha2(F.to_json(F.struct(*[F.col(c) for c in df.columns])), 256))
    return df.withColumn(id_key, F.expr("uuid()"))
