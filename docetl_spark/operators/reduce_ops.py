"""Reduce-family operators (SURVEY.md §2.3).

Reference: docetl/operations/reduce.py (980 LoC) + code_reduce in
code_operations.py:76-163. Three physical strategies map onto Spark:

* batch reduce        -> ``groupBy(keys).applyInPandas`` (sort-agg per group)
* ordered incremental -> same grouped apply, sorted inside the group, fold
  loop over fixed-size chunks carrying a scratchpad (reduce.py:631-699)
* parallel fold+merge -> two-level salted aggregation (skew.salted_agg),
  legal iff associative (reduce.py:466-629) — Spark's partial/final shape.

Conventions preserved: ``reduce_key`` may be a string, list, or ``_all``
(one global group, reduce.py:118-119 in code_operations); list-VALUED key
columns normalize to sorted tuples (reduce.py:267-270); ``pass_through``
back-fills non-key columns from the group's first row (reduce.py:349-357);
``_counts_prereduce_{name}`` carries the pre-aggregation group size
(code_operations.py:159).
"""

from __future__ import annotations

from typing import Callable, Mapping

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from docetl_spark.schema import parse_output_schema

ALL_KEY = "_all"

GroupFn = Callable[[pd.DataFrame], dict]  # one group -> one output-row dict
FoldFn = Callable[[dict, pd.DataFrame], dict]  # (scratchpad/state, chunk) -> new state


def _norm_keys(reduce_key) -> list[str]:
    if isinstance(reduce_key, str):
        return [reduce_key]
    return list(reduce_key)


def _prep_groups(df: DataFrame, keys: list[str]) -> tuple[DataFrame, list[str]]:
    """Handle ``_all`` (constant group) and list-valued key normalization."""
    if keys == [ALL_KEY]:
        return df.withColumn(ALL_KEY, F.lit(1)), [ALL_KEY]
    gcols = []
    for k in keys:
        if isinstance(df.schema[k].dataType, T.ArrayType):
            # order-insensitive list key: sorted-tuple normalization
            df = df.withColumn(f"_norm_{k}", F.array_sort(F.col(k)))
            gcols.append(f"_norm_{k}")
        else:
            gcols.append(k)
    return df, gcols


def code_reduce(
    df: DataFrame,
    reduce_key,
    fn: GroupFn,
    output_schema: T.StructType | Mapping[str, str],
    name: str = "reduce",
    pass_through: bool = False,
    add_counts: bool = True,
    lineage_keys: list[str] | None = None,
) -> DataFrame:
    """Batch reduce: one output row per group via a pandas group function.

    ``fn`` receives the whole group as a pd.DataFrame and returns a dict of
    output values; reduce keys are back-filled from the group
    (code_operations.py:154-157), ``pass_through`` copies remaining columns
    from the group's first row.

    ``lineage_keys`` (reference ``output.lineage``, reduce.py:359-368):
    adds ``{name}_lineage`` = array<struct<keys...>> of every group
    member's key projection. The reference keeps arrival order (one
    thread's list-append); a distributed group has no arrival order, so
    members sort by the lineage key tuple — deterministic at any
    parallelism.
    """
    keys = _norm_keys(reduce_key)
    df2, gcols = _prep_groups(df, keys)
    out_struct = (
        output_schema if isinstance(output_schema, T.StructType) else parse_output_schema(dict(output_schema))
    )

    fields: list[T.StructField] = []
    for k, g in zip(keys, gcols):
        fields.append(T.StructField(k, df2.schema[g].dataType, True))
    fields += [f for f in out_struct.fields if f.name not in keys]
    if pass_through:
        fields += [
            f
            for f in df.schema.fields
            if f.name not in keys and f.name not in [x.name for x in fields]
        ]
    count_col = f"_counts_prereduce_{name}"
    if add_counts:
        fields.append(T.StructField(count_col, T.LongType(), True))
    lineage_col = f"{name}_lineage"
    if lineage_keys:
        lin_struct = T.StructType(
            [T.StructField(k, df.schema[k].dataType, True) for k in lineage_keys]
        )
        fields.append(T.StructField(lineage_col, T.ArrayType(lin_struct), True))
    schema = T.StructType(fields)
    key_pairs = list(zip(keys, gcols))
    passthrough_cols = [f.name for f in df.schema.fields if f.name not in keys] if pass_through else []
    out_names = [f.name for f in schema.fields]

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        res = fn(pdf)
        row = {}
        for k, g in key_pairs:
            row[k] = pdf[g].iloc[0]
        for c in passthrough_cols:
            row.setdefault(c, pdf[c].iloc[0])
        row.update(res)
        if add_counts:
            row[count_col] = len(pdf)
        if lineage_keys:
            lin = pdf[list(lineage_keys)].sort_values(list(lineage_keys), kind="mergesort")
            row[lineage_col] = [
                {k: (None if v is None or (isinstance(v, float) and v != v) else v)
                 for k, v in rec.items()}
                for rec in lin.to_dict("records")
            ]
        return pd.DataFrame([{c: row.get(c) for c in out_names}])

    return df2.groupBy(*gcols).applyInPandas(run, schema=schema)


def reduce_fold(
    df: DataFrame,
    reduce_key,
    fold_fn: FoldFn,
    output_schema: T.StructType | Mapping[str, str],
    order_col: str = "lsn",
    fold_batch_size: int = 100,
    init_state: dict | None = None,
    persist_intermediates: bool = False,
    name: str = "reduce",
) -> DataFrame:
    """Ordered incremental fold with scratchpad (reduce.py:631-699).

    Each group is sorted by ``order_col`` inside the pandas function and
    folded chunk-by-chunk of ``fold_batch_size`` rows; ``fold_fn`` carries
    the scratchpad state forward (the non-commutative aggregation path —
    order within the group is guaranteed regardless of partitioning, which
    is what makes the result byte-stable across parallelism levels).

    ``persist_intermediates`` (reference reduce.py:391-397,:540-546): adds
    ``_{name}_intermediates`` = array<string> of each fold round's state
    as canonical JSON ``{"iter": i, "intermediate": {...}}`` — the
    engine's record of the reference's per-iteration scratchpad log.
    """
    import json

    keys = _norm_keys(reduce_key)
    df2, gcols = _prep_groups(df, keys)
    out_struct = (
        output_schema if isinstance(output_schema, T.StructType) else parse_output_schema(dict(output_schema))
    )
    fields = [T.StructField(k, df2.schema[g].dataType, True) for k, g in zip(keys, gcols)]
    fields += [f for f in out_struct.fields if f.name not in keys]
    inter_col = f"_{name}_intermediates"
    if persist_intermediates:
        fields.append(T.StructField(inter_col, T.ArrayType(T.StringType()), True))
    schema = T.StructType(fields)
    key_pairs = list(zip(keys, gcols))
    out_names = [f.name for f in schema.fields]

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort")
        state = dict(init_state or {})
        inters = []
        for i, start in enumerate(range(0, len(pdf), fold_batch_size)):
            state = fold_fn(state, pdf.iloc[start : start + fold_batch_size])
            if persist_intermediates:
                inters.append(json.dumps(
                    {"iter": i, "intermediate": state}, sort_keys=True, default=str
                ))
        row = {k: pdf[g].iloc[0] for k, g in key_pairs}
        row.update(state)
        if persist_intermediates:
            row[inter_col] = inters
        return pd.DataFrame([{c: row.get(c) for c in out_names}])

    return df2.groupBy(*gcols).applyInPandas(run, schema=schema)


def reduce_merge(
    df: DataFrame,
    reduce_key,
    partial_fn: Callable[[pd.DataFrame], pd.DataFrame],
    merge_fn: Callable[[pd.DataFrame], pd.DataFrame],
    output_schema: T.StructType | str,
    salts: int = 32,
) -> DataFrame:
    """Associative parallel fold + hierarchical merge (reduce.py:466-629,
    ``associative: true``): the two-level salted aggregation — partial fold
    on (key, salt) slices, merge per key. Explicit skew handling: a hot
    group fans out over ``salts`` tasks. See operators/skew.py."""
    from docetl_spark.operators.skew import salted_agg

    keys = _norm_keys(reduce_key)
    df2, gcols = _prep_groups(df, keys)
    return salted_agg(df2, gcols, partial_fn, merge_fn, output_schema, salts=salts)


def value_sample(
    df: DataFrame,
    reduce_key,
    method: str = "random",
    sample_size: int = 100,
    order_col: str | None = None,
    embedding_col: str | None = None,
    query_vec: list[float] | None = None,
    seed: int = 42,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-group input downsampling before a reduce — the reference's
    ``value_sampling`` (docetl/operations/reduce.py:136-154, :299-322,
    :404-464). Methods:

    * ``random``  — seeded hash order, first ``sample_size`` per group
    * ``first_n`` — first ``sample_size`` by ``order_col`` (reference keeps
      input order; here order must be explicit to be deterministic)
    * ``sem_sim`` — top ``sample_size`` by cosine similarity of
      ``embedding_col`` to ``query_vec`` (reduce.py:430-464)
    * ``cluster`` — ``sample_size`` diverse representatives per group via
      deterministic greedy farthest-point k-center over ``embedding_col``
      — the seedless analogue of the reference's KMeans + one-pick-per-
      cluster (reduce.py:404-439); same goal (coverage of the group's
      embedding space), reproducible at any parallelism. Grouped apply:
      the k-center loop is O(sample_size * |group|) numpy per group.

    One shuffle (the rank window / grouped apply partitions by the reduce
    key — the same partitioning the downstream grouped reduce needs, so
    AQE/exchange reuse makes the sample effectively free).
    """
    from pyspark.sql import Window

    from docetl_spark.functions.vectors import cosine

    keys = _norm_keys(reduce_key)
    df2, gcols = _prep_groups(df, keys)
    if method == "random":
        order = [F.xxhash64(*[F.col(c) for c in df2.columns], F.lit(seed)).asc()]
    elif method == "first_n":
        if not order_col:
            raise ValueError("first_n needs order_col")
        order = [F.col(order_col).asc()]
    elif method == "sem_sim":
        if not (embedding_col and query_vec):
            raise ValueError("sem_sim needs embedding_col and query_vec")
        q = F.array(*[F.lit(float(v)) for v in query_vec])
        # deterministic tiebreak (repo convention): tied cosines (duplicate
        # embeddings in a group) would otherwise make the kept top-k depend
        # on partitioning. Prefer an explicit id column (oracle-mirrorable);
        # fall back to a content hash.
        tie = (
            F.col(tiebreak_col).asc()
            if tiebreak_col
            else F.xxhash64(*[F.col(c) for c in df2.columns]).asc()
        )
        order = [cosine(F.col(embedding_col), q).desc(), tie]
    elif method == "cluster":
        if not embedding_col:
            raise ValueError("cluster needs embedding_col")
        import numpy as np

        hcol = "_vs_h"
        df3 = df2.withColumn(hcol, F.xxhash64(*[F.col(c) for c in df2.columns], F.lit(seed)))
        out_schema = df3.drop(hcol).schema
        out_names = [f.name for f in out_schema.fields]

        def kcenter(pdf: pd.DataFrame) -> pd.DataFrame:
            if len(pdf) <= sample_size:
                return pdf[out_names]
            pdf = pdf.sort_values(hcol, kind="mergesort").reset_index(drop=True)
            X = np.asarray(pdf[embedding_col].tolist(), dtype=float)
            chosen = [0]  # deterministic start: first row in hash order
            d = np.linalg.norm(X - X[0], axis=1)
            for _ in range(sample_size - 1):
                if d.max() == 0:
                    # fewer distinct points than sample_size: stop rather
                    # than re-emit an already-chosen row (a sampler must
                    # never output a row more often than the input has it)
                    break
                nxt = int(d.argmax())
                chosen.append(nxt)
                d = np.minimum(d, np.linalg.norm(X - X[nxt], axis=1))
            return pdf.iloc[sorted(chosen)][out_names]

        return (
            df3.groupBy(*gcols)
            .applyInPandas(kcenter, schema=out_schema)
            .drop(*[g for g in gcols if g not in df.columns])
        )
    else:
        raise ValueError(f"unknown value_sampling method {method!r}")
    w = Window.partitionBy(*gcols).orderBy(*order)
    return (
        df2.withColumn("_vs_rn", F.row_number().over(w))
        .filter(F.col("_vs_rn") <= sample_size)
        .drop("_vs_rn", *[g for g in gcols if g not in df.columns])
    )
