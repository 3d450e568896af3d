"""Rank operator (SURVEY.md §2.6; reference docetl/operations/rank.py).

The reference produces a total LLM-judged ordering via staged scoring +
sliding-window reranks. Deterministically, the pipeline shape is: score
every row (vectorized), order, attach ``_{name}_rank``; an optional
``rerank_fn`` re-scores the current top window (the "picky window" pass,
rank.py:887) in bounded driver-side iterations — only ever over k rows.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def rank(
    df: DataFrame,
    score: Column | str,
    direction: str = "desc",
    name: str = "rank",
    k: int | None = None,
    rerank_fn: Callable[[pd.DataFrame], pd.Series] | None = None,
    rerank_window: int = 50,
) -> DataFrame:
    """Total ordering by score; adds ``_{name}_rank`` (1-based) and keeps
    ``_{name}_score``.

    With ``k``, only the top-k are returned (TakeOrderedAndProject — no
    global sort). Without ``k``, ranks come from a global row_number — fine
    for final/medium outputs; for full-table ranking at 10^10 rows prefer
    topk or percentile bands.
    """
    sc = F.col(score) if isinstance(score, str) else score
    scored = df.withColumn(f"_{name}_score", sc.cast("double"))
    order = (
        [F.col(f"_{name}_score").desc()] if direction == "desc" else [F.col(f"_{name}_score").asc()]
    ) + [F.xxhash64(*[F.col(c) for c in df.columns])]

    if k is not None:
        top = scored.orderBy(*order).limit(int(k))
        if rerank_fn is not None:
            pdf = top.toPandas()
            head = pdf.head(rerank_window).copy()
            head[f"_{name}_score"] = rerank_fn(head).astype(float)
            pdf = pd.concat([head, pdf.iloc[len(head):]])
            pdf = pdf.sort_values(f"_{name}_score", ascending=(direction != "desc"), kind="mergesort")
            pdf[f"_{name}_rank"] = range(1, len(pdf) + 1)
            return df.sparkSession.createDataFrame(pdf)
        return top.withColumn(f"_{name}_rank", F.row_number().over(Window.orderBy(*order)))

    return scored.withColumn(f"_{name}_rank", F.row_number().over(Window.orderBy(*order)))
