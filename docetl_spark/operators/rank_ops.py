"""Rank operator (SURVEY.md §2.6; reference docetl/operations/rank.py).

The reference produces a total LLM-judged ordering in two phases:

1. an initial ordering (``embedding`` / ``likert`` / ``calibrated_embedding``
   — all scoring passes, rank.py:700-737); here the deterministic analogue
   is a vectorized ``score`` expression (pluggable, so an LLM-backed batch
   scorer slots in through the middleware stack);
2. a budgeted sliding "picky window" refinement (rank.py:744-870): exactly
   ``rerank_call_budget`` windows slide from the bottom of the top-k slice
   upward with ``overlap_fraction`` overlap; each call picks the
   ``num_top_items_per_window`` best docs of its window and swaps them to
   the window's front positions. Driver-side over ≤ k rows by design —
   the expensive part is the per-window call, not the data movement.

Scale note: with ``k`` the candidate slice comes from
TakeOrderedAndProject (per-partition heaps, no global sort). Without
``k`` the full-table ranking avoids the single-task global window via
range repartitioning: sort within range partitions + per-partition count
offsets — the standard distributed zipWithIndex shape.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _picky_window_protocol(
    pdf: pd.DataFrame,
    picker: Callable[[pd.DataFrame, int], list[int]],
    k: int,
    budget: int,
    num_top_items: int,
    overlap_fraction: float,
) -> pd.DataFrame:
    """The reference's sliding-window refinement (rank.py:744-870), exactly:
    window geometry from the call budget, bottom-up slide, picked docs swap
    to the window's front positions, stop once a window touches the top.

    ``picker(window_pdf, n)`` returns window-relative indices of the best
    ``n`` rows, best first (the deterministic stand-in for the LLM's
    ``top_picks`` list)."""
    step_size = max(1, int(k / (budget - 1 or 1)))
    window_size = min(
        k,
        max(num_top_items, int(step_size / (1 - overlap_fraction)))
        if overlap_fraction < 1
        else step_size * 2,
    )
    order = list(range(len(pdf)))  # positions -> original row index
    calls = 0
    for i in range(k - 1, 0, -step_size):
        if calls >= budget:
            break
        end_idx = i
        start_idx = max(0, end_idx - window_size)
        if start_idx == 0:
            end_idx = window_size
        window_positions = list(range(start_idx, min(end_idx, len(order))))
        if len(window_positions) < num_top_items:
            continue
        window = pdf.iloc[[order[p] for p in window_positions]].reset_index(drop=True)
        picks = picker(window, num_top_items)
        calls += 1
        # window-relative picks -> original row indices, deduped, capped
        picked = list(dict.fromkeys(
            order[window_positions[idx]] for idx in picks if 0 <= idx < len(window_positions)
        ))[:num_top_items]
        # swap picked docs to the front positions of the window
        pos_of = {row: pos for pos, row in enumerate(order)}
        for target_off, row in enumerate(picked):
            if target_off >= len(window_positions):
                break
            cur = pos_of[row]
            target = window_positions[target_off]
            if cur == target:
                continue
            other = order[target]
            order[target], order[cur] = row, other
            pos_of[row], pos_of[other] = target, cur
        if start_idx == 0:
            break
    return pdf.iloc[order].reset_index(drop=True)


def _distributed_global_rank(scored: DataFrame, order: list, rank_col: str) -> DataFrame:
    """Global row_number without a single-task window: range-repartition on
    the (total, tie-free) order, sort within partitions, then local rank +
    cumulative offset of earlier partitions. The driver sees one count per
    partition. The partitioned data is localCheckpoint-pinned BEFORE the
    counts job: range boundaries come from sampling seeded by the RDD id,
    so two independent executions could draw different boundaries and the
    offsets would describe the wrong partitioning — the checkpoint makes
    both jobs read the SAME materialized partitions (and the wide rows
    move through the range shuffle exactly once). Ranks are long — int32
    overflows at 10^10 rows."""
    import pyspark.sql.types as T

    npart = max(scored.sparkSession.sparkContext.defaultParallelism, 1)
    parted = (
        scored.repartitionByRange(npart, *order)
        .sortWithinPartitions(*order)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = parted.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n")).collect()
    offsets, acc = {}, 0
    for r in sorted(counts, key=lambda r: r["_pid"]):
        offsets[int(r["_pid"])] = acc
        acc += int(r["_n"])

    schema = T.StructType(list(parted.schema.fields) + [T.StructField(rank_col, T.LongType(), False)])

    def assign(batches):
        seen = 0
        for pdf in batches:  # batches arrive in partition (sorted) order
            if len(pdf):
                base = offsets[int(pdf["_pid"].iloc[0])]
                pdf[rank_col] = range(base + seen + 1, base + seen + 1 + len(pdf))
                seen += len(pdf)
            else:
                pdf[rank_col] = pd.Series([], dtype="int64")
            yield pdf

    return parted.mapInPandas(assign, schema).drop("_pid")


def rank(
    df: DataFrame,
    score: Column | str | None = None,
    direction: str = "desc",
    name: str = "rank",
    k: int | None = None,
    rerank_fn: Callable[[pd.DataFrame], pd.Series] | None = None,
    rerank_window: int = 50,
    picker: Callable[[pd.DataFrame, int], list[int]] | None = None,
    rerank_call_budget: int = 10,
    num_top_items_per_window: int = 3,
    overlap_fraction: float = 0.5,
    score_fn: Callable[[pd.DataFrame], pd.Series] | None = None,
) -> DataFrame:
    """Total ordering by score; adds ``_{name}_rank`` (1-based) and keeps
    ``_{name}_score``.

    Initial ordering: ``score`` (Column expression — the embedding path)
    or ``score_fn`` (Arrow-batched pandas scorer — the plug point for the
    reference's likert / calibrated_embedding raters, rank.py:498,:988: an
    LLM-backed per-doc rating slots in here, composable with
    ``middleware.cached``/``rate_limited``/``validated``).

    With ``k``, only the top-k are returned (TakeOrderedAndProject — no
    global sort). Without ``k``, ranks come from range-partitioned
    sort + partition offsets (distributed; no single-task window).

    Refinement (needs ``k``):

    * ``picker`` — the reference's multi-pass picky-window protocol under
      ``rerank_call_budget`` calls (rank.py:744-870); ``picker(window, n)``
      returns window-relative indices of the best n rows.
    * ``rerank_fn`` — legacy single-pass head-window rescoring.
    """
    if (score is None) == (score_fn is None):
        raise ValueError("rank needs exactly one of score / score_fn")
    if score_fn is not None:
        import pyspark.sql.types as T

        schema = T.StructType(list(df.schema.fields) + [T.StructField(f"_{name}_score", T.DoubleType(), True)])

        def add_score(batches):
            for pdf in batches:
                out = pdf.copy()
                out[f"_{name}_score"] = score_fn(pdf).astype(float).to_numpy()
                yield out

        scored = df.mapInPandas(add_score, schema)
    else:
        sc = F.col(score) if isinstance(score, str) else score
        scored = df.withColumn(f"_{name}_score", sc.cast("double"))
    order = (
        [F.col(f"_{name}_score").desc()] if direction == "desc" else [F.col(f"_{name}_score").asc()]
    ) + [F.xxhash64(*[F.col(c) for c in df.columns])]

    if k is not None:
        top = scored.orderBy(*order).limit(int(k))
        if picker is not None:
            pdf = top.toPandas()
            pdf = _picky_window_protocol(
                pdf, picker, int(k), rerank_call_budget, num_top_items_per_window, overlap_fraction
            )
            pdf[f"_{name}_rank"] = range(1, len(pdf) + 1)
            return df.sparkSession.createDataFrame(pdf)
        if rerank_fn is not None:
            pdf = top.toPandas()
            head = pdf.head(rerank_window).copy()
            head[f"_{name}_score"] = rerank_fn(head).astype(float)
            pdf = pd.concat([head, pdf.iloc[len(head):]])
            pdf = pdf.sort_values(f"_{name}_score", ascending=(direction != "desc"), kind="mergesort")
            pdf[f"_{name}_rank"] = range(1, len(pdf) + 1)
            return df.sparkSession.createDataFrame(pdf)
        # window runs over ≤ k rows (post-limit), so the unpartitioned
        # WindowExec warning is moot — the single partition holds at most
        # k rows by construction. (A constant partition key would NOT
        # suppress it: Catalyst constant-folds the literal out of the spec.)
        return top.withColumn(
            f"_{name}_rank", F.row_number().over(Window.orderBy(*order))
        )

    return _distributed_global_rank(scored, order, f"_{name}_rank")
