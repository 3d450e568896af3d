"""Split + gather operators (SURVEY.md §2.5).

Reference: docetl/operations/split.py (token_count / delimiter chunking)
and docetl/operations/gather.py (peripheral-context re-rendering).

* ``split`` chunks inside a scalar pandas UDF (one Arrow batch per ~10k
  docs, no shuffle) and explodes with ``posexplode`` — chunk ids are
  content-derived hashes, not uuid4 (split.py:74), so replays are
  byte-stable.
* ``gather`` is a grouped apply: each document's chunks sort by
  ``order_key`` inside the group and render with head/middle/tail
  peripheral sections and skipped-character markers (gather.py:113-260
  semantics).
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TOKEN_RE = re.compile(r"\S+\s*")


def _token_chunks(text: str, num_tokens: int) -> list[str]:
    toks = _TOKEN_RE.findall(text or "")
    return ["".join(toks[i : i + num_tokens]) for i in range(0, len(toks), num_tokens)] or [""]


def _delim_chunks(text: str, delimiter: str, group: int) -> list[str]:
    parts = (text or "").split(delimiter)
    return [delimiter.join(parts[i : i + group]) for i in range(0, len(parts), group)]


def split(
    df: DataFrame,
    split_key: str,
    method: str = "token_count",
    num_tokens: int = 100,
    delimiter: str = "\n\n",
    num_splits_to_group: int = 1,
    name: str = "split",
    assume_distinct: bool = False,
) -> DataFrame:
    """One row per chunk; adds ``{split_key}_chunk``, ``{name}_id`` (stable
    per source document), ``{name}_chunk_num`` (1-based).

    Execution contract (NOT a pure transformation): duplicate-row salting
    runs a narrow hash-count probe job at call time, and when duplicates
    exist the input plan executes up to 3x (probe + anti + semi). The
    input plan MUST therefore be deterministic — a non-deterministic
    upstream (unseeded sample, ``F.rand`` filter) can disagree between the
    probe and the anti/semi passes and drop or duplicate chunks. Checkpoint
    (``df.localCheckpoint()``) non-deterministic or expensive upstreams
    before calling ``split``.

    ``assume_distinct=True`` skips the probe entirely: no eager job, one
    single-pass lazy plan — for hot pipelines whose rows are KNOWN
    distinct (e.g. carrying a unique id). The caller owns the claim: with
    exact-duplicate rows present, duplicate ``({name}_id, chunk_num)``
    pairs reach downstream and gather would interleave them."""
    # Chunking is pure Column expressions (split/regexp_extract_all +
    # sequence + slice/array_join): stays in codegen, no Python per row.
    # The _token_chunks/_delim_chunks python forms above are the executable
    # spec these expressions replicate (and what tests golden-check).
    c = F.coalesce(F.col(split_key), F.lit(""))
    if method == "token_count":
        toks = F.regexp_extract_all(c, F.lit(r"\S+\s*"), F.lit(0))
        group, joiner = num_tokens, ""
    elif method == "delimiter":
        toks = F.split(c, re.escape(delimiter), -1)
        group, joiner = num_splits_to_group, delimiter
    else:
        raise ValueError(f"unknown split method {method!r}")
    idx = F.sequence(F.lit(0), F.floor((F.size(toks) - 1) / group).cast("int"))
    chunk_expr = F.when(F.size(toks) == 0, F.array(F.lit(""))).otherwise(
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i * group + 1, group), joiner))
    )

    # id over ALL columns, not just the split text: two different source
    # rows with identical text must stay separate documents downstream
    # (reference split.py:74 uses a per-row uuid4; the full-row hash is the
    # deterministic, replay-stable analogue — same convention as add_uuid).
    # EXACT-duplicate rows would share the hash, giving duplicate
    # (doc_id, chunk_num) pairs that gather would interleave — so duplicates
    # get a per-duplicate rank salt appended to the id. The salt needs row
    # multiplicities, which only a shuffle or extra pass can know; rather
    # than shuffling every wide row (forbidden — see cdc/merge.py design
    # notes), only the duplicate rows (detected via a narrow hash-count agg,
    # usually none) go through a window; unique rows keep the exact
    # unsalted id and never shuffle. Cost: the input plan executes three
    # times (count agg + anti + semi) — checkpoint expensive upstreams
    # first. The multi-pass split (and every content-derived id in this
    # repo) requires a DETERMINISTIC input plan: a non-deterministic
    # upstream (unseeded sample, F.rand filter) can disagree between the
    # probe and the anti/semi passes — checkpoint such inputs first.
    from pyspark.sql import Window

    base_json = F.to_json(F.struct(*[F.col(c) for c in df.columns]))
    with_h = df.withColumn("_h", F.xxhash64(*[F.col(c) for c in df.columns]))
    if assume_distinct:
        out = (
            df.withColumn(f"{name}_id", F.sha2(base_json, 256))
            .withColumn("_chunks", chunk_expr)
            .select(
                *[c for c in df.columns],
                f"{name}_id",
                F.posexplode("_chunks").alias("_pos", f"{split_key}_chunk"),
            )
            .withColumn(f"{name}_chunk_num", (F.col("_pos") + 1).cast("int"))
            .drop("_pos")
        )
        return out
    dup_keys = (
        with_h.groupBy("_h").agg(F.count(F.lit(1)).alias("_c")).filter(F.col("_c") > 1).select("_h")
    )
    if dup_keys.isEmpty():
        # common case: all rows distinct — the probe job above is the only
        # extra cost, and the split plan stays the original single pass
        prepped = with_h.withColumn("_salt", F.lit(1))
    else:
        clean = with_h.join(F.broadcast(dup_keys), "_h", "left_anti").withColumn("_salt", F.lit(1))
        dups = with_h.join(F.broadcast(dup_keys), "_h", "left_semi").withColumn(
            "_salt", F.row_number().over(Window.partitionBy("_h").orderBy("_h"))
        )
        prepped = clean.unionByName(dups)
    doc_id = F.when(F.col("_salt") == 1, F.sha2(base_json, 256)).otherwise(
        F.sha2(F.concat(base_json, F.lit("#"), F.col("_salt").cast("string")), 256)
    )
    out = (
        prepped
        .withColumn(f"{name}_id", doc_id)
        .withColumn("_chunks", chunk_expr)
        .select(
            *[c for c in df.columns],
            f"{name}_id",
            F.posexplode("_chunks").alias("_pos", f"{split_key}_chunk"),
        )
        .withColumn(f"{name}_chunk_num", (F.col("_pos") + 1).cast("int"))
        .drop("_pos")
    )
    return out


def _lvl(x):
    """Header level as int or None (pandas delivers struct ints holding
    NULLs as float NaN)."""
    if x is None or (isinstance(x, float) and x != x):
        return None
    return int(x)


def _hierarchy_fold(header_lists: list) -> list:
    """Reference gather.py:306-320 hierarchy accumulation, exactly —
    including the clearing quirk: a level-l header nulls levels in
    ``range(l+1, len(hierarchy)+1)`` where len COUNTS already-cleared
    entries, so with sparse level sets a deep stale header can survive.
    Returns [(level, header_or_None)] in insertion order."""
    hierarchy: dict = {}
    for headers in header_lists:
        for h in headers or []:
            header, level = h["header"], _lvl(h["level"])
            if not isinstance(header, str):
                header = None  # None / NaN through pandas
            if header and level:
                hierarchy[level] = header
                for lower in range(level + 1, len(hierarchy) + 1):
                    if lower in hierarchy:
                        hierarchy[lower] = None
    return list(hierarchy.items())


def _render_hierarchy_headers(current_headers: list, header_lists: list) -> str:
    """Reference gather.py:262-327: the ``_Current Section:_`` line for
    the current chunk — ancestor headers strictly above the chunk's own
    highest header level, each rendered ``'#' * level + ' ' + header`` and
    joined with `` > ``; empty string when the chunk has no headers or no
    ancestors survive the filter."""
    if not current_headers:
        return ""
    levels = [_lvl(h["level"]) for h in current_headers if _lvl(h["level"]) is not None]
    highest = min(levels) if levels else None
    rendered = [
        f"{'#' * level} {header}"
        for level, header in sorted(_hierarchy_fold(header_lists))
        if header is not None and (highest is None or level < highest)
    ]
    joined = " > ".join(rendered)
    return f"_Current Section:_ {joined}" if joined else ""


def _hierarchy_header_expr(cur, w) -> F.Column:
    """JVM form of ``_render_hierarchy_headers`` over a running window:
    one aggregate fold per chunk over the flattened prior header structs
    (array<struct<header,level>> per chunk). Header counts are tiny, so
    the interpreted fold is cheap; the document's chunks already shuffle
    once for the gather window — no extra exchange."""
    from pyspark.sql import Window

    prior = F.flatten(
        F.collect_list(cur).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    empty_state = F.array().cast("array<struct<level:int,header:string>>")

    def entry(level, header):
        return F.struct(level.cast("int").alias("level"), header.cast("string").alias("header"))

    def step(acc, h):
        valid = (
            h["header"].isNotNull() & (h["header"] != "")
            & h["level"].isNotNull() & (h["level"] != 0)
        )
        exists = F.exists(acc, lambda e: e["level"] == h["level"])
        sz_after = F.size(acc) + F.when(exists, F.lit(0)).otherwise(F.lit(1))
        updated = F.transform(
            acc,
            lambda e: F.when(e["level"] == h["level"], entry(e["level"], h["header"]))
            .when(
                (e["level"] > h["level"]) & (e["level"] <= sz_after),
                entry(e["level"], F.lit(None)),
            )
            .otherwise(e),
        )
        appended = F.when(exists, updated).otherwise(
            F.array_append(updated, entry(h["level"], h["header"]))
        )
        return F.when(valid, appended).otherwise(acc)

    state = F.aggregate(prior, empty_state, step)
    levels = F.filter(F.transform(cur, lambda h: h["level"]), lambda x: x.isNotNull())
    highest = F.array_min(levels)
    entries = F.array_sort(
        F.filter(
            state,
            lambda e: e["header"].isNotNull() & (highest.isNull() | (e["level"] < highest)),
        )
    )
    line = F.concat(
        F.lit("_Current Section:_ "),
        F.array_join(
            F.transform(
                entries,
                lambda e: F.concat(
                    F.array_join(F.array_repeat(F.lit("#"), e["level"]), ""),
                    F.lit(" "),
                    e["header"],
                ),
            ),
            " > ",
        ),
    )
    return F.when((F.size(cur) > 0) & (F.size(entries) > 0), line)


def _render_side(chunks: list[tuple[int, str]], cfg: dict, label: str) -> list[str]:
    """Head/middle/tail rendering with a skipped-characters marker
    (gather.py peripheral_chunks semantics)."""
    if not chunks:
        return []
    head_n = int(cfg.get("head", {}).get("count", 0))
    tail_n = int(cfg.get("tail", {}).get("count", 0))
    head = chunks[:head_n] if head_n else []
    tail = chunks[len(head) :][-tail_n:] if tail_n else []
    middle = chunks[len(head) : len(chunks) - len(tail)]
    lines = [f"--- {label} Context ---"]
    for _, c in head:
        lines.append(c)
    if middle:
        skipped = sum(len(c) for _, c in middle)
        lines.append(f"[... {skipped} characters skipped ...]")
    for _, c in tail:
        lines.append(c)
    lines.append(f"--- End {label} Context ---")
    return lines


def gather(
    df: DataFrame,
    content_key: str,
    doc_id_key: str,
    order_key: str,
    peripheral_chunks: dict | None = None,
    doc_header_key: str | None = None,
    main_chunk_start: str = "--- Begin Main Chunk ---",
    main_chunk_end: str = "--- End Main Chunk ---",
) -> DataFrame:
    """Re-attach surrounding context to each chunk; adds
    ``{content_key}_rendered``.

    The common config — previous.tail.count + next.head.count — renders
    entirely with window functions (lag-style collect_list frames +
    running length sums + concat_ws), one shuffle, zero Python: the
    grouped-pandas renderer costs ~2ms of DataFrame-construction overhead
    PER DOCUMENT, which dominates at millions of documents. Exotic
    configs (head+tail on one side, middle summaries) fall back to the
    exact pandas renderer; both produce identical strings (oracle-checked).
    """
    peripheral = peripheral_chunks or {"previous": {"tail": {"count": 1}}, "next": {"head": {"count": 1}}}
    out_field = f"{content_key}_rendered"

    # doc_header_key dispatch: a string column is the flat legacy header
    # (prepended whole); an array<struct<header,level>> column is the
    # reference's hierarchical form (gather.py:262-327) — the accumulated
    # "_Current Section:_" line renders between the previous context and
    # the main chunk, exactly where render_chunk_with_context puts it.
    hierarchical = False
    if doc_header_key:
        hdr_type = df.schema[doc_header_key].dataType
        hierarchical = isinstance(hdr_type, T.ArrayType) and isinstance(
            hdr_type.elementType, T.StructType
        )

    prev_cfg, next_cfg = peripheral.get("previous"), peripheral.get("next")
    simple = (
        set(peripheral) <= {"previous", "next"}
        and (prev_cfg is None or (set(prev_cfg) == {"tail"} and set(prev_cfg["tail"]) <= {"count"}))
        and (next_cfg is None or (set(next_cfg) == {"head"} and set(next_cfg["head"]) <= {"count"}))
    )
    if simple:
        from pyspark.sql import Window

        w = Window.partitionBy(doc_id_key).orderBy(order_key)
        c = F.coalesce(F.col(content_key), F.lit(""))
        parts: list = []
        if doc_header_key and not hierarchical:
            parts.append(F.when(F.col(doc_header_key).isNotNull(), F.col(doc_header_key).cast("string")))
        if prev_cfg:
            p = int(prev_cfg["tail"].get("count", 0))
            prev_cnt = F.row_number().over(w) - 1
            tail_arr = F.collect_list(c).over(w.rowsBetween(-max(p, 1), -1)) if p else F.array()
            skipped = F.sum(F.length(c)).over(w.rowsBetween(Window.unboundedPreceding, -(p + 1)))
            parts += [
                F.when(prev_cnt > 0, F.lit("--- Previous Context ---")),
                F.when(prev_cnt > p, F.concat(F.lit("[... "), skipped.cast("string"), F.lit(" characters skipped ...]"))),
                F.when((prev_cnt > 0) & F.lit(p > 0), F.array_join(tail_arr, "\n")),
                F.when(prev_cnt > 0, F.lit("--- End Previous Context ---")),
            ]
        if hierarchical:
            no_hdrs = F.array().cast(hdr_type.simpleString())
            parts.append(_hierarchy_header_expr(F.coalesce(F.col(doc_header_key), no_hdrs), w))
        parts += [F.lit(main_chunk_start), c, F.lit(main_chunk_end)]
        if next_cfg:
            n = int(next_cfg["head"].get("count", 0))
            next_cnt = F.count(F.lit(1)).over(Window.partitionBy(doc_id_key)) - F.row_number().over(w)
            head_arr = F.collect_list(c).over(w.rowsBetween(1, max(n, 1))) if n else F.array()
            nskip = F.sum(F.length(c)).over(w.rowsBetween(n + 1, Window.unboundedFollowing))
            parts += [
                F.when(next_cnt > 0, F.lit("--- Next Context ---")),
                F.when((next_cnt > 0) & F.lit(n > 0), F.array_join(head_arr, "\n")),
                F.when(next_cnt > n, F.concat(F.lit("[... "), nskip.cast("string"), F.lit(" characters skipped ...]"))),
                F.when(next_cnt > 0, F.lit("--- End Next Context ---")),
            ]
        return df.withColumn(out_field, F.concat_ws("\n", *parts))
    schema = T.StructType(list(df.schema.fields) + [T.StructField(out_field, T.StringType(), True)])
    cols = [f.name for f in schema.fields]

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_key, kind="mergesort").reset_index(drop=True)
        texts = pdf[content_key].fillna("").tolist()
        if hierarchical:
            header_lists = [
                [h if isinstance(h, dict) else dict(h) for h in hl]
                if hl is not None and len(hl)
                else []
                for hl in pdf[doc_header_key]
            ]
        rendered = []
        for i in range(len(pdf)):
            parts: list[str] = []
            if doc_header_key and not hierarchical and doc_header_key in pdf.columns and pd.notna(pdf[doc_header_key].iloc[i]):
                parts.append(str(pdf[doc_header_key].iloc[i]))
            prev = list(enumerate(texts[:i]))
            nxt = list(enumerate(texts[i + 1 :], start=i + 1))
            if "previous" in peripheral:
                parts += _render_side(prev, peripheral["previous"], "Previous")
            if hierarchical:
                line = _render_hierarchy_headers(header_lists[i], header_lists[: i + 1])
                if line:
                    parts.append(line)
            parts += [main_chunk_start, texts[i], main_chunk_end]
            if "next" in peripheral:
                parts += _render_side(nxt, peripheral["next"], "Next")
            rendered.append("\n".join(parts))
        pdf[out_field] = rendered
        return pdf[cols]

    return df.groupBy(doc_id_key).applyInPandas(run, schema=schema)
