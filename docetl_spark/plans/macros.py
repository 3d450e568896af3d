"""Deterministic pipeline-rewrite macros — the mechanical residue of the
reference's agentic optimizer.

The reference ships ``docetl build``, whose highest-value rewrite is doc
chunking: replace one Map over long documents with
``Split -> Gather -> [Sample] -> Map -> Reduce``
(docetl/reasoning_optimizer/directives/doc_chunking.py:16-429, applied by
optimizers/map_optimizer/optimizer.py:240-260). In the reference an LLM
synthesizes the sub-prompt and reduce-prompt; everything else — operator
names, key wiring, gather/sample defaults — is deterministic config
surgery (``DocumentChunkingDirective.apply``, doc_chunking.py:300-428).
This module implements exactly that deterministic part: the caller
supplies the chunk-level map expressions and the aggregation expressions
(the deterministic analogue of the two synthesized prompts), and the
macro emits the composed plan with the reference's naming and wiring:

* ``split_{target}`` — split ``split_key`` (token_count by default),
  emitting ``{split}_id`` / ``{split}_chunk_num`` / ``{split_key}_chunk``
* ``gather_{target}`` — peripheral context around each chunk; default
  config ``{"previous": {"tail": {"count": 1}}}`` (doc_chunking.py:352)
* ``sample_{target}_chunks`` — optional, stratified by the split doc id
  (doc_chunking.py:389-419); omit to process every chunk
* ``map_{target}_chunks`` — chunk-level map over
  ``{split_key}_chunk_rendered``
* ``reduce_{target}`` — per-source-document aggregation keyed on
  ``{split}_id`` (order-sensitive aggs express the reference's
  ``associative: False`` via max_by/array_sort over ``chunk_num``)

Scale shape: the whole composed plan is narrow until the final reduce —
split/gather shuffle once on the split id (gather's window partitioning),
and the reduce reuses the same key, so AQE exchange-reuse makes the
aggregation effectively free. No driver loops, no eager jobs.
"""

from __future__ import annotations

from copy import deepcopy


def doc_chunking(
    target: str,
    *,
    split_key: str,
    chunk_size: int = 128,
    method: str = "token_count",
    delimiter: str = "\n\n",
    num_splits_to_group: int = 1,
    sub_expr: dict[str, str],
    reduce_aggs: dict[str, str],
    gather_config: dict | None = None,
    sampling: dict | None = None,
) -> list[dict]:
    """Emit the composed op sequence for one chunked map.

    ``sub_expr`` — SQL expressions for the chunk-level map (reference
    sub_prompt analogue); they see ``{split_key}_chunk``,
    ``{split_key}_chunk_rendered``, ``{split}_chunk_num`` and every
    pass-through column. ``reduce_aggs`` — SQL aggregate expressions for
    the per-document combine (reduce_prompt analogue). ``sampling`` —
    ``{"method": ..., "samples": ...}`` or
    ``{"samples_per_group": n}``; always stratified by the split doc id
    exactly like the reference (extra ``stratify_key`` is appended)."""
    split_name = f"split_{target}"
    split_op: dict = {
        "op": "split",
        "name": split_name,
        "split_key": split_key,
        "method": method,
    }
    if method == "token_count":
        split_op["num_tokens"] = chunk_size
    else:
        split_op["delimiter"] = delimiter
        split_op["num_splits_to_group"] = num_splits_to_group

    gather_op = {
        "op": "gather",
        "name": f"gather_{target}",
        "content_key": f"{split_key}_chunk",
        "doc_id_key": f"{split_name}_id",
        "order_key": f"{split_name}_chunk_num",
        # reference default when the agent supplies no config
        # (doc_chunking.py:352)
        "peripheral_chunks": deepcopy(gather_config) if gather_config else {"previous": {"tail": {"count": 1}}},
    }

    ops: list[dict] = [split_op, gather_op]
    if sampling:
        stratify = [f"{split_name}_id"]
        if sampling.get("stratify_key"):
            stratify.append(sampling["stratify_key"])
        sample_op = {
            "op": "sample",
            "name": f"sample_{target}_chunks",
            "method": sampling.get("method", "uniform"),
            "samples": sampling.get("samples"),
            "stratify_key": stratify if len(stratify) > 1 else stratify[0],
        }
        if sampling.get("samples_per_group") is not None:
            sample_op["samples_per_group"] = sampling["samples_per_group"]
        if sampling.get("random_state") is not None:
            sample_op["random_state"] = sampling["random_state"]
        ops.append(sample_op)

    ops.append({"op": "map", "name": f"map_{target}_chunks", "expr": dict(sub_expr)})
    ops.append({
        "op": "reduce",
        "name": f"reduce_{target}",
        "reduce_key": f"{split_name}_id",
        "aggs": dict(reduce_aggs),
    })
    return ops


def rewrite_chunked_maps(operations: list[dict]) -> list[dict]:
    """Expand every ``{"op": "chunked_map", ...}`` entry in an op list
    into its composed sequence — the config-level form of the directive.

    A ``chunked_map`` op carries the same keys as :func:`doc_chunking`
    plus ``name`` (the target op name). Mirrors
    ``DocumentChunkingDirective.apply``'s in-place ops-list replacement
    (doc_chunking.py:313-428) without the LLM instantiation step."""
    out: list[dict] = []
    for cfg in operations:
        if cfg.get("op") != "chunked_map":
            out.append(cfg)
            continue
        kwargs = {k: v for k, v in cfg.items() if k not in ("op", "name")}
        out.extend(doc_chunking(cfg.get("name", "map"), **kwargs))
    return out
