"""Stage middleware: cache + rate limiting around vectorized transform fns.

The reference wraps every LLM call in a disk cache keyed on the call
fingerprint (docetl/operations/utils/cache.py:86-105) and token/call-bucket
rate limiters (docetl/ratelimiter.py, acquired at
docetl/operations/utils/api.py:343-351). In this engine the unit of
"semantic work" is an Arrow batch through a ``pd.DataFrame -> pd.DataFrame``
transform, so both middlewares wrap THAT: each executor task caches /
throttles per batch, which is exactly how an external-API-backed stage
(the pluggable LLM path) must behave at 1000 executors — per-task quotas,
content-keyed result reuse across retries and replays.

Both wrappers preserve determinism: cache hits return byte-identical
results; rate limiting only inserts sleeps.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import time
from typing import Callable

import pandas as pd

BatchFn = Callable[[pd.DataFrame], pd.DataFrame]


def _cell_bytes(v) -> bytes:
    """Stable byte form for values hash_pandas_object rejects (lists,
    dicts, ndarrays — i.e. Arrow array<>/struct<> columns)."""
    import json

    return json.dumps(
        v, sort_keys=True, default=lambda o: o.tolist() if hasattr(o, "tolist") else str(o)
    ).encode()


def _batch_key(pdf: pd.DataFrame, config_key: str) -> str:
    """Content fingerprint of (input batch, stage config) — the analogue of
    the reference's md5 over (model, op_type, messages, schema, ...).

    Arrow batches of array/struct columns arrive as object columns holding
    unhashable values; those hash column-by-column through a canonical JSON
    byte form instead of pd.util.hash_pandas_object."""
    h = hashlib.sha256(config_key.encode())
    h.update(str(list(pdf.columns)).encode())
    try:
        h.update(pd.util.hash_pandas_object(pdf, index=False).values.tobytes())
    except TypeError:
        for c in pdf.columns:
            try:
                h.update(pd.util.hash_pandas_object(pdf[c], index=False).values.tobytes())
            except TypeError:
                for v in pdf[c]:
                    h.update(_cell_bytes(v))
    return h.hexdigest()


def cached(fn: BatchFn, cache_dir: str, config_key: str = "") -> BatchFn:
    """Disk-cache a batch transform: a batch already processed under the
    same config returns its stored result without running ``fn``. Replays,
    retried tasks, and resumed streams hit the cache instead of re-paying
    the (LLM) cost — the engine-level version of cache.py:86-105.

    ``cache_dir`` must be reachable from executors (local FS in local
    mode; a shared mount or fuse path on a cluster).
    """
    os.makedirs(cache_dir, exist_ok=True)

    def wrapped(pdf: pd.DataFrame) -> pd.DataFrame:
        key = _batch_key(pdf, config_key)
        path = os.path.join(cache_dir, f"{key}.pkl")
        if os.path.exists(path):
            with open(path, "rb") as f:
                return pickle.load(f)
        out = fn(pdf)
        tmp = f"{path}.tmp-{os.getpid()}"
        with open(tmp, "wb") as f:
            pickle.dump(out, f)
        os.replace(tmp, path)  # atomic publish; racing tasks write same bytes
        return out

    return wrapped


def rate_limited(fn: BatchFn, rows_per_sec: float) -> BatchFn:
    """Throttle a batch transform to ``rows_per_sec`` PER TASK — the
    per-executor quota shape of ratelimiter.py (a global limit divides by
    planned parallelism, exactly like per-worker API-key budgets)."""
    state = {"t": 0.0}

    def wrapped(pdf: pd.DataFrame) -> pd.DataFrame:
        now = time.monotonic()
        earliest = state["t"]
        if earliest > now:
            time.sleep(earliest - now)
        state["t"] = max(earliest, now) + len(pdf) / rows_per_sec
        return fn(pdf)

    return wrapped


def validated(
    fn: BatchFn,
    rule: Callable[[pd.DataFrame], "pd.Series"],
    num_retries: int = 2,
    on_fail: str = "keep",
) -> BatchFn:
    """Validation-retry wrapper (reference api.py:465-510 + the rule
    evaluator validation.py:98-107): run ``fn``, evaluate ``rule`` per
    output row, re-run ONLY the failing rows up to ``num_retries`` times,
    exactly like the reference re-prompts with feedback appended.

    ``fn`` must be row-aligned (one output row per input row — the map
    contract). Retried input rows carry a ``_retry_attempt`` int column
    (1-based) — the engine's analogue of the feedback message: a
    deterministic transform can branch on it; an LLM-backed transform
    renders it into the re-prompt. Rows still failing after the budget:
    ``keep`` (reference default — output returned, validation recorded),
    ``drop`` (discard), or ``raise``.
    """
    if on_fail not in ("keep", "drop", "raise"):
        raise ValueError(f"on_fail must be keep|drop|raise, got {on_fail!r}")

    def wrapped(pdf: pd.DataFrame) -> pd.DataFrame:
        out = fn(pdf)
        if len(out) != len(pdf):
            raise ValueError("validated() needs a row-aligned fn (one output row per input row)")
        out = out.reset_index(drop=True)
        failing = ~rule(out).astype(bool).reset_index(drop=True)
        for attempt in range(1, num_retries + 1):
            if not failing.any():
                break
            retry_in = pdf.reset_index(drop=True)[failing].copy()
            retry_in["_retry_attempt"] = attempt
            retry_out = fn(retry_in).reset_index(drop=True)
            if len(retry_out) != len(retry_in):
                raise ValueError("validated() retry fn broke row alignment")
            retry_out = retry_out.drop(columns=["_retry_attempt"], errors="ignore")
            if set(retry_out.columns) != set(out.columns):
                raise ValueError(
                    "validated() retry fn changed the output columns: "
                    f"expected {sorted(out.columns)}, got {sorted(retry_out.columns)}"
                )
            # assign column-by-column (never through a mixed-dtype ndarray,
            # which would silently upcast every output column to object)
            fail_idx = out.index[failing.to_numpy()]
            for c in out.columns:
                out.loc[fail_idx, c] = retry_out[c].to_numpy()
            failing_sub = ~rule(out[failing.to_numpy()]).astype(bool).to_numpy()
            idx = failing[failing].index
            failing.loc[idx] = failing_sub
        if failing.any():
            if on_fail == "raise":
                raise ValueError(f"{int(failing.sum())} rows failed validation after {num_retries} retries")
            if on_fail == "drop":
                return out[~failing.to_numpy()].reset_index(drop=True)
        return out

    return wrapped


def gleaned(
    fn: BatchFn,
    should_refine: Callable[[pd.DataFrame], "pd.Series"],
    refine: Callable[[pd.DataFrame, pd.DataFrame, int], pd.DataFrame],
    num_rounds: int = 2,
) -> BatchFn:
    """Gleaning wrapper — the bounded refine loop (reference
    api.py:307-462): after the main transform, a judge
    (``should_refine``, per-row bool over the output — the engine form of
    the validator's ``should_refine`` verdict) selects rows to improve;
    ``refine(input_rows, current_output_rows, round)`` produces their next
    version. At most ``num_rounds`` rounds, early exit when nothing needs
    refinement — byte-identical to the reference's round/break protocol.
    Row-aligned like ``validated``. Composes under ``cached`` so a replay
    pays zero refine cost.
    """

    def wrapped(pdf: pd.DataFrame) -> pd.DataFrame:
        src = pdf.reset_index(drop=True)
        out = fn(src)
        if len(out) != len(src):
            raise ValueError("gleaned() needs a row-aligned fn (one output row per input row)")
        out = out.reset_index(drop=True)
        for rnd in range(num_rounds):
            mask = should_refine(out).astype(bool).reset_index(drop=True)
            if not mask.any():
                break  # reference: should_glean false -> break (api.py:341)
            refined = refine(src[mask.to_numpy()], out[mask.to_numpy()], rnd).reset_index(drop=True)
            if len(refined) != int(mask.sum()):
                raise ValueError("gleaned() refine broke row alignment")
            out.loc[mask.to_numpy(), list(refined.columns)] = refined.to_numpy()
        return out

    return wrapped


def calibrate(
    make_fn: Callable[[dict], BatchFn],
    config: dict,
    sample: pd.DataFrame,
    improve: Callable[[pd.DataFrame, pd.DataFrame, dict], dict],
    num_rounds: int = 1,
) -> tuple[BatchFn, dict]:
    """Prompt-calibration loop (reference map.py:182-253 + :288): before
    the production run, execute the UNcalibrated transform on a small
    driver-side ``sample``, let ``improve(sample_in, sample_out, config)``
    return an adjusted config (the reference asks an LLM to rewrite the
    prompt given the sampled input/output pairs; a deterministic improver
    slots in the same way), and build the production transform from the
    final config. Returns ``(fn, final_config)`` so the calibrated config
    can be logged/persisted — the reference stores it back into
    ``self.config["prompt"]``.

    ``sample`` is bounded by the caller (reference num_calibration_docs,
    default 10) — calibration cost never scales with the table.
    """
    cfg = dict(config)
    for _ in range(max(0, int(num_rounds))):
        out = make_fn(cfg)(sample.reset_index(drop=True))
        new_cfg = improve(sample.reset_index(drop=True), out.reset_index(drop=True), dict(cfg))
        if new_cfg == cfg:
            break  # converged — the improver kept the config
        cfg = new_cfg
    return make_fn(cfg), cfg


def observed(fn: BatchFn, name: str, config_key: str = "") -> BatchFn:
    """Emit the ``_observability_{name}`` system column (reference
    map.py:415-419 records the rendered prompt per output row when
    ``enable_observability`` is set; reduce.py:345 likewise). The
    engine's unit of semantic work is the Arrow batch, so the recorded
    provenance is the batch-level analogue of the prompt: stage name,
    stage config key, the content fingerprint of the input batch (the
    same key ``cached`` stores results under — so an observability value
    links an output row to its cache entry), and the batch row count,
    serialized as one JSON string per row.

    Compose INSIDE ``cached`` (``cached(observed(fn, ...), ...)``) so the
    column is part of the cached result, or outside to re-stamp on every
    run. The declared ``as_stage`` schema must include
    ``_observability_{name} string``."""
    import json

    col = f"_observability_{name}"

    def wrapped(pdf: pd.DataFrame) -> pd.DataFrame:
        fingerprint = _batch_key(pdf, config_key)
        out = fn(pdf).copy()
        out[col] = json.dumps(
            {"stage": name, "config_key": config_key,
             "batch_fingerprint": fingerprint, "rows_in": int(len(pdf))},
            sort_keys=True,
        )
        return out

    return wrapped


def as_stage(fn: BatchFn, schema) -> Callable:
    """Lift a (possibly wrapped) batch fn into a merge-apply TransformStage:
    ``df -> df.mapInPandas(fn)`` with an explicit output schema."""

    def stage(df):
        def run(batches):
            for pdf in batches:
                yield fn(pdf)

        return df.mapInPandas(run, schema=schema)

    return stage
