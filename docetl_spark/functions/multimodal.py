"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata structs, processed via ``mapInPandas`` Arrow
batches.

The container has no image/audio codecs, so the DECODE step is stubbed
behind ``set_decoder`` (tests install a deterministic fake); everything
Spark-side — schemas, batch shapes, partition sizing, UDF signatures — is
real. Mirrors the reference's parsing-tool fan-out
(docetl/dataset.py:250-315, parsing_tools.py: whisper/azure_di/paddleocr),
where heavy decoders are similarly external services.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType(), True),   # image/audio/video
        T.StructField("format", T.StringType(), True),       # png/jpeg/wav/mp4...
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
    ]
)

# decoder: bytes -> np.ndarray (H,W,C) for images / (n,) for audio.
_DECODER: Callable[[bytes, str], np.ndarray] | None = None


def set_decoder(fn: Callable[[bytes, str], np.ndarray] | None) -> None:
    global _DECODER
    _DECODER = fn


FEATURE_SCHEMA = "mean double, std double, p05 double, p95 double, n_values long"


def extract_features(df: DataFrame, binary_col: str, meta_col: str, out_prefix: str = "feat") -> DataFrame:
    """Decode each blob and emit summary features — the shape every real
    embed/resize/frame-sample stage shares: binary in, fixed-width numeric
    struct out, one Python call per Arrow batch.

    The decoder is captured BY VALUE at plan-construction time (a
    module-level global would not exist in executor worker processes)."""
    decoder = _DECODER  # close over the current decoder; cloudpickled to workers
    fields = [(f"{out_prefix}_mean", "double"), (f"{out_prefix}_std", "double"),
              (f"{out_prefix}_p05", "double"), (f"{out_prefix}_p95", "double"),
              (f"{out_prefix}_n", "long")]
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(n, T.DoubleType() if t == "double" else T.LongType(), True) for n, t in fields]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if decoder is None:
            raise NotImplementedError(
                "no media codec in this environment: install one with "
                "docetl_spark.functions.multimodal.set_decoder (tests use a "
                "deterministic fake)"
            )
        for pdf in batches:
            feats = {n: [] for n, _ in fields}
            for blob, meta in zip(pdf[binary_col], pdf[meta_col]):
                fmt = (meta or {}).get("format") if isinstance(meta, dict) else getattr(meta, "format", None)
                arr = decoder(bytes(blob), fmt or "").astype("float64").ravel()
                feats[f"{out_prefix}_mean"].append(float(arr.mean()) if arr.size else None)
                feats[f"{out_prefix}_std"].append(float(arr.std()) if arr.size else None)
                feats[f"{out_prefix}_p05"].append(float(np.percentile(arr, 5)) if arr.size else None)
                feats[f"{out_prefix}_p95"].append(float(np.percentile(arr, 95)) if arr.size else None)
                feats[f"{out_prefix}_n"].append(int(arr.size))
            for n, _ in fields:
                pdf[n] = feats[n]
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def frame_sample(df: DataFrame, binary_col: str, meta_col: str, every_ms: int = 1000) -> DataFrame:
    """Video -> one row per sampled frame timestamp (plumbing: the 1->N
    fan-out shape; frame decode itself is behind the stub)."""
    n_frames = F.greatest(
        (F.col(f"{meta_col}.duration_ms") / F.lit(every_ms)).cast("int"), F.lit(1)
    )
    return (
        df.withColumn("_frame_idx", F.explode(F.sequence(F.lit(0), n_frames - 1)))
        .withColumn("frame_ts_ms", F.col("_frame_idx") * F.lit(every_ms))
        .drop("_frame_idx")
    )
