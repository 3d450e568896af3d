"""Deduplication suite for web-scale training-data pipelines.

Five strategies, all shuffle-lean and expressible as Spark plans:

* ``exact_dedup``        — fingerprint groupBy (one shuffle, map-side combine)
* ``minhash_signature``  + ``minhash_lsh_pairs`` — shingle -> minhash ->
  banded LSH bucket join -> signature-similarity verify (the standard
  MinHashLSH pipeline; signatures are pure Column expressions:
  ``array_min(transform(shingles, xxhash64(...)))`` per permutation)
* ``simhash``            — 64-bit simhash via a vectorized numpy pandas UDF
  (bit-vote matrix math; built-ins can't express per-bit votes cleanly)
* ``ngram_jaccard_pairs``— exact Jaccard over shingle sets for candidate
  pairs (array_intersect/array_union)
* ``embedding_dup_pairs``— cosine near-duplicates via seeded random-
  hyperplane LSH buckets + exact cosine verify

Near-dup *removal* composes any pair generator with
``resolve_ops.connected_components`` and keeps each component's min id —
see ``dedup_by_pairs``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from docetl_spark.functions.text import fingerprint, tokens
from docetl_spark.functions.vectors import cosine, l2_normalize


# -- exact ------------------------------------------------------------------

def exact_dedup(df: DataFrame, text_col: str, normalize: bool = True) -> DataFrame:
    """Keep one row per exact (normalized) text: struct-min per fingerprint
    (single shuffle with partial combine — no window, no sort)."""
    fp = fingerprint(text_col, normalize=normalize)
    packed = F.struct(*[F.col(c) for c in df.columns])
    won = df.groupBy(fp.alias("_fp")).agg(F.min(packed).alias("_w"))
    return won.select(*[F.col(f"_w.{c}").alias(c) for c in df.columns])


# -- shingles / minhash -------------------------------------------------------

def shingles(text: Column | str, n: int = 3, max_shingles: int = 512) -> Column:
    """Word n-gram shingles (lowercased), capped for bounded signatures."""
    toks = F.transform(tokens(text), lambda t: F.lower(t))
    toks = F.slice(toks, 1, max_shingles + n)
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - n + 1, F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " ")))


def minhash_signature(text: Column | str, num_hashes: int = 32, shingle_n: int = 3) -> Column:
    """Array of ``num_hashes`` min-hashes — one seeded xxhash64 family per
    permutation, min over the shingle set. Pure codegen.

    Single-pass fold: the shingle array is referenced ONCE and each
    shingle contributes all ``num_hashes`` seeded hashes into an
    elementwise-min accumulator. (The naive form — num_hashes separate
    ``array_min(transform(shingles, ...))`` columns — re-evaluates the
    shingle construction per hash when common-subexpression elimination
    doesn't catch it, a num_hashes× blowup.)"""
    sh = shingles(text, n=shingle_n)
    init = F.array_repeat(F.lit(2**63 - 1).cast("long"), num_hashes)
    return F.aggregate(
        sh,
        init,
        lambda acc, s: F.zip_with(
            acc,
            F.array(*[F.xxhash64(s, F.lit(i)) for i in range(num_hashes)]),
            lambda a, h: F.least(a, h),
        ),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    threshold: float = 0.7,
) -> DataFrame:
    """Candidate near-dup pairs (_id1,_id2,match_score) via banded MinHash
    LSH: rows agreeing on ANY band's row-slice land in a bucket; bucket
    self-join yields candidates; estimated Jaccard = fraction of equal
    signature positions, filtered at ``threshold``.

    Scale: the only wide ops are the bucket groupBy-join (keys are
    band hashes — uniform) and the verify join on (id, signature).
    """
    rows_per_band = num_hashes // bands
    sig = df.select(F.col(id_col).alias("_id"), minhash_signature(F.col(text_col), num_hashes, shingle_n).alias("_sig"))
    sig = sig.persist()
    band_cols = [
        F.xxhash64(F.concat_ws(",", *[F.element_at("_sig", b * rows_per_band + r + 1).cast("string") for r in range(rows_per_band)]), F.lit(b)).alias("_bucket")
        for b in range(bands)
    ]
    banded = sig.select("_id", F.explode(F.array(*band_cols)).alias("_bucket"))
    cands = (
        banded.alias("a")
        .join(banded.alias("b"), on="_bucket")
        .filter(F.col("a._id") < F.col("b._id"))
        .select(F.col("a._id").alias("_id1"), F.col("b._id").alias("_id2"))
        .distinct()
    )
    s1 = sig.select(F.col("_id").alias("_id1"), F.col("_sig").alias("_sig1"))
    s2 = sig.select(F.col("_id").alias("_id2"), F.col("_sig").alias("_sig2"))
    est = F.aggregate(
        F.zip_with("_sig1", "_sig2", lambda x, y: (x == y).cast("int")), F.lit(0), lambda a, x: a + x
    ) / F.lit(num_hashes)
    return (
        cands.join(s1, "_id1").join(s2, "_id2")
        .withColumn("match_score", est.cast("double"))
        .filter(F.col("match_score") >= threshold)
        .select("_id1", "_id2", "match_score")
    )


# -- simhash ------------------------------------------------------------------

@F.pandas_udf(T.LongType())
def _simhash64(texts: pd.Series) -> pd.Series:
    """64-bit SimHash: per-token 64-bit hash, per-bit +1/-1 votes, sign ->
    bit. Vectorized numpy over the Arrow batch (the documented slow-path
    exception: per-bit votes are not expressible as builtins)."""
    import hashlib

    def h64(tok: str) -> int:
        # md5, NOT builtin hash(): python str hash is per-process salted;
        # md5 is also available in external SQL engines, which lets the
        # driver's DuckDB oracle reproduce signatures bit-for-bit
        return int.from_bytes(hashlib.md5(tok.encode("utf-8")).digest()[:8], "little")

    out = np.zeros(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts.fillna("")):
        toks = t.lower().split()
        if not toks:
            continue
        hs = np.array([h64(tok) for tok in toks], dtype=np.uint64)
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int32)
        votes = (2 * bits - 1).sum(axis=0)
        out[i] = np.packbits((votes > 0).astype(np.uint8), bitorder="little").view(np.uint64)[0]
    return pd.Series(out.astype(np.int64))


def simhash(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return _simhash64(c)


def simhash_pairs(df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3, blocks: int = 4) -> DataFrame:
    """Near-dup pairs by SimHash: block-permutation blocking (split the 64
    bits into ``blocks`` chunks; dups within ``max_hamming`` agree on at
    least one chunk when max_hamming < blocks) + exact popcount verify."""
    width = 64 // blocks
    sh = df.select(F.col(id_col).alias("_id"), simhash(text_col).alias("_sh"))
    chunk_cols = [
        F.xxhash64(F.shiftrightunsigned(F.col("_sh"), b * width).bitwiseAND(F.lit((1 << width) - 1)), F.lit(b)).alias("_bucket")
        for b in range(blocks)
    ]
    banded = sh.select("_id", "_sh", F.explode(F.array(*chunk_cols)).alias("_bucket"))
    cands = (
        banded.alias("a").join(banded.alias("b"), "_bucket")
        .filter(F.col("a._id") < F.col("b._id"))
        .select(F.col("a._id").alias("_id1"), F.col("a._sh").alias("_sh1"),
                F.col("b._id").alias("_id2"), F.col("b._sh").alias("_sh2"))
        .distinct()
    )
    ham = F.bit_count(F.col("_sh1").bitwiseXOR(F.col("_sh2")))
    return cands.withColumn("hamming", ham).filter(F.col("hamming") <= max_hamming).select("_id1", "_id2", "hamming")


# -- exact jaccard over candidate pairs --------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, shingle_n: int = 3, threshold: float = 0.5,
    candidates: DataFrame | None = None, num_hashes: int = 32, bands: int = 8,
) -> DataFrame:
    """Exact n-gram Jaccard (array_intersect/array_union) over candidate
    pairs (from MinHash LSH unless given)."""
    if candidates is None:
        candidates = minhash_lsh_pairs(df, id_col, text_col, num_hashes=num_hashes, bands=bands,
                                       shingle_n=shingle_n, threshold=0.0)
    sh = df.select(F.col(id_col).alias("_id"), shingles(text_col, shingle_n).alias("_sh"))
    s1 = sh.select(F.col("_id").alias("_id1"), F.col("_sh").alias("_sh1"))
    s2 = sh.select(F.col("_id").alias("_id2"), F.col("_sh").alias("_sh2"))
    # rounded BEFORE the threshold: the 6dp contract makes the kept pair
    # set identical across engines (float noise near the cut can't flip
    # membership between Spark and an external SQL oracle)
    jac = F.round(
        F.size(F.array_intersect("_sh1", "_sh2")) / F.greatest(F.size(F.array_union("_sh1", "_sh2")), F.lit(1)), 6
    )
    return (
        candidates.select("_id1", "_id2").join(s1, "_id1").join(s2, "_id2")
        .withColumn("jaccard", jac.cast("double"))
        .filter(F.col("jaccard") >= threshold)
        .select("_id1", "_id2", "jaccard")
    )


# -- embedding near-dups -------------------------------------------------------

def hyperplane_bucket(vec_col: Column | str, dim: int, planes: int = 12, seed: int = 42) -> Column:
    """Sign-bit LSH bucket id from ``planes`` seeded pseudo-random
    hyperplanes (deterministic: plane coefficients derive from xxhash of
    (seed, plane, dim) on the driver)."""
    return F.element_at(hyperplane_bucket_array(vec_col, dim, planes, [seed]), 1)


def hyperplane_bucket_array(
    vec_col: Column | str, dim: int, planes: int, seeds: list[int]
) -> Column:
    """Bucket ids for several independent tables as one array column —
    element t is the bucket for ``seeds[t]``.

    Vectorized numpy pandas UDF — the justified-UDF case (like simhash):
    len(seeds)*planes dot products per row are a dense numeric kernel.
    The Column-expression forms both lose: a zip_with/aggregate fold per
    plane is CodegenFallback (interpreted — tables*planes*dim lambda
    evals per row), and fully unrolling the arithmetic overflows janino's
    64KB method limit (measured: 11s resp. 88s for what numpy does in
    milliseconds). Accumulation is an explicit ascending-dim ufunc loop,
    NOT BLAS matmul: deterministic under any thread count and
    BIT-identical to the original sequential fold (same add order), so
    every recorded bucket value is preserved."""
    import pyarrow as pa
    from pyspark.sql.functions import ArrowUDFType, arrow_udf

    mats = [np.random.RandomState(s).randn(planes, dim) for s in seeds]
    m = np.concatenate(mats, axis=0).T.copy()  # dim x (tables*planes)
    n_tables = len(seeds)
    pows = (2 ** np.arange(planes)[::-1]).astype(np.int64)

    @arrow_udf(T.ArrayType(T.LongType()), ArrowUDFType.SCALAR)
    def _buckets(s: pa.Array) -> pa.Array:
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        flat = np.asarray(s.flatten(), dtype=np.float64)  # zero-copy buffer
        n = len(s)
        x = flat.reshape(n, dim) if n else np.zeros((0, dim))
        dots = np.zeros((n, m.shape[1]))
        for d in range(dim):  # ascending-dim adds == the fold order
            dots += x[:, d, None] * m[d]
        bits = (dots > 0).reshape(n, n_tables, planes)
        vals = (bits * pows).sum(-1).astype(np.int64).ravel()
        offsets = pa.array(np.arange(0, (n + 1) * n_tables, n_tables, dtype=np.int64))
        return pa.LargeListArray.from_arrays(offsets, pa.array(vals, type=pa.int64()))

    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return _buckets(v)


def embedding_dup_pairs(
    df: DataFrame, id_col: str, vec_col: str, dim: int, threshold: float = 0.95,
    planes: int = 12, seed: int = 42,
) -> DataFrame:
    """Cosine near-duplicate pairs: hyperplane-LSH bucket join + exact
    cosine verify. Near-identical vectors collide on all sign bits with
    high probability; bucket join replaces the O(n²) similarity matrix."""
    vecs = df.select(
        F.col(id_col).alias("_id"),
        l2_normalize(vec_col).alias("_v"),
    ).withColumn("_bucket", hyperplane_bucket("_v", dim, planes, seed))
    a = vecs.select(F.col("_id").alias("_id1"), F.col("_v").alias("_v1"), "_bucket")
    b = vecs.select(F.col("_id").alias("_id2"), F.col("_v").alias("_v2"), "_bucket")
    cos = cosine(F.col("_v1"), F.col("_v2"))
    return (
        a.join(b, "_bucket")
        .filter(F.col("_id1") < F.col("_id2"))
        .withColumn("cosine", cos.cast("double"))
        .filter(F.col("cosine") >= threshold)
        .select("_id1", "_id2", "cosine")
        .distinct()
    )


# -- pair-based dedup ----------------------------------------------------------

def dedup_by_pairs(df: DataFrame, id_col: str, pairs: DataFrame) -> DataFrame:
    """Drop all but the min-id member of each near-dup component
    (pairs -> connected components -> anti-join losers)."""
    from docetl_spark.operators.resolve_ops import connected_components

    comp = connected_components(pairs.select("_id1", "_id2"))
    losers = comp.filter(F.col("node") != F.col("comp")).select(F.col("node").alias(id_col))
    return df.join(losers, on=id_col, how="left_anti")
