"""Similarity search over embedding columns (training-pipeline op).

The reference's similarity substrate is all-pairs cosine over SBERT
embeddings inside ``util.community_detection`` (``cluster_news.py:36``,
``create_silver_label.py:181``). Here:

- ``cosine_topk``: exact brute-force top-k against a query vector —
  the correctness baseline. Dot products run as native ``aggregate``/
  ``zip_with`` expressions (JVM, codegen) — no UDF.
- ``ann_topk_lsh``: the scale path — random-hyperplane sign-bit
  bucketing (same family as the audio SimHash) prefilters candidates
  to buckets within a Hamming radius of the query's bucket, then exact
  cosine re-ranks. At 10^12 rows the bucket prefilter turns a full
  scan into a partition-pruned probe.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(u: Column, v: Column) -> Column:
    """Sequential-fold dot product (deterministic, JVM-side)."""
    return F.aggregate(
        F.zip_with(u, v, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(u: Column, v: Column) -> Column:
    return dot(u, v) / (F.sqrt(dot(u, u)) * F.sqrt(dot(v, v)))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine against a literal query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        df.select(id_col, F.round(cosine(F.col(vec_col), q), 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), id_col)
        .limit(k)
    )


def sign_bits_expr(vec_col: Column, planes: np.ndarray) -> Column:
    """Random-hyperplane sign signature as a native expression.

    ``planes``: (n_bits, dim) fixed-seed matrix. Each bit is the sign of
    a plan-time-literal linear form — all JVM arithmetic.
    """
    n_bits, dim = planes.shape
    bits = None
    for b in range(n_bits):
        proj = None
        for i in range(dim):
            w = float(planes[b, i])
            if w == 0.0:
                continue
            term = F.element_at(vec_col, i + 1).cast("double") * F.lit(w)
            proj = term if proj is None else (proj + term)
        bit = F.when(proj > 0, F.lit(1 << b)).otherwise(F.lit(0))
        bits = bit if bits is None else (bits + bit)
    return bits.cast("long")


def make_planes(dim: int, n_bits: int, seed: int) -> np.ndarray:
    return np.random.default_rng(seed + 104_729).standard_normal((n_bits, dim))


def ann_topk_lsh(
    df: DataFrame,
    query_vec: list[float],
    planes: np.ndarray,
    k: int = 10,
    hamming_radius: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """LSH-bucketed approximate top-k: sign-bucket prefilter + exact
    cosine re-rank. Bucket column is computable at write time, so at
    scale it becomes a partition/cluster key and the probe prunes I/O.
    """
    q = np.asarray(query_vec, dtype=np.float64)
    n_bits = planes.shape[0]
    q_sig = 0
    proj = planes[:, : len(q)] @ q
    for b in range(n_bits):
        if proj[b] > 0:
            q_sig |= 1 << b
    sig = sign_bits_expr(F.col(vec_col), planes)
    pruned = df.withColumn("__sig", sig).filter(
        F.bit_count(F.col("__sig").bitwiseXOR(F.lit(q_sig))) <= hamming_radius
    )
    qc = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        pruned.select(id_col, F.round(cosine(F.col(vec_col), qc), 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), id_col)
        .limit(k)
    )
