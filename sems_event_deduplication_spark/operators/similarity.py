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


def make_sign_bits_udf(planes: np.ndarray):
    """Random-hyperplane sign signature as a vectorized pandas UDF.

    One numpy matmul per Arrow batch — the signature-computation path
    for realistic dims. The literal-expression form (``sign_bits_expr``)
    builds ``n_bits x dim`` Catalyst nodes (~49k at 768-dim x 64 bits),
    blowing up plan compile and codegen; this UDF is O(1) plan nodes at
    any dim and runs the arithmetic as one BLAS call per batch.

    Semantics match ``sign_bits_expr`` exactly, including its
    null-propagation: only the first ``dim`` entries of each vector are
    read; bit b is set iff its projection is strictly positive, and bit
    b is 0 whenever ANY dim its plane row actually touches (nonzero
    weight) is missing (vector shorter than that index) or null — other
    bits of the same vector are unaffected. With dense planes this
    degenerates to "short vector -> sig 0", but sparse planes (e.g.
    ``np.eye`` in tests) keep the bits whose rows avoid the missing
    tail, exactly as the expression form does.
    """
    from pyspark.sql.functions import pandas_udf

    n_bits, dim = planes.shape
    if n_bits > 64:
        raise ValueError("sign signature is one int64 word: n_bits <= 64")
    proj_m = planes.T.astype(np.float64).copy()          # (dim, n_bits)
    touched = (proj_m != 0.0)                            # (dim, n_bits)
    # bit 63 is the int64 sign bit: build weights unsigned, emit the
    # two's-complement reinterpretation (Hamming XOR/bit_count are
    # bitwise — sign is irrelevant downstream)
    weights = np.left_shift(
        np.uint64(1), np.arange(n_bits, dtype=np.uint64)
    )

    @pandas_udf("long")
    def sign_bits(v):
        import pandas as pd

        n = len(v)
        out = np.zeros(n, dtype=np.int64)
        if n == 0:
            return pd.Series(out)
        # pad missing tail / null rows / null elements with nan, then
        # mask: a bit is valid iff no touched dim is nan for that row
        X = np.full((n, dim), np.nan, dtype=np.float64)
        for i, x in enumerate(v):
            if x is None:
                continue
            row = np.asarray(x[:dim], dtype=np.float64)
            X[i, : len(row)] = row
        missing = np.isnan(X)                            # (n, dim)
        if missing.any():
            # rare ragged/null batch: mask per bit. The bool matmul is
            # ~10x the BLAS projection's cost, so it runs only when a
            # batch actually contains missing elements
            valid = ~(missing @ touched)                 # (n, n_bits)
            P = np.where(missing, 0.0, X) @ proj_m       # (n, n_bits)
            bits_on = (P > 0) & valid
        else:
            bits_on = (X @ proj_m) > 0                   # dense hot path
        sig_u64 = bits_on.astype(np.uint64) @ weights
        out[:] = np.ascontiguousarray(sig_u64).view(np.int64)
        return pd.Series(out)

    return sign_bits


def sign_bits_expr(vec_col: Column, planes: np.ndarray) -> Column:
    """Random-hyperplane sign signature as a native expression.

    ``planes``: (n_bits, dim) fixed-seed matrix. Each bit is the sign of
    a plan-time-literal linear form — all JVM arithmetic.

    Plan-size bound: this unrolls ``n_bits x dim`` expression terms, so
    it is only for SMALL matrices (<= ~1k terms: toy dims, probe-side
    constants). Index writes and scans use ``make_sign_bits_udf``.
    """
    n_bits, dim = planes.shape
    bits = None
    for b in range(n_bits):
        proj = None
        for i in range(dim):
            w = float(planes[b, i])
            if w == 0.0:
                continue
            # try_element_at: a vector shorter than the plane dim must
            # null the projection (-> bit 0), not RAISE — plain
            # element_at out-of-bounds is an error under Spark 4 ANSI
            term = F.try_element_at(vec_col, F.lit(i + 1)).cast("double") * F.lit(w)
            proj = term if proj is None else (proj + term)
        # b == 63 is the int64 sign bit: its weight is the (negative)
        # two's-complement value, so the sum stays inside long range
        w_b = (1 << b) if b < 63 else -(1 << 63)
        bit = F.when(proj > 0, F.lit(w_b)).otherwise(F.lit(0))
        bits = bit if bits is None else (bits + bit)
    return bits.cast("long")


def make_planes(dim: int, n_bits: int, seed: int) -> np.ndarray:
    return np.random.default_rng(seed + 104_729).standard_normal((n_bits, dim))


def _query_sig(query_vec: list[float], planes: np.ndarray) -> int:
    # the stored signature reads only the first planes.shape[1] dims
    # (sign_bits_expr) — truncate a longer query the same way. A query
    # SHORTER than the plane dim projects onto the prefix planes (best
    # effort; note stored vectors should be >= the plane dim — a short
    # STORED vector zeroes exactly the bits whose plane rows touch a
    # nonzero weight in the missing tail, per-bit null propagation:
    # sig=0 under dense planes, surviving prefix bits under sparse
    # planes — see sign_bits_expr / make_sign_bits_udf)
    q = np.asarray(query_vec, dtype=np.float64)[: planes.shape[1]]
    proj = planes[:, : len(q)] @ q
    sig = 0
    for b in range(planes.shape[0]):
        if proj[b] > 0:
            sig |= 1 << b
    # two's-complement wrap so the driver-side literal matches the
    # stored int64 signature when bit 63 is set (Python int bitwise ops
    # sign-extend, so XOR/AND against it stay correct)
    if sig >= 1 << 63:
        sig -= 1 << 64
    return sig


def write_ann_index(
    df: DataFrame,
    path: str,
    planes: np.ndarray,
    p_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the embedding table laid out for ANN probes: the full
    sign signature as a stored column (no recompute at query time) and
    its low ``p_bits`` as a **partition column**, so a probe's bucket
    enumeration becomes parquet partition pruning — the scan never
    opens non-candidate directories. This is the write path that turns
    ``ann_topk_lsh``'s full-scan filter into pruned I/O at 100 TB."""
    sig = make_sign_bits_udf(planes)(F.col(vec_col))
    (
        df.withColumn("sig", sig)
        .withColumn("bucket", F.col("sig").bitwiseAND(F.lit((1 << p_bits) - 1)))
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )


def ann_topk_indexed(
    spark,
    path: str,
    query_vec: list[float],
    planes: np.ndarray,
    k: int = 10,
    hamming_radius: int = 2,
    p_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe a ``write_ann_index`` layout: enumerate every partition
    bucket whose low-bit pattern is within ``hamming_radius`` of the
    query's (any candidate within the radius must live in one of them),
    prune the scan to those directories, then exact-cosine re-rank the
    stored-signature survivors. Probe cost grows as
    Σ_{i<=r} C(p_bits, i) buckets of 2^p_bits — e.g. r=2, p=8 reads
    ~14% of partitions; recall is identical to ``ann_topk_lsh`` at the
    same radius because pruning only removes buckets that cannot hold
    a candidate."""
    import itertools

    q_sig = _query_sig(query_vec, planes)
    q_bucket = q_sig & ((1 << p_bits) - 1)
    buckets = set()
    for w in range(min(hamming_radius, p_bits) + 1):
        for flip in itertools.combinations(range(p_bits), w):
            m = 0
            for b in flip:
                m |= 1 << b
            buckets.add(q_bucket ^ m)
    pruned = (
        spark.read.parquet(path)
        .filter(F.col("bucket").isin(sorted(buckets)))
        .filter(
            F.bit_count(F.col("sig").bitwiseXOR(F.lit(q_sig))) <= hamming_radius
        )
    )
    qc = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        pruned.select(id_col, F.round(cosine(F.col(vec_col), qc), 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), id_col)
        .limit(k)
    )


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
    q_sig = _query_sig(query_vec, planes)
    sig = make_sign_bits_udf(planes)(F.col(vec_col))
    pruned = df.withColumn("__sig", sig).filter(
        F.bit_count(F.col("__sig").bitwiseXOR(F.lit(q_sig))) <= hamming_radius
    )
    qc = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        pruned.select(id_col, F.round(cosine(F.col(vec_col), qc), 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), id_col)
        .limit(k)
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: coarse k-means quantizer -> partition-per-cell
# ---------------------------------------------------------------------------

def build_ivf_centroids(
    df: DataFrame,
    n_cells: int = 16,
    seed: int = 42,
    sample_n: int = 2048,
    iters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic coarse quantizer: spherical k-means (cosine) over
    a bounded, hash-ordered sample.

    The sample is the ``sample_n`` rows with the smallest
    ``xxhash64(id, seed)`` — a pure function of the data, so the
    centroids (and therefore the index layout) are identical across
    runs, partitionings, and retries. Driver memory is bounded by
    ``sample_n * dim`` floats regardless of table size; Lloyd
    iterations run in numpy on the driver (k-means over a sample is
    the standard IVF training recipe — training never scans the full
    corpus)."""
    rows = (
        df.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
        .orderBy(F.xxhash64(F.col("__id"), F.lit(seed)), F.col("__id"))
        .limit(sample_n)
        .collect()
    )
    if not rows:
        raise ValueError(
            "build_ivf_centroids: input DataFrame has no rows — an IVF "
            "quantizer cannot be trained on an empty table"
        )
    X = np.asarray([r["__v"] for r in rows], dtype=np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed + 15_485_863)
    C = X[rng.choice(len(X), size=min(n_cells, len(X)), replace=False)]
    for _ in range(iters):
        sims = X @ C.T
        assign = np.argmax(sims, axis=1)
        for j in range(len(C)):
            members = X[assign == j]
            if len(members):
                m = members.sum(axis=0)
                C[j] = m / max(np.linalg.norm(m), 1e-12)
    return C


def make_cell_udf(centroids: np.ndarray):
    """IVF cell assignment (argmax-dot against unit-norm centroids) as
    a vectorized pandas UDF: ONE ``(batch, dim) @ (dim, n_cells)`` BLAS
    matmul + argmax per Arrow batch.

    This is the index-write path. The literal-expression twin
    (``_cell_expr``) unrolls ``n_cells x dim`` Catalyst terms — ~10^6
    expression nodes at a production quantizer (nlist ~10^3, dim 768),
    the same plan blowup ``make_sign_bits_udf`` exists to avoid — so it
    is kept only as the toy/parity form. Semantics match ``_cell_expr``
    exactly: ties break to the lowest cell id (first argmax), and the
    cell is NULL whenever the vector is null, has a null element, or
    its length differs from the centroid dim (zip_with pads the shorter
    side with nulls in the expr form, nulling every dot product)."""
    from pyspark.sql.functions import pandas_udf

    C = np.ascontiguousarray(centroids.astype(np.float64).T)  # (dim, n_cells)
    dim = C.shape[0]

    @pandas_udf("int")
    def cell(v):
        import pandas as pd

        n = len(v)
        X = np.zeros((n, dim), dtype=np.float64)
        valid = np.zeros(n, dtype=bool)
        for i, x in enumerate(v):
            if x is None:
                continue
            row = np.asarray(x, dtype=np.float64)
            if len(row) != dim or np.isnan(row).any():
                continue
            X[i] = row
            valid[i] = True
        res = np.zeros(n, dtype=np.int32)
        if valid.any():
            res[:] = np.argmax(X @ C, axis=1).astype(np.int32)
        out = pd.Series(res, dtype="Int32")
        out[~valid] = pd.NA
        return out

    return cell


def _cell_expr(vec_col: Column, centroids: np.ndarray) -> Column:
    """argmax-cosine cell id as a native expression: one literal-array
    dot product per centroid (JVM, codegen — no UDF), argmax via
    array_position(arr, array_max(arr)). Vectors are compared by dot
    product against unit-norm centroids, which ranks identically to
    cosine for a fixed input vector.

    Plan-size bound: unrolls ``n_cells x dim`` expression terms — toy
    dims and parity tests only. Index writes use ``make_cell_udf``
    (same rule as ``sign_bits_expr`` vs ``make_sign_bits_udf``)."""
    dots = []
    for j in range(centroids.shape[0]):
        c = F.array(*[F.lit(float(x)) for x in centroids[j]])
        dots.append(dot(vec_col, c))
    arr = F.array(*dots)
    return (F.array_position(arr, F.array_max(arr)) - 1).cast("int")


def write_ivf_index(
    df: DataFrame,
    path: str,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the table partitioned by IVF cell: a probe enumerates
    its nprobe nearest cells and the scan prunes to those directories
    (same partition-pruning contract as ``write_ann_index``, with a
    learned quantizer instead of fixed hyperplanes). Cell assignment is
    ``make_cell_udf`` — one matmul + argmax per Arrow batch, O(1) plan
    nodes at any (n_cells, dim)."""
    (
        df.withColumn("cell", make_cell_udf(centroids)(F.col(vec_col)))
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(path)
    )


def ivf_topk(
    spark,
    path: str,
    query_vec: list[float],
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe a ``write_ivf_index`` layout: rank cells by centroid
    similarity to the query (driver numpy, k_cells-sized), scan only
    the ``nprobe`` nearest (partition pruning), exact-cosine re-rank.
    ``nprobe = n_cells`` probes everything and returns exactly the
    brute-force answer — the recall knob is explicit."""
    # a query longer than the centroid dim ranks cells by its prefix
    # (mirrors _query_sig's truncation for the LSH path)
    q = np.asarray(query_vec, dtype=np.float64)[: centroids.shape[1]]
    qn = q / max(np.linalg.norm(q), 1e-12)
    order = np.argsort(-(centroids[:, : len(qn)] @ qn), kind="stable")
    cells = [int(c) for c in order[: max(1, nprobe)]]
    pruned = spark.read.parquet(path).filter(F.col("cell").isin(cells))
    return cosine_topk(pruned, query_vec, k=k, id_col=id_col, vec_col=vec_col)
