"""Similarity search: exact top-k baseline + LSH-bucketed ANN."""

from __future__ import annotations

import numpy as np
import pandas as pd

from sems_event_deduplication_spark.operators.similarity import (
    ann_topk_lsh,
    cosine_topk,
    make_planes,
)


def _emb_df(spark, n=300, dim=16, seed=5):
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n, dim)).astype(np.float32)
    # plant near neighbors of row 0
    base[1] = base[0] + 0.01 * rng.standard_normal(dim).astype(np.float32)
    base[2] = base[0] * 1.5
    pdf = pd.DataFrame({"vec_id": range(n), "embedding": [r.tolist() for r in base]})
    return spark.createDataFrame(pdf), base


def _np_topk(base, q, k):
    sims = base @ q / (np.linalg.norm(base, axis=1) * np.linalg.norm(q))
    order = np.lexsort((np.arange(len(base)), -np.round(sims, 6)))
    return [int(i) for i in order[:k]]


def test_cosine_topk_matches_numpy(spark):
    df, base = _emb_df(spark)
    q = base[0].astype(np.float64)
    got = [r["vec_id"] for r in cosine_topk(df, q.tolist(), k=5).collect()]
    want = _np_topk(base.astype(np.float64), q, 5)
    assert got == want
    assert got[0] == 0 and set(got[:3]) == {0, 1, 2}  # planted neighbors found


def test_ann_lsh_finds_planted_neighbors(spark):
    df, base = _emb_df(spark)
    planes = make_planes(dim=16, n_bits=16, seed=42)
    q = base[0].astype(np.float64).tolist()
    got = [r["vec_id"] for r in ann_topk_lsh(df, q, planes, k=3, hamming_radius=3).collect()]
    assert got[0] == 0
    assert set(got) <= set(_np_topk(base.astype(np.float64), base[0].astype(np.float64), 10))


def test_ann_prunes_candidates(spark):
    df, base = _emb_df(spark)
    planes = make_planes(dim=16, n_bits=16, seed=42)
    from pyspark.sql import functions as F
    from sems_event_deduplication_spark.operators.similarity import sign_bits_expr

    q = base[0].astype(np.float64)
    proj = planes @ q
    q_sig = sum(1 << b for b in range(16) if proj[b] > 0)
    pruned_n = (
        df.withColumn("s", sign_bits_expr(F.col("embedding"), planes))
        .filter(F.bit_count(F.col("s").bitwiseXOR(F.lit(q_sig))) <= 3)
        .count()
    )
    assert pruned_n < 300  # the bucket prefilter actually prunes


def test_ann_indexed_layout_prunes_partitions(spark, tmp_path):
    """write_ann_index + ann_topk_indexed: same results as the scan-based
    ANN at the same radius, and the probe's scan shows PartitionFilters
    on the bucket column (pruned I/O, not a full scan)."""
    from sems_event_deduplication_spark.operators.similarity import (
        ann_topk_indexed,
        write_ann_index,
    )

    df, base = _emb_df(spark)
    planes = make_planes(16, 16, seed=1)
    path = str(tmp_path / "ann_index")
    write_ann_index(df, path, planes, p_bits=6)

    q = base[0].tolist()
    got = ann_topk_indexed(spark, path, q, planes, k=5, hamming_radius=2, p_bits=6)
    want = ann_topk_lsh(df, q, planes, k=5, hamming_radius=2)
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in want.collect()]

    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan


def test_ivf_index_and_probe(spark, tmp_path):
    """IVF ANN: deterministic centroids, probe-all exactness, decent
    partial-probe recall, and partition pruning in the probe plan."""
    import numpy as np

    from sems_event_deduplication_spark.operators.similarity import (
        build_ivf_centroids, cosine_topk, ivf_topk, write_ivf_index,
    )

    rng = np.random.default_rng(11)
    n, dim, n_cells = 400, 16, 8
    # clustered data so IVF cells are meaningful
    centers = rng.standard_normal((n_cells, dim)) * 3
    rows = []
    for i in range(n):
        v = centers[i % n_cells] + rng.standard_normal(dim)
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    c1 = build_ivf_centroids(df, n_cells=n_cells, seed=3, sample_n=128, iters=5)
    c2 = build_ivf_centroids(
        df.repartition(7), n_cells=n_cells, seed=3, sample_n=128, iters=5
    )
    assert np.allclose(c1, c2), "centroids must not depend on partitioning"

    q = rows[0][1]
    path = str(tmp_path / "ivf")
    write_ivf_index(df.filter("vec_id <> 0"), path, c1)

    exact = [r["vec_id"] for r in cosine_topk(df.filter("vec_id <> 0"), q, k=10).collect()]
    probe_all = [r["vec_id"] for r in ivf_topk(spark, path, q, c1, k=10, nprobe=n_cells).collect()]
    assert probe_all == exact, "nprobe=n_cells must equal brute force"

    probe2 = ivf_topk(spark, path, q, c1, k=10, nprobe=2)
    got = [r["vec_id"] for r in probe2.collect()]
    recall = len(set(got) & set(exact)) / len(exact)
    assert recall >= 0.8, f"nprobe=2 recall too low: {recall}"
    plan = probe2._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "cell" in plan


def test_sign_bits_udf_matches_expr(spark):
    """make_sign_bits_udf must reproduce sign_bits_expr bit for bit,
    including the short-vector -> sig 0 null-propagation edge."""
    from pyspark.sql import functions as F
    from sems_event_deduplication_spark.operators.similarity import (
        make_sign_bits_udf, sign_bits_expr,
    )

    rng = np.random.default_rng(13)
    dim, n_bits = 16, 16
    planes = make_planes(dim=dim, n_bits=n_bits, seed=21)
    vecs = [
        [float(x) for x in rng.standard_normal(dim)] for _ in range(100)
    ]
    vecs.append([1.0, -2.0])          # shorter than dim -> sig 0
    vecs.append([float(x) for x in rng.standard_normal(dim + 5)])  # longer
    pdf = pd.DataFrame({"vec_id": range(len(vecs)), "embedding": vecs})
    df = spark.createDataFrame(pdf)
    both = df.select(
        "vec_id",
        sign_bits_expr(F.col("embedding"), planes).alias("e"),
        make_sign_bits_udf(planes)(F.col("embedding")).alias("u"),
    ).collect()
    for r in both:
        e = r["e"] if r["e"] is not None else 0
        assert e == r["u"], (r["vec_id"], r["e"], r["u"])


def test_sign_bits_udf_matches_expr_sparse_planes(spark):
    """Sparse planes (zero weights) + ragged/null vectors: the expr
    zeroes ONLY bits whose plane touches a missing or null dim — the
    UDF must reproduce that per-bit, not blanket-zero the signature."""
    from pyspark.sql import functions as F
    from sems_event_deduplication_spark.operators.similarity import (
        make_sign_bits_udf, sign_bits_expr,
    )

    planes = np.eye(8)  # bit b touches only dim b
    rows = [
        (1, [1.0, 1.0, 1.0, 1.0]),              # short: bits 0-3 survive
        (2, [1.0] * 8),
        (3, None),
        (4, [-1.0, 2.0]),
        (5, [1.0, None, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0]),  # null element
    ]
    df = spark.createDataFrame(rows, "id int, v array<double>")
    both = df.select(
        "id",
        sign_bits_expr(F.col("v"), planes).alias("e"),
        make_sign_bits_udf(planes)(F.col("v")).alias("u"),
    ).collect()
    got = {r["id"]: (r["e"] if r["e"] is not None else 0, r["u"]) for r in both}
    assert got[1] == (15, 15)      # the prefix bits are NOT zeroed
    assert got[5] == (253, 253)    # only the null-touching bit drops
    for i, (e, u) in got.items():
        assert e == u, (i, e, u)


def test_ann_realistic_dim_no_plan_blowup(spark, tmp_path):
    """Index write + probe at dim=256 x 64 bits must not literal-unroll
    the projection (16k Catalyst nodes): the whole write+probe cycle —
    including plan compilation — has to finish in seconds, and the
    probe must return the planted nearest neighbor."""
    import time

    from sems_event_deduplication_spark.operators.similarity import (
        ann_topk_indexed, write_ann_index,
    )

    rng = np.random.default_rng(3)
    n, dim, n_bits = 500, 256, 64
    base = rng.standard_normal((n, dim))
    base[7] = base[0] + 0.01 * rng.standard_normal(dim)
    pdf = pd.DataFrame(
        {"vec_id": range(n), "embedding": [[float(x) for x in r] for r in base]}
    )
    df = spark.createDataFrame(pdf)
    planes = make_planes(dim=dim, n_bits=n_bits, seed=9)
    path = str(tmp_path / "ann256")

    t0 = time.monotonic()
    write_ann_index(df.filter("vec_id <> 0"), path, planes, p_bits=6)
    got = ann_topk_indexed(
        spark, path, [float(x) for x in base[0]], planes,
        k=3, hamming_radius=8, p_bits=6,
    ).collect()
    elapsed = time.monotonic() - t0
    assert [r["vec_id"] for r in got][0] == 7
    # the expr form at this size spent minutes in Catalyst; the UDF
    # path is bounded by one small parquet write + pruned read
    assert elapsed < 60, f"plan-compile blowup suspected: {elapsed:.1f}s"


def test_ivf_cell_udf_matches_expr(spark):
    """make_cell_udf must reproduce _cell_expr cell for cell, including
    the null semantics (null vector / null element / wrong length ->
    null cell) and first-index tie-breaking."""
    from pyspark.sql import functions as F
    from sems_event_deduplication_spark.operators.similarity import (
        _cell_expr, make_cell_udf,
    )

    rng = np.random.default_rng(7)
    n_cells, dim = 6, 8
    C = rng.standard_normal((n_cells, dim))
    C /= np.linalg.norm(C, axis=1, keepdims=True)
    rows = [(i, [float(x) for x in rng.standard_normal(dim)]) for i in range(120)]
    rows.append((200, None))                               # null vector
    rows.append((201, [1.0, 2.0]))                         # shorter than dim
    rows.append((202, [float(x) for x in rng.standard_normal(dim + 3)]))  # longer
    rows.append((203, [1.0, None, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0]))  # null element
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    both = df.select(
        "vec_id",
        _cell_expr(F.col("embedding"), C).alias("e"),
        make_cell_udf(C)(F.col("embedding")).alias("u"),
    ).collect()
    for r in both:
        assert r["e"] == r["u"], (r["vec_id"], r["e"], r["u"])
    assert all(r["e"] is None for r in both if r["vec_id"] >= 200)


def test_ivf_realistic_scale_no_plan_blowup(spark, tmp_path):
    """Index write + probe at n_cells=256, dim=256: the old literal
    quantizer unrolled ~65k Catalyst nodes into the write plan (minutes
    of compile at production sizes); the UDF path must finish the whole
    write+probe cycle in seconds and still return the planted nearest
    neighbor from a pruned partition scan."""
    import time

    from sems_event_deduplication_spark.operators.similarity import (
        ivf_topk, write_ivf_index,
    )

    rng = np.random.default_rng(17)
    n, dim, n_cells = 600, 256, 256
    C = rng.standard_normal((n_cells, dim))
    C /= np.linalg.norm(C, axis=1, keepdims=True)
    base = C[np.arange(n) % n_cells] * 3 + rng.standard_normal((n, dim))
    base[7] = base[0] + 0.01 * rng.standard_normal(dim)
    pdf = pd.DataFrame(
        {"vec_id": range(n), "embedding": [[float(x) for x in r] for r in base]}
    )
    df = spark.createDataFrame(pdf)
    path = str(tmp_path / "ivf256")

    t0 = time.monotonic()
    write_ivf_index(df.filter("vec_id <> 0"), path, C)
    probe = ivf_topk(spark, path, [float(x) for x in base[0]], C, k=3, nprobe=4)
    got = [r["vec_id"] for r in probe.collect()]
    elapsed = time.monotonic() - t0
    assert got[0] == 7
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "cell" in plan
    assert elapsed < 60, f"plan-compile blowup suspected: {elapsed:.1f}s"
