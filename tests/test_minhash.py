"""MinHash sketch properties + determinism (SURVEY.md §5 test 1)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from sems_event_deduplication_spark.functions.minhash import (
    band_hashes,
    estimated_jaccard,
    exact_jaccard,
    make_minhash_udf,
    shingle_hashes,
)
from sems_event_deduplication_spark.functions.text import char_shingles, normalize_text
from oracle_utils import jaccard_py, shingle_set_py


def _sig_df(spark, texts, num_perm=128, seed=42, k=9):
    df = spark.createDataFrame(pd.DataFrame({"id": range(len(texts)), "t": texts}))
    mh = make_minhash_udf(num_perm, seed)
    return df.select(
        "id",
        "t",
        char_shingles(normalize_text(F.col("t")), k).alias("sh"),
    ).withColumn("hs", shingle_hashes(F.col("sh"))).withColumn("sig", mh(F.col("hs")))


def test_minhash_estimates_jaccard(spark):
    base = "typhoon mawar slams into guam as residents urged to shelter in place"
    variants = [
        base,
        base + " overnight",
        base.replace("guam", "okinawa"),
        "completely different words about a flood in malawi region today",
    ]
    sdf = _sig_df(spark, variants, num_perm=256)
    rows = {r["id"]: r for r in sdf.collect()}
    for j in range(1, 4):
        a, b = rows[0], rows[j]
        true_j = jaccard_py(frozenset(a["sh"]), frozenset(b["sh"]))
        est = np.mean(np.array(a["sig"]) == np.array(b["sig"]))
        assert abs(est - true_j) < 0.12, (j, true_j, est)


def test_minhash_deterministic_across_runs(spark):
    texts = ["typhoon mawar hits guam", "flood warning in malawi"] * 3
    s1 = {r["id"]: r["sig"] for r in _sig_df(spark, texts).collect()}
    s2 = {r["id"]: r["sig"] for r in _sig_df(spark, texts).collect()}
    assert s1 == s2
    assert s1[0] == s1[2] == s1[4]  # identical text -> identical signature


def test_empty_doc_gets_sentinel_signature(spark):
    sdf = _sig_df(spark, ["", "real text here"])
    rows = {r["id"]: r["sig"] for r in sdf.collect()}
    assert len(set(rows[0])) == 1  # all slots = sentinel
    assert rows[0] != rows[1]


def test_band_hashes_width_and_determinism(spark):
    sdf = _sig_df(spark, ["typhoon mawar hits guam"] * 2, num_perm=128)
    bdf = sdf.withColumn("b", band_hashes(F.col("sig"), 32, 4))
    rows = [r["b"] for r in bdf.collect()]
    assert len(rows[0]) == 32
    assert rows[0] == rows[1]


def test_estimated_and_exact_jaccard_exprs(spark):
    sdf = _sig_df(spark, ["abcdefghij klmnop", "abcdefghij klmnop", "zzzzzzzzzzzz"], num_perm=128)
    a = sdf.filter("id=0").select(
        F.col("sig").alias("sa"), F.col("sh").alias("sha")
    )
    pairs = a.crossJoin(
        sdf.select(F.col("id").alias("j"), F.col("sig").alias("sb"), F.col("sh").alias("shb"))
    )
    got = {
        r["j"]: (r["est"], r["ex"])
        for r in pairs.select(
            "j",
            estimated_jaccard(F.col("sa"), F.col("sb"), 128).alias("est"),
            exact_jaccard(F.col("sha"), F.col("shb")).alias("ex"),
        ).collect()
    }
    assert got[0] == (1.0, 1.0) and got[1] == (1.0, 1.0)
    assert got[2][0] < 0.2 and got[2][1] == 0.0
