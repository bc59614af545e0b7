"""Text analysis ops: lang-ID, quality, token count, fingerprint, entropy."""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import functions as F

from sems_event_deduplication_spark.operators.textstats import (
    cluster_type_entropy,
    lang_id,
    quality_features,
    rolling_fingerprint,
    token_count,
)


def test_lang_id(spark):
    rows = [
        ("en", "the storm and the flood of the coast is that bad for the town"),
        ("de", "der sturm und die flut das ist nicht gut ein tag mit regen"),
        ("es", "el agua en la costa que los vientos de un ciclon por la noche"),
        ("fr", "le vent dans la ville est une tempete pour les gens dans le nord"),
        ("und", "zzz qqq www eee rrr ttt yyy"),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["want", "text"]))
    got = df.select("want", lang_id(F.col("text")).alias("got")).collect()
    for r in got:
        assert r["got"] == r["want"], (r["want"], r["got"])


def test_quality_features(spark):
    df = spark.createDataFrame(pd.DataFrame({"text": ["hello world! hello again."]}))
    r = quality_features(df).collect()[0]
    assert r["q_n_words"] == 4
    assert 0 < r["q_alpha_ratio"] < 1
    assert r["q_punct_ratio"] > 0
    assert r["q_distinct_ratio"] == 0.75  # 'hello' repeats exactly


def test_token_count(spark):
    df = spark.createDataFrame(pd.DataFrame({"text": ["hello, world!! ok"]}))
    got = df.select(token_count(F.col("text")).alias("n")).collect()[0]["n"]
    assert got == 5  # 3 words + 2 punct runs


def test_rolling_fingerprint_stability(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"t": ["same text repeated here ok", "same text repeated here ok",
                            "totally different content here"]})
    )
    fps = [r["fp"] for r in df.select(rolling_fingerprint(F.col("t")).alias("fp")).collect()]
    assert fps[0] == fps[1] != fps[2]


def test_cluster_type_entropy(spark):
    rows = (
        [("A", "storm")] * 4  # pure -> entropy 0
        + [("B", "storm")] * 2
        + [("B", "flood")] * 2  # 50/50 -> entropy 1
    )
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["component", "pred_event_type"]))
    got = {r["component"]: r["type_entropy"] for r in cluster_type_entropy(df).collect()}
    assert got["A"] == 0.0
    assert math.isclose(got["B"], 1.0, abs_tol=1e-9)
