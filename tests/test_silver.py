"""Silver labels, OOS drop, pair labeling, splits, random pairing."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from sems_event_deduplication_spark.operators.silver import (
    balanced_random_pairs,
    drop_all_oos_clusters,
    label_pairs,
    silver_labels,
    stratified_cluster_split,
)


def _members(spark):
    rows = [
        ("a1", "A", "storm", dt.date(2023, 5, 1)),
        ("a2", "A", "storm", dt.date(2023, 5, 2)),
        ("a3", "A", "flood", dt.date(2023, 5, 2)),
        ("b1", "B", "oos", dt.date(2023, 6, 1)),
        ("b2", "B", "oos", dt.date(2023, 6, 2)),
        ("c1", "C", "flood", dt.date(2023, 7, 1)),
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["clip_id", "merged_component", "pred_event_type", "event_date"])
    )


def test_silver_labels_majority(spark):
    got = {
        r["merged_component"]: r["silver_label"]
        for r in silver_labels(_members(spark)).select("merged_component", "silver_label").distinct().collect()
    }
    assert got == {"A": "storm", "B": "oos", "C": "flood"}


def test_drop_all_oos(spark):
    kept = drop_all_oos_clusters(_members(spark))
    assert {r["merged_component"] for r in kept.select("merged_component").distinct().collect()} == {"A", "C"}


def test_label_pairs(spark):
    pairs = spark.createDataFrame(
        pd.DataFrame(
            [("a1", "a2"), ("a2", "a3"), ("a1", "c1"), ("a3", "a2")],
            columns=["id_a", "id_b"],
        )
    )
    got = {(r["id_a"], r["id_b"]): r["label"] for r in label_pairs(pairs, _members(spark)).collect()}
    assert got[("a1", "a2")] == "same_event_previous"
    assert got[("a2", "a3")] == "same_event"
    assert got[("a3", "a2")] == "same_event"
    assert got[("a1", "c1")] == "different_event"


def test_stratified_split_keeps_clusters_whole(spark):
    rows = [(f"x{c}{i}", f"cl{c}") for c in range(30) for i in range(3)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["clip_id", "merged_component"]))
    out = stratified_cluster_split(df, weights=(0.6, 0.2, 0.2), seed=420)
    per_cluster = (
        out.groupBy("merged_component")
        .agg(F.count_distinct("split").alias("n_splits"))
        .collect()
    )
    assert all(r["n_splits"] == 1 for r in per_cluster)
    splits = {r["split"] for r in out.select("split").distinct().collect()}
    assert splits == {"train", "val", "test"}
    # deterministic under fixed seed
    out2 = stratified_cluster_split(df, weights=(0.6, 0.2, 0.2), seed=420)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, out2.collect()))


def test_balanced_random_pairs(spark):
    df = spark.createDataFrame(pd.DataFrame({"clip_id": [f"p{i:02d}" for i in range(10)]}))
    pairs = balanced_random_pairs(df, seed=4).collect()
    assert len(pairs) == 5
    used = [r["id_a"] for r in pairs] + [r["id_b"] for r in pairs]
    assert len(set(used)) == 10  # disjoint pairing covers everyone once
