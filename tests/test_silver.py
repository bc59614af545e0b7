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


def test_split_identical_under_repartition(spark):
    """xxhash64 ordering: split membership must be a pure function of
    the data, not of partition layout (rand(seed) was not)."""
    rows = [(f"x{c}{i}", f"cl{c}") for c in range(40) for i in range(2)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["clip_id", "merged_component"]))
    base = {
        (r["clip_id"], r["split"])
        for r in stratified_cluster_split(df, seed=420).collect()
    }
    for k in (1, 3, 17):
        again = {
            (r["clip_id"], r["split"])
            for r in stratified_cluster_split(df.repartition(k), seed=420).collect()
        }
        assert again == base


def test_pairing_identical_under_repartition(spark):
    df = spark.createDataFrame(pd.DataFrame({"clip_id": [f"p{i:02d}" for i in range(20)]}))
    base = {tuple(r) for r in balanced_random_pairs(df, seed=4).collect()}
    for k in (1, 5):
        again = {
            tuple(r)
            for r in balanced_random_pairs(df.repartition(k), seed=4).collect()
        }
        assert again == base


def test_pairing_partitioned_not_global(spark):
    """The main pairing window must partition by the salt group (never
    one global single-partition sort); only the <= n_groups leftover
    pass may be global. Coverage stays exact at 1000 rows."""
    df = spark.createDataFrame(
        pd.DataFrame({"clip_id": [f"q{i:04d}" for i in range(1000)]})
    )
    pairs = balanced_random_pairs(df, seed=4)
    plan = pairs._jdf.queryExecution().optimizedPlan().toString()
    assert "windowspecdefinition(__g" in plan
    rows = pairs.collect()
    assert len(rows) == 500
    used = [r["id_a"] for r in rows] + [r["id_b"] for r in rows]
    assert len(set(used)) == 1000


def test_label_quota_pairs(spark):
    """Datasets.py:57-99 semantics: keep drawing pairing rounds until
    every requested label reaches its quota, then cap at quota."""
    from sems_event_deduplication_spark.operators.silver import label_quota_pairs

    # 60 members in 12 same-clusters of 5 -> random pairing yields both
    # same_event and different_event pairs each round
    rows = [(f"m{c:02d}{i}", f"cl{c:02d}") for c in range(12) for i in range(5)]
    members = spark.createDataFrame(
        pd.DataFrame(rows, columns=["clip_id", "merged_component"])
    )
    truth = {r: c for r, c in rows}

    def labeler(pairs):
        a = members.select(
            F.col("clip_id").alias("id_a"), F.col("merged_component").alias("cl_a")
        )
        b = members.select(
            F.col("clip_id").alias("id_b"), F.col("merged_component").alias("cl_b")
        )
        return (
            pairs.join(a, "id_a").join(b, "id_b")
            .select(
                "id_a", "id_b",
                F.when(F.col("cl_a") == F.col("cl_b"), "same_event")
                .otherwise("different_event").alias("label"),
            )
        )

    labels = ["same_event", "different_event"]
    out = label_quota_pairs(members, labeler, labels, quota=10, seed=4).collect()
    counts = {}
    for r in out:
        counts[r["label"]] = counts.get(r["label"], 0) + 1
        want = "same_event" if truth[r["id_a"]] == truth[r["id_b"]] else "different_event"
        assert r["label"] == want
    assert counts["different_event"] == 10  # plentiful label hits quota exactly
    assert counts["same_event"] >= 5  # rare label accumulates across rounds


def test_label_quota_pairs_no_duplicate_orientations(spark):
    """The same unordered pair drawn in two rounds under opposite
    orientations must merge to ONE row, not double-count toward the
    quota."""
    from sems_event_deduplication_spark.operators.silver import label_quota_pairs

    members = spark.createDataFrame([("a",), ("b",)], "clip_id string")

    def labeler(pairs):
        return pairs.withColumn("label", F.lit("same"))

    out = label_quota_pairs(
        members, labeler, labels=["same"], quota=2, max_rounds=4
    ).collect()
    keys = [(min(r["id_a"], r["id_b"]), max(r["id_a"], r["id_b"])) for r in out]
    assert len(keys) == len(set(keys)) == 1, keys


def test_stratified_split_hash_strategy(spark):
    """strategy='hash' (the scale form): clusters stay whole, the
    assignment is a pure per-row hash (no Window in the plan, so no
    3-partition stratum sort), it is identical under repartitioning,
    and the realized fractions concentrate around the targets."""
    rows = [(f"h{c}_{i}", f"cl{c}") for c in range(1200) for i in range(2)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["clip_id", "merged_component"]))
    out = stratified_cluster_split(df, weights=(0.8, 0.1, 0.1), seed=420, strategy="hash")
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "windowspecdefinition" not in plan, "hash strategy must not sort strata"
    # the split is a pure per-row function of the cluster key: a plain
    # projection, so the plan must carry no join (an earlier form
    # materialized distinct clusters + joined them back) and no
    # aggregate — zero shuffles, zero eager jobs
    assert "Join" not in plan, plan
    assert "Aggregate" not in plan, plan
    per_cluster = (
        out.groupBy("merged_component")
        .agg(F.count_distinct("split").alias("n_splits"))
        .collect()
    )
    assert all(r["n_splits"] == 1 for r in per_cluster)
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    n = sum(counts.values())
    assert n == 2400
    assert 0.74 <= counts["train"] / n <= 0.86, counts
    assert 0.06 <= counts["val"] / n <= 0.14, counts
    assert 0.06 <= counts["test"] / n <= 0.14, counts
    base = {(r["clip_id"], r["split"]) for r in out.collect()}
    again = {
        (r["clip_id"], r["split"])
        for r in stratified_cluster_split(
            df.repartition(7), weights=(0.8, 0.1, 0.1), seed=420, strategy="hash"
        ).collect()
    }
    assert again == base
