"""Cluster-merge parity: entity overlap (max denominator) + temporal gate."""

from __future__ import annotations

import datetime as dt

import pandas as pd

from sems_event_deduplication_spark.operators.merge import (
    cluster_entity_counts,
    entity_overlap_edges,
    merge_clusters,
)


def _mk(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows))


def test_entity_count_threshold(spark):
    rows = []
    for i in range(6):
        rows.append({"component": "A", "entities": ["guam", "mawar"], "clip_id": f"a{i}"})
    rows.append({"component": "A", "entities": ["rare"], "clip_id": "a9"})
    df = _mk(spark, rows)
    got = {
        (r["component"], r["entity"]): r["cnt"]
        for r in cluster_entity_counts(df, min_count=4).collect()
    }
    assert ("A", "guam") in got and ("A", "rare") not in got


def test_overlap_formula_max_denominator(spark):
    # A has 4 frequent entities, B has 2; intersection = 2
    # overlap = 2 / max(4, 2) = 0.5 (reference create_silver_label.py:424-430)
    rows = []
    for e in ["e1", "e2", "e3", "e4"]:
        for i in range(5):
            rows.append({"component": "A", "entities": [e], "clip_id": f"A{e}{i}"})
    for e in ["e1", "e2"]:
        for i in range(5):
            rows.append({"component": "B", "entities": [e], "clip_id": f"B{e}{i}"})
    ents = cluster_entity_counts(_mk(spark, rows), min_count=4)
    got = {(r["ca"], r["cb"]): r["overlap"] for r in entity_overlap_edges(ents, min_overlap=0.5).collect()}
    assert got == {("A", "B"): 0.5}


def test_merge_clusters_end_to_end(spark):
    base = dt.date(2023, 5, 1)
    rows = []
    # A and B share entities and are 3 days apart -> merge
    # C shares entities with A but is 40 days away -> no merge
    for cid, day0 in [("A", 0), ("B", 3), ("C", 40)]:
        for i in range(6):
            rows.append(
                {
                    "component": cid,
                    "clip_id": f"{cid}{i}",
                    "entities": ["guam", "mawar"],
                    "event_date": base + dt.timedelta(days=day0 + (i % 2)),
                }
            )
    out = merge_clusters(_mk(spark, rows))
    got = {
        r["component"]: r["merged_component"]
        for r in out.select("component", "merged_component").distinct().collect()
    }
    assert got["A"] == got["B"] == "A"
    assert got["C"] == "C"
