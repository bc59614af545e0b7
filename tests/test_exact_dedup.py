"""keep-last exact dedup parity vs pandas (reference create_silver_label.py:67)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from sems_event_deduplication_spark.operators.exact_dedup import (
    dedup_keep_last,
    exact_dedup_with_edges,
)


def test_keep_last_matches_pandas(spark):
    pdf = pd.DataFrame(
        {
            "k": ["a", "b", "a", "c", "b", "a"],
            "ord": [1, 2, 3, 4, 5, 6],
            "v": list("uvwxyz"),
        }
    )
    want = pdf.sort_values("ord").drop_duplicates(subset="k", keep="last")
    got = dedup_keep_last(spark.createDataFrame(pdf), ["k"], "ord").toPandas()
    assert sorted(got["v"]) == sorted(want["v"])


def test_exact_dedup_edges_connect_drops_to_keeper(spark):
    pdf = pd.DataFrame(
        {
            "clip_id": ["c1", "c2", "c3", "c4"],
            "transcript_norm": ["same", "same", "same", "diff"],
            "bytes": [b"x", b"x", b"x", b"y"],
        }
    )
    kept, edges = exact_dedup_with_edges(spark.createDataFrame(pdf))
    kept_ids = {r["clip_id"] for r in kept.select("clip_id").collect()}
    assert kept_ids == {"c3", "c4"}  # keep-last by clip_id desc
    e = {(r["id_a"], r["id_b"]) for r in edges.collect()}
    assert e == {("c3", "c1"), ("c3", "c2")}


def test_exact_dedup_distinguishes_payloads(spark):
    pdf = pd.DataFrame(
        {
            "clip_id": ["c1", "c2"],
            "transcript_norm": ["same", "same"],
            "bytes": [b"x", b"DIFFERENT"],
        }
    )
    kept, edges = exact_dedup_with_edges(spark.createDataFrame(pdf))
    assert kept.count() == 2 and edges.count() == 0
