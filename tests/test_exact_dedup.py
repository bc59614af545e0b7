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


def test_exact_dedup_strategies_agree_and_plan_shapes(spark):
    """All payload re-attach strategies return identical keepers/edges;
    the broadcast branches must show a BroadcastHashJoin and the
    shuffle branch must not broadcast (it's the bucketed-table path)."""
    pdf = pd.DataFrame(
        {
            "clip_id": [f"c{i:02d}" for i in range(20)],
            "transcript_norm": [f"t{i % 7}" for i in range(20)],
            "bytes": [bytes([i % 7]) for i in range(20)],
        }
    )
    df = spark.createDataFrame(pdf)
    results = {}
    for strat in ("anti_broadcast", "semi_broadcast", "shuffle", "auto"):
        kept, edges = exact_dedup_with_edges(df, strategy=strat)
        results[strat] = (
            {r["clip_id"] for r in kept.collect()},
            {(r["id_a"], r["id_b"]) for r in edges.collect()},
        )
        plan = kept._jdf.queryExecution().executedPlan().toString()
        if strat in ("anti_broadcast", "semi_broadcast"):
            assert "BroadcastHashJoin" in plan
    base = results["anti_broadcast"]
    assert all(v == base for v in results.values())
    # auto with a zero threshold must take the shuffle branch
    kept_big, _ = exact_dedup_with_edges(df, strategy="auto", max_broadcast_ids=0)
    assert {r["clip_id"] for r in kept_big.collect()} == base[0]


def test_exact_dedup_anti_broadcast_payload_never_shuffles(spark):
    """The default branch broadcasts the dropped ids: the payload side
    of the anti-join must sit directly on the scan with no Exchange."""
    pdf = pd.DataFrame(
        {
            "clip_id": ["c1", "c2", "c3"],
            "transcript_norm": ["same", "same", "solo"],
            "bytes": [b"x", b"x", b"z"],
        }
    )
    kept, _ = exact_dedup_with_edges(spark.createDataFrame(pdf))
    kept.collect()  # AQE: the final plan exists only after execution
    plan = kept._jdf.queryExecution().executedPlan().toString()
    anti = plan[plan.index("BroadcastHashJoin") :]
    left_side = anti[: anti.index("BroadcastExchange")]
    assert "Exchange hashpartitioning" not in left_side


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


def test_digest_algos_agree(spark):
    """xxh128 (fast default) and sha256 digests must produce identical
    dedup decisions — same keepers, same edges — on a corpus with
    planted exact text+payload dups and payload-only differences."""
    import pandas as pd

    rows = []
    for i in range(60):
        text = f"event transcript {i % 20}"       # text dups across i
        payload = bytes([i % 10]) * 40            # payload dups across i
        rows.append({"clip_id": f"c{i:03d}", "transcript_norm": text, "bytes": payload})
    df = spark.createDataFrame(pd.DataFrame(rows))
    out = {}
    for algo in ("xxh128", "sha256"):
        kept, edges = exact_dedup_with_edges(df, algo=algo)
        out[algo] = (
            sorted(r["clip_id"] for r in kept.select("clip_id").collect()),
            sorted(map(tuple, edges.collect())),
        )
    assert out["xxh128"] == out["sha256"]
    assert len(out["xxh128"][1]) > 0  # the corpus really had dups


def test_xxh128_second_word_is_salt_prefixed(spark):
    """The composite key is 128-bit only if the two words are
    independent. Spark chains multi-arg xxhash64 (each argument's hash
    seeds the next), so a SUFFIX salt — xxhash64(col, lit) — makes
    word2 a pure function of word1 = xxhash64(col), silently reducing
    the key to 64 bits. Guard the salt-prefix ordering structurally
    and behaviorally."""
    from pyspark.sql import functions as F

    from sems_event_deduplication_spark.operators.exact_dedup import (
        exact_dedup_digest_keys,
    )

    names, digests = exact_dedup_digest_keys("t", "p")
    # structural: the salt literal precedes the content column
    for d in (digests[1], digests[3]):
        s = str(d)
        assert "xxhash64(#2," in s.replace("'", "").replace('"', ""), s
    # behavioral: word2 differs from the degenerate chained suffix form
    row = (
        spark.createDataFrame([("hello", b"pp")], "t string, p binary")
        .select(
            *digests,
            F.xxhash64(F.col("t"), F.lit("#2")).alias("suffix_chain"),
        )
        .collect()[0]
    )
    assert row["__k_text_2"] != row["suffix_chain"]
    assert row["__k_text_1"] != row["__k_text_2"]
