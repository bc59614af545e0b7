"""Connected components: iterative large-star / small-star (SURVEY.md G3).

The reference merges transitively with an order-dependent, single-pass
Python list mutation (``create_silver_label.py:384-403``). That is both
wrong (misses merges) and undistributable. This module implements the
alternating large-star/small-star algorithm of Kiveris et al.,
"Connected Components in MapReduce and Beyond" (SOCC'14) — the standard
DataFrame-only formulation:

    large-star: for each node u, every neighbor v > u re-points to
                m(u) = min(u ∪ N(u))
    small-star: orient edges u > v; every neighbor (and u) re-points
                to min(N(u) ∪ {u})

Node ids are the string clip_ids — the canonical component id is the
lexicographic min, which also serves as the survivor key (W6),
deterministic under input permutation.

Physical shape (latency matters as much as throughput — the loop runs
O(log n) rounds and every extra shuffle or job multiplies):

- each star pass computes the per-node min with a **window over the
  same partitioning as the re-point**, not a groupBy+self-join — one
  shuffle per pass instead of two;
- each iteration issues exactly **one job**: a lazy ``localCheckpoint``
  (plan/lineage truncation — iterative loops otherwise grow the
  Catalyst tree superlinearly) is materialized by the convergence-
  fingerprint aggregate itself;
- convergence = edge multiset (count, xor-hash) stable across an
  iteration (SURVEY.md §4 "CC convergence/lineage blowup").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """edges(u,v) undirected-as-given -> re-pointed edges."""
    nbrs = edges.select("u", "v").unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    w = Window.partitionBy("u")
    return (
        nbrs.withColumn("m", F.least(F.min("v").over(w), F.col("u")))
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        # no distinct here: small-star dedups once per full iteration,
        # so duplicate edges ride along exactly one extra shuffle
    )


def _small_star(edges: DataFrame) -> DataFrame:
    e = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v"))
    w = Window.partitionBy("u")
    with_min = e.withColumn("m", F.min("v").over(w))
    nbr_edges = with_min.select(F.col("v").alias("u"), F.col("m").alias("v"))
    self_edges = with_min.select("u", F.col("m").alias("v"))
    return (
        nbr_edges.unionByName(self_edges)
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _edge_fingerprint(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """edge list -> (clip_id, component) with component = min member id.

    Isolated nodes don't appear (callers left-join and coalesce to the
    node's own id — see ``assign_components``).
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).filter(
        F.col("u") != F.col("v")
    ).distinct().localCheckpoint(eager=False)

    prev_fp = None
    for _ in range(max_iterations):
        # two alternating rounds per materialization: star rounds after
        # the fixpoint are no-ops, so doubling up halves the number of
        # driver jobs (the loop is latency-bound, not throughput-bound)
        # without changing the result. The lazy localCheckpoint is
        # materialized by the fingerprint aggregate — one job per pass —
        # and truncates the plan for the next one.
        e = _small_star(_large_star(_small_star(_large_star(e)))).localCheckpoint(eager=False)
        fp = _edge_fingerprint(e)
        if fp == prev_fp:
            break
        prev_fp = fp

    # At fixpoint every edge is (member -> root); roots map to themselves.
    members = e.select(F.col("u").alias("clip_id"), F.col("v").alias("component"))
    roots = e.select(F.col("v").alias("clip_id")).distinct().withColumn(
        "component", F.col("clip_id")
    )
    return members.unionByName(roots).groupBy("clip_id").agg(
        F.min("component").alias("component")
    )


def assign_components(
    nodes: DataFrame, components: DataFrame, id_col: str = "clip_id"
) -> DataFrame:
    """Every node gets a component; singletons become their own component."""
    return (
        nodes.join(components, nodes[id_col] == components["clip_id"], "left")
        .drop(components["clip_id"])
        .withColumn("component", F.coalesce(F.col("component"), F.col(id_col)))
    )
