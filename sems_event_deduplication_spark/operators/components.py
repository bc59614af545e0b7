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


def _local_union_find(pdf, u_type, v_type, spark) -> DataFrame:
    """Driver-side union-find over a BOUNDED, Arrow-collected edge
    frame (pandas columns ``u``, ``v``). Union-by-min: a root is always
    the minimum id of its set, so resolution yields the canonical
    component directly — identical output to the distributed fixpoint
    (min member id), deterministic under any input order because min is
    order-free.

    Ids are factorized to integer codes ranked by id value, so the
    union-find runs over numpy int arrays instead of Python-object
    dicts/sets — the driver cost is two int arrays of |V| plus ONE
    Python pass over the |E| edge codes, not |E| Row objects plus a
    |V|-string dict (an order of magnitude less Python heap at the
    threshold edge counts)."""
    import numpy as np
    import pandas as pd

    m = len(pdf)
    codes, uniques = pd.factorize(
        pd.concat([pdf["u"], pdf["v"]], ignore_index=True), sort=False
    )
    if (codes < 0).any():
        # factorize encodes nulls as -1, which would silently wrap to
        # the max rank below and union unrelated components. The caller
        # filters nulls via its u != v predicate; keep that invariant
        # loud rather than corrupting output if a new call path skips it
        raise ValueError("_local_union_find: edge list contains null ids")
    uniques = np.asarray(uniques)
    n = len(uniques)
    # rank space: rank i <-> i-th smallest id value, so "union by min
    # rank" IS "union by min id" and the output comes out id-sorted
    order = np.argsort(uniques, kind="stable")
    rank_of_code = np.empty(n, dtype=np.int64)
    rank_of_code[order] = np.arange(n, dtype=np.int64)
    uniques_sorted = uniques[order]
    eu = rank_of_code[codes[:m]]
    ev = rank_of_code[codes[m:]]

    parent = np.arange(n, dtype=np.int64)

    def find(x: int) -> int:
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != x:  # path compression
            parent[x], x = r, parent[x]
        return r

    for u, v in zip(eu.tolist(), ev.tolist()):
        ru, rv = find(u), find(v)
        if ru == rv:
            continue
        if ru < rv:
            parent[rv] = ru
        else:
            parent[ru] = rv
    # resolve every node to its root with vectorized pointer jumping
    while True:
        nxt = parent[parent]
        if np.array_equal(nxt, parent):
            break
        parent = nxt
    # every node that appears in an edge gets a row — roots map to
    # themselves, exactly like the distributed fixpoint's output
    out = pd.DataFrame(
        {"clip_id": uniques_sorted, "component": uniques_sorted[parent]}
    )
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("clip_id", u_type, True),
        T.StructField("component", v_type, True),
    ])
    return spark.createDataFrame(out, schema=schema)


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 25,
    local_threshold: int = 0,
    info: dict | None = None,
) -> DataFrame:
    """edge list -> (clip_id, component) with component = min member id.

    Isolated nodes don't appear (callers left-join and coalesce to the
    node's own id — see ``assign_components``).

    ``local_threshold`` > 0 enables a small-graph fast path: the first
    fingerprint job (needed anyway to seed convergence detection)
    returns the distinct edge count; at or below the threshold the edge
    list is collected once and resolved with driver union-find — 2 jobs
    total instead of 4-star-round + fingerprint jobs per iteration. The
    result is bit-identical (component = min member id either way).
    This is an AQE-style runtime choice, NOT the scale path: above the
    threshold (default: always) the distributed alternating-star loop
    runs, and that is the only path that exists for graphs that don't
    fit one machine. Size the threshold to driver memory — 10^6 edges
    of 40-char string ids ≈ 10^2 MB collected.

    ``info`` (optional dict) receives observability fields:
    ``n_edges``, ``mode`` ("local"|"distributed"), ``iterations``.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).filter(
        F.col("u") != F.col("v")
    ).distinct().localCheckpoint(eager=False)

    if local_threshold > 0:
        # ONE driver job decides the path AND fetches the edges (r6):
        # limit(threshold+1).toPandas() materializes the lazy
        # checkpoint; when it returns <= threshold rows those rows ARE
        # the complete distinct edge set, so the union-find runs
        # without the separate fingerprint-count job the old gate paid
        # (2 jobs -> 1 on the small-graph path every pipeline run
        # takes at bench scale). One extra row means the graph is big:
        # fall through to the distributed loop, whose fingerprint job
        # reuses the materialized checkpoint.
        probe = e.limit(local_threshold + 1).toPandas()
        if len(probe) <= local_threshold:
            if info is not None:
                info["n_edges"] = len(probe)
                info["mode"], info["iterations"] = "local", 0
            if len(probe) == 0:
                # no edges: every node is a singleton; match the
                # distributed path's empty (clip_id, component) output
                utype = dict(
                    zip(e.schema.names, [f.dataType for f in e.schema.fields])
                )
                from pyspark.sql import types as T

                return edges.sparkSession.createDataFrame(
                    [],
                    T.StructType([
                        T.StructField("clip_id", utype["u"], True),
                        T.StructField("component", utype["v"], True),
                    ]),
                )
            utype = dict(zip(e.schema.names, [f.dataType for f in e.schema.fields]))
            return _local_union_find(
                probe, utype["u"], utype["v"], edges.sparkSession,
            )

    # seeds convergence (and, when the local gate above fell through,
    # reports the exact edge count): if the input is already at
    # fixpoint the loop below exits after one iteration
    prev_fp = _edge_fingerprint(e)
    n_edges = prev_fp[0]
    if info is not None:
        info["n_edges"] = n_edges

    iters = 0
    for _ in range(max_iterations):
        # two alternating rounds per materialization: star rounds after
        # the fixpoint are no-ops, so doubling up halves the number of
        # driver jobs (the loop is latency-bound, not throughput-bound)
        # without changing the result. The lazy localCheckpoint is
        # materialized by the fingerprint aggregate — one job per pass —
        # and truncates the plan for the next one.
        e = _small_star(_large_star(_small_star(_large_star(e)))).localCheckpoint(eager=False)
        fp = _edge_fingerprint(e)
        iters += 1
        if fp == prev_fp:
            break
        prev_fp = fp
    if info is not None:
        info["mode"], info["iterations"] = "distributed", iters

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
