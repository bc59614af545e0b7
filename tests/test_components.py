"""Connected components vs networkx oracle (SURVEY.md §5 test 1)."""

from __future__ import annotations

import networkx as nx
import numpy as np
import pandas as pd

from sems_event_deduplication_spark.operators.components import (
    assign_components,
    connected_components,
)


def _check_graph(spark, edges: list[tuple[str, str]]):
    g = nx.Graph()
    g.add_edges_from(edges)
    want = {}
    for comp in nx.connected_components(g):
        root = min(comp)
        for n in comp:
            want[n] = root

    edf = spark.createDataFrame(pd.DataFrame(edges, columns=["id_a", "id_b"]))
    got = {
        r["clip_id"]: r["component"]
        for r in connected_components(edf, "id_a", "id_b").collect()
    }
    assert got == want


def test_cc_simple_chain(spark):
    _check_graph(spark, [("b", "c"), ("a", "b"), ("x", "y")])


def test_cc_random_graphs(spark):
    rng = np.random.default_rng(1)
    for trial in range(3):
        n = 60
        m = int(rng.integers(20, 80))
        edges = [
            (f"n{int(rng.integers(0, n)):03d}", f"n{int(rng.integers(0, n)):03d}")
            for _ in range(m)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        _check_graph(spark, edges)


def test_cc_long_path(spark):
    # worst case for label propagation; star/star must converge in O(log n)
    edges = [(f"p{i:03d}", f"p{i+1:03d}") for i in range(40)]
    _check_graph(spark, edges)


def test_cc_local_fast_path_parity(spark):
    """local_threshold union-find must return bit-identical components
    to the distributed alternating-star loop, including on non-string
    id types and duplicate/reversed edges."""
    rng = np.random.default_rng(7)
    edges = [
        (f"n{int(rng.integers(0, 50)):03d}", f"n{int(rng.integers(0, 50)):03d}")
        for _ in range(120)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    edf = spark.createDataFrame(pd.DataFrame(edges, columns=["id_a", "id_b"]))
    info_l, info_d = {}, {}
    local = connected_components(
        edf, "id_a", "id_b", local_threshold=10_000, info=info_l
    ).collect()
    dist = connected_components(edf, "id_a", "id_b", info=info_d).collect()
    assert info_l["mode"] == "local" and info_d["mode"] == "distributed"
    assert sorted(map(tuple, local)) == sorted(map(tuple, dist))

    # integer ids through the fast path keep their type
    iedges = spark.createDataFrame(
        pd.DataFrame([(3, 1), (1, 2), (9, 8)], columns=["id_a", "id_b"])
    )
    got = {
        r["clip_id"]: r["component"]
        for r in connected_components(
            iedges, "id_a", "id_b", local_threshold=100
        ).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 8: 8, 9: 8}


def test_assign_components_singletons(spark):
    nodes = spark.createDataFrame(pd.DataFrame({"clip_id": ["a", "b", "c"]}))
    edf = spark.createDataFrame(pd.DataFrame([("a", "b")], columns=["id_a", "id_b"]))
    comp = connected_components(edf, "id_a", "id_b")
    got = {r["clip_id"]: r["component"] for r in assign_components(nodes, comp).collect()}
    assert got == {"a": "a", "b": "a", "c": "c"}
