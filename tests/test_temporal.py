"""Temporal semantics: 1-D DBSCAN parity + interval merge gate (W2/J2)."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd

from sems_event_deduplication_spark.operators.temporal import (
    dbscan_1d_segments,
    interval_merge_edges,
    keep_largest_segment,
)


def _dbscan_1d_oracle(days: list[int], eps: int, min_samples: int) -> dict[int, int | None]:
    """Tiny numpy DBSCAN on the day axis with the same border rule as the
    Spark operator (border -> nearest core day, ties -> earlier)."""
    days_arr = np.array(sorted(set(days)))
    counts = {d: days.count(d) for d in days_arr}
    core = []
    for d in days_arr:
        nbrs = sum(c for dd, c in counts.items() if abs(dd - d) <= eps)
        if nbrs >= min_samples:
            core.append(d)
    seg_of_core: dict[int, int] = {}
    seg = 0
    prev = None
    for d in core:
        if prev is None or d - prev > eps:
            seg += 1
        seg_of_core[d] = seg
        prev = d
    out: dict[int, int | None] = {}
    for d in days_arr:
        cands = [(abs(d - c), c) for c in core if abs(d - c) <= eps]
        out[d] = seg_of_core[min(cands)[1]] if cands else None
    return out


def _run_spark_dbscan(spark, days: list[int], eps=1, min_samples=3):
    base = dt.date(2023, 5, 1)
    pdf = pd.DataFrame(
        {
            "component": ["k"] * len(days),
            "clip_id": [f"c{i}" for i in range(len(days))],
            "event_date": [base + dt.timedelta(days=d) for d in days],
        }
    )
    df = spark.createDataFrame(pdf)
    got = dbscan_1d_segments(df, "component", "event_date", eps, min_samples)
    rows = got.select("clip_id", "segment").collect()
    day_of = {f"c{i}": d for i, d in enumerate(days)}
    return {day_of[r["clip_id"]]: r["segment"] for r in rows}


def _norm(m: dict[int, int | None]) -> dict[int, int | None]:
    """Relabel segment ids in first-appearance order for comparison."""
    remap: dict[int, int] = {}
    out = {}
    for d in sorted(m):
        s = m[d]
        if s is None:
            out[d] = None
        else:
            remap.setdefault(s, len(remap) + 1)
            out[d] = remap[s]
    return out


def test_dbscan_parity_cases(spark):
    cases = [
        [0, 0, 1, 2, 10, 10, 11, 30],          # two dense runs + outlier
        [0, 5, 10],                            # all noise
        [0, 0, 0],                             # single dense day
        [0, 1, 2, 3, 4],                       # one chain
        [0, 0, 1, 4, 5, 5, 6, 20, 20, 20],     # three groups
        [0, 2, 2, 2, 3, 4],                    # border day at 0? dist 2 > eps -> noise
    ]
    for days in cases:
        want = _norm(_dbscan_1d_oracle(days, 1, 3))
        got = _norm(_run_spark_dbscan(spark, days))
        assert got == want, (days, want, got)


def test_keep_largest_segment(spark):
    days = [0, 0, 1, 10, 10, 11, 11]  # second run larger
    base = dt.date(2023, 5, 1)
    pdf = pd.DataFrame(
        {
            "component": ["k"] * len(days),
            "clip_id": [f"c{i}" for i in range(len(days))],
            "event_date": [base + dt.timedelta(days=d) for d in days],
        }
    )
    seg = dbscan_1d_segments(spark.createDataFrame(pdf))
    kept = keep_largest_segment(seg)
    got_days = sorted(
        (r["event_date"] - base).days for r in kept.select("event_date").collect()
    )
    assert got_days == [10, 10, 11, 11]


def test_interval_merge_edges(spark):
    base = dt.date(2023, 5, 1)
    rows = []
    # clusters: A spans day 0-2, B spans day 5-6 (gap 3 <= 10 -> edge),
    # C spans day 30-31 (gap > 10 from both -> no edge)
    for cid, ds in [("A", [0, 1, 2]), ("B", [5, 6]), ("C", [30, 31])]:
        for i, d in enumerate(ds):
            rows.append(
                {"component": cid, "clip_id": f"{cid}{i}", "event_date": base + dt.timedelta(days=d)}
            )
    df = spark.createDataFrame(pd.DataFrame(rows))
    got = {(r["ca"], r["cb"]) for r in interval_merge_edges(df, max_gap_days=10).collect()}
    assert got == {("A", "B")}


def test_interval_merge_banded_vs_broadcast_parity(spark):
    """The banded (equi-join) form must return exactly the broadcast
    nested-loop form's pairs on a 10^4-cluster corpus with mixed span
    widths, including spans wide enough to hit the wide-span fallback."""
    import numpy as np

    rng = np.random.default_rng(11)
    base = dt.date(2022, 1, 1)
    rows = []
    for c in range(10_000):
        start = int(rng.integers(0, 3000))
        # mostly short event spans; ~0.5% pathological multi-year spans
        span = int(rng.integers(0, 15)) if rng.random() > 0.005 else int(
            rng.integers(600, 1200)
        )
        rows.append(
            {
                "component": f"c{c:05d}",
                "event_date": base + dt.timedelta(days=start),
            }
        )
        rows.append(
            {
                "component": f"c{c:05d}",
                "event_date": base + dt.timedelta(days=start + span),
            }
        )
    df = spark.createDataFrame(pd.DataFrame(rows))
    banded = interval_merge_edges(df, max_gap_days=7, strategy="banded")
    brd = interval_merge_edges(df, max_gap_days=7, strategy="broadcast")
    got_b = {(r["ca"], r["cb"]) for r in banded.collect()}
    got_n = {(r["ca"], r["cb"]) for r in brd.collect()}
    assert got_b == got_n
    assert len(got_b) > 0


def test_interval_merge_banded_plan_no_nested_loop(spark):
    """The banded form's candidate join must plan as an equi-join on
    the bucket key — a BroadcastNestedLoopJoin for narrow spans would
    be the O(C^2) shape the banding exists to kill. (The wide-span
    fallback contributes one BNLJ over a provably tiny side; narrow
    spans here stay under max_span_bands, and the narrow-side join must
    be hash/sort-merge.)"""
    base = dt.date(2023, 1, 1)
    rows = [
        {"component": f"c{c}", "event_date": base + dt.timedelta(days=c % 40)}
        for c in range(200)
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    edges = interval_merge_edges(df, max_gap_days=5, strategy="banded")
    plan = edges._jdf.queryExecution().executedPlan().toString()
    # exactly the wide-fallback BNLJ may appear; the bucket join must not
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    )
