"""Count-gated broadcast hint (operators/strategies.py)."""

from __future__ import annotations

import pandas as pd

from sems_event_deduplication_spark.operators.strategies import gated_broadcast


def _frames(spark):
    base = spark.createDataFrame(
        pd.DataFrame({"k": [f"k{i}" for i in range(50)], "x": range(50)})
    )
    dim = spark.createDataFrame(
        pd.DataFrame({"k": [f"k{i}" for i in range(0, 50, 2)], "y": range(25)})
    )
    return base, dim


def _executed_plan(df) -> str:
    df.collect()  # finalize AQE so the plan shows the real join
    return df._jdf.queryExecution().executedPlan().toString()


def test_under_cap_broadcast_join(spark):
    base, dim = _frames(spark)
    joined = base.join(gated_broadcast(dim, cap_rows=100), "k")
    assert "BroadcastHashJoin" in _executed_plan(joined)


def test_over_cap_no_forced_broadcast(spark):
    base, dim = _frames(spark)
    # a tiny frame over a tiny cap: the gate must NOT hint; AQE may
    # still choose broadcast from runtime sizes, so assert on the
    # pre-AQE logical plan (no hint node) rather than the physical join
    hinted = gated_broadcast(dim, cap_rows=2)
    plan = base.join(hinted, "k")._jdf.queryExecution().analyzed().toString()
    assert "Hint" not in plan


def test_results_identical_both_branches(spark):
    base, dim = _frames(spark)
    joined_b = base.join(gated_broadcast(dim, cap_rows=100), "k")
    joined_p = base.join(gated_broadcast(dim, cap_rows=0), "k")
    assert sorted(map(tuple, joined_b.collect())) == sorted(
        map(tuple, joined_p.collect())
    )


def test_gate_registry_is_bounded(spark, monkeypatch):
    """Sessions that never call release_gated_broadcasts() must pin at
    most _MAX_GATED aggregates — the oldest is evicted (unpersisted)
    past the cap, and later consumers just recompute lineage."""
    from sems_event_deduplication_spark.operators import strategies

    strategies.release_gated_broadcasts()
    monkeypatch.setattr(strategies, "_MAX_GATED", 2)
    base, dim = _frames(spark)
    frames = [gated_broadcast(dim.filter(f"y >= {i}"), cap_rows=100) for i in range(4)]
    assert len(strategies._gated_frames) == 2
    # evicted frames still produce correct results via lineage recompute
    assert base.join(frames[0], "k").count() == 25
    assert strategies.release_gated_broadcasts() == 2


def test_gate_keeps_lineage_and_releases(spark):
    """The gate must persist (lineage retained: an executor loss
    recomputes lost blocks) rather than localCheckpoint (whose RDD
    blocks are unrecoverable), and release_gated_broadcasts() must
    unpersist everything the gate pinned since the last release."""
    from sems_event_deduplication_spark.operators.strategies import (
        release_gated_broadcasts,
    )

    release_gated_broadcasts()  # clean slate from earlier tests
    base, dim = _frames(spark)
    hinted = gated_broadcast(dim, cap_rows=100)
    # localCheckpoint would replace the plan with a Scan ExistingRDD,
    # severing lineage — the analyzed plan must keep the original tree
    assert "ExistingRDD" not in hinted._jdf.queryExecution().analyzed().toString()
    base.join(hinted, "k").collect()
    assert release_gated_broadcasts() == 1
    # cap_rows=0 takes the no-materialization path: nothing to release
    gated_broadcast(dim, cap_rows=0)
    assert release_gated_broadcasts() == 0
