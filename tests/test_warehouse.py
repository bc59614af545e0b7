"""WarehouseIO: chunked incremental commits (S8) + bucketed join layout."""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import functions as F

from sems_event_deduplication_spark.sources.warehouse import WarehouseIO


def _df(spark, n=100):
    return spark.createDataFrame(
        pd.DataFrame({"clip_id": [f"c{i:04d}" for i in range(n)], "v": range(n)})
    )


def test_checkpoint_chunked_roundtrip_and_resume(spark, tmp_path):
    wh = WarehouseIO(spark, str(tmp_path))
    df = _df(spark)
    out = wh.checkpoint_chunked(df, "stage_a", "clip_id", n_chunks=4)
    assert out.count() == 100
    assert set(out.columns) == {"clip_id", "v"}
    base = os.path.join(str(tmp_path), "stage_a")
    chunks = sorted(d for d in os.listdir(base) if d.startswith("chunk="))
    assert len(chunks) == 4
    assert all(os.path.exists(os.path.join(base, c, "_SUCCESS")) for c in chunks)

    # simulate a mid-stage kill: nuke two chunks' commit markers and
    # poison their data — resume must rewrite ONLY those chunks
    import shutil

    for c in chunks[:2]:
        shutil.rmtree(os.path.join(base, c))
    kept_mtime = {
        c: os.path.getmtime(os.path.join(base, c, "_SUCCESS")) for c in chunks[2:]
    }
    out2 = wh.checkpoint_chunked(df, "stage_a", "clip_id", n_chunks=4, resume=True)
    assert out2.count() == 100
    for c in chunks[2:]:
        assert os.path.getmtime(os.path.join(base, c, "_SUCCESS")) == kept_mtime[c]


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Two tables bucketed on clip_id joined on clip_id must plan with
    zero Exchange operators — the shuffle-free 100 TB payload
    re-attach layout referenced by exact_dedup_with_edges. Broadcast
    is disabled for the assertion: at the scale this layout exists for,
    neither side broadcasts, and the point is that the sort-merge join
    then needs NO shuffle (at test sizes the planner would otherwise
    just broadcast the small side and never exercise the bucketing)."""
    wh = WarehouseIO(spark, str(tmp_path))
    big = wh.save_bucketed(_df(spark, 200), "wt_payload", "clip_id", n_buckets=8)
    ids = wh.save_bucketed(
        _df(spark, 200).select("clip_id").sample(0.5, seed=1),
        "wt_keepers", "clip_id", n_buckets=8,
    )
    keys = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    )
    old = {k: spark.conf.get(k, None) for k in keys}
    try:
        for k in keys:
            spark.conf.set(k, "-1")
        joined = big.join(ids, "clip_id", "left_semi")
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan
    finally:
        for k, v in old.items():
            spark.conf.set(k, v) if v is not None else spark.conf.unset(k)
        spark.sql("DROP TABLE IF EXISTS wt_payload")
        spark.sql("DROP TABLE IF EXISTS wt_keepers")


def test_checkpoint_chunked_stale_chunks_cleared(spark, tmp_path):
    """A fresh (non-resume) run with fewer chunks must not read back
    stale chunk dirs from an earlier larger-n_chunks run, and a resume
    under a CHANGED chunk config must invalidate the old layout
    (committed chunks hold rows assigned under a different modulus)."""
    from sems_event_deduplication_spark.sources.warehouse import WarehouseIO

    wh = WarehouseIO(spark, str(tmp_path))
    df = spark.range(100).select(F.col("id").cast("string").alias("clip_id"))

    out4 = wh.checkpoint_chunked(df, "s", "clip_id", n_chunks=4)
    assert out4.count() == 100
    out2 = wh.checkpoint_chunked(df, "s", "clip_id", n_chunks=2)
    assert out2.count() == 100  # was 160 with stale chunk=2..3 leaking in

    # resume with a different n_chunks: marker mismatch -> full rebuild
    out3 = wh.checkpoint_chunked(df, "s", "clip_id", n_chunks=3, resume=True)
    assert out3.count() == 100
    assert sorted(r["clip_id"] for r in out3.collect()) == sorted(
        str(i) for i in range(100)
    )
