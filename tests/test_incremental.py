"""Incremental batch-vs-index dedup (operators/incremental.py)."""

from __future__ import annotations

import pandas as pd
import pytest

from sems_event_deduplication_spark.conf import DedupConfig
from sems_event_deduplication_spark.operators.incremental import (
    batch_vs_index_candidates,
    incremental_dedup,
    sign_batch,
)

BASE = [
    "the quick brown fox jumps over the lazy dog near the riverbank today",
    "heavy rain flooded the central station during the evening commute hours",
    "the council approved a new budget for road maintenance next year",
    "a rare comet will be visible from the northern hemisphere this weekend",
    "local bakery wins the national award for its sourdough bread recipe",
]


@pytest.fixture(scope="module")
def cfg():
    return DedupConfig(jaccard_threshold=0.6)


@pytest.fixture(scope="module")
def index_sigs(spark, cfg):
    idx = spark.createDataFrame(
        pd.DataFrame(
            {"clip_id": [f"idx{i}" for i in range(len(BASE))], "transcript": BASE}
        )
    )
    return sign_batch(idx, cfg).cache()


def test_incremental_dedup_classifies_batch(spark, cfg, index_sigs):
    batch = spark.createDataFrame(
        pd.DataFrame(
            {
                "clip_id": ["b_exact", "b_near", "b_near2", "b_new", "b_new2"],
                "transcript": [
                    BASE[0],  # exact copy (normalizes identical)
                    BASE[1] + " again",  # near dup: small suffix edit
                    BASE[2].replace("next year", "in the coming year"),
                    "completely unrelated fresh content about quantum chess",
                    "another novel clip describing deep sea mining robots",
                ],
            }
        )
    )
    out = incremental_dedup(batch, index_sigs, cfg)
    exact = {(r["id_new"], r["id_indexed"]) for r in out["exact_hits"].collect()}
    near = {(r["id_new"], r["id_indexed"]) for r in out["neardup_hits"].collect()}
    novel = {r["clip_id"] for r in out["novel"].collect()}

    assert exact == {("b_exact", "idx0")}
    assert ("b_near", "idx1") in near and ("b_near2", "idx2") in near
    assert not any(n[0] in ("b_new", "b_new2") for n in near)
    assert novel == {"b_new", "b_new2"}


def test_index_bucket_cap_keeps_representative(spark, cfg):
    """An oversized index bucket contributes only its min-id member —
    the newcomer is still flagged, with O(1) pairs per band."""
    from pyspark.sql import functions as F

    rows = [("n1", 0, 7)]
    batch_banded = spark.createDataFrame(
        pd.DataFrame(rows, columns=["clip_id", "band_id", "band_hash"])
    )
    idx_rows = [(f"i{k:02d}", 0, 7) for k in range(10)]
    index_banded = spark.createDataFrame(
        pd.DataFrame(idx_rows, columns=["clip_id", "band_id", "band_hash"])
    )
    got = batch_vs_index_candidates(
        batch_banded, index_banded, max_bucket_size=4
    ).collect()
    assert [(r["id_new"], r["id_indexed"]) for r in got] == [("n1", "i00")]


def test_exact_tier_shares_pipeline_digest_keys(spark, cfg):
    """The exact tier must key on exact_dedup_digest_keys (the
    pipeline's definition), and reuse the index's persisted key
    columns instead of re-deriving its own digest."""
    from sems_event_deduplication_spark.operators.exact_dedup import (
        exact_dedup_digest_keys,
    )

    keys, _ = exact_dedup_digest_keys("transcript_norm", None, cfg.exact_digest_algo)
    idx = spark.createDataFrame(
        pd.DataFrame({"clip_id": ["i0"], "transcript": [BASE[0]]})
    )
    signed = sign_batch(idx, cfg)
    assert set(keys) <= set(signed.columns), (keys, signed.columns)


def test_payload_keys_same_transcript_different_audio(spark):
    """Flagship semantics (payload_col given): a batch clip with an
    identical transcript but different audio is NOT an exact hit — it
    lands in the near tier via text Jaccard 1.0 (clustered with the
    indexed clip, not silently declared content-identical). With
    identical payload it IS exact."""
    cfg = DedupConfig(jaccard_threshold=0.6)
    idx = spark.createDataFrame(
        pd.DataFrame({
            "clip_id": ["i0", "i1"],
            "transcript": [BASE[0], BASE[1]],
            "bytes": [b"\x01\x02\x03", b"\x04\x05\x06"],
        })
    )
    index_sigs = sign_batch(idx, cfg, payload_col="bytes")
    batch = spark.createDataFrame(
        pd.DataFrame({
            "clip_id": ["b_sametext_diffaudio", "b_sametext_sameaudio"],
            "transcript": [BASE[0], BASE[1]],
            "bytes": [b"\x99\x98\x97", b"\x04\x05\x06"],
        })
    )
    out = incremental_dedup(batch, index_sigs, cfg, payload_col="bytes")
    exact = {(r["id_new"], r["id_indexed"]) for r in out["exact_hits"].collect()}
    near = {(r["id_new"], r["id_indexed"]) for r in out["neardup_hits"].collect()}
    novel = {r["clip_id"] for r in out["novel"].collect()}

    assert exact == {("b_sametext_sameaudio", "i1")}
    assert ("b_sametext_diffaudio", "i0") in near
    assert novel == set()

    # an index signed WITHOUT payload keys must refuse payload-keyed
    # dedup instead of silently weakening the exact definition
    text_only_index = sign_batch(idx, cfg)
    with pytest.raises(ValueError, match="payload digest"):
        incremental_dedup(batch, text_only_index, cfg, payload_col="bytes")
