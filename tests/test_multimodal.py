"""Multimodal plumbing: mapInPandas image features + frame-sample plan."""

from __future__ import annotations

import numpy as np
import pandas as pd

from sems_event_deduplication_spark.operators.multimodal import (
    frame_sample_plan,
    image_features,
    make_fake_image,
)


def test_image_features_roundtrip(spark):
    rng = np.random.default_rng(0)
    pdf = pd.DataFrame(
        {
            "item_id": ["i1", "i2", "i3"],
            "bytes": [make_fake_image(rng), make_fake_image(rng, 4, 4), b"\x00" * 32],
            "fmt": ["fake_rgb", "fake_rgb", "jpeg"],
        }
    )
    got = {r["item_id"]: r for r in image_features(spark.createDataFrame(pdf)).collect()}
    assert got["i1"]["decode_ok"] and got["i1"]["width"] == 8 and got["i1"]["n_channels"] == 3
    assert got["i2"]["decode_ok"] and got["i2"]["height"] == 4
    assert len(got["i1"]["feature"]) == 16
    assert abs(sum(got["i1"]["feature"]) - 1.0) < 1e-5
    # unsupported codec is surfaced, not silently fabricated
    assert not got["i3"]["decode_ok"] and got["i3"]["feature"] is None


def test_frame_sample_plan(spark):
    pdf = pd.DataFrame({"item_id": ["v1"], "dur_ms": [3500]})
    got = frame_sample_plan(spark.createDataFrame(pdf), every_ms=1000).collect()
    assert [r["frame_ts_ms"] for r in got] == [0, 1000, 2000, 3000]
