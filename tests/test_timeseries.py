"""Time-series smoothing + peak detection (F16) vs a numpy oracle
(reference dataflow: crawl_from_gdelt.py:53-92)."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from sems_event_deduplication_spark.operators.timeseries import (
    daily_event_peaks,
    densify_daily,
    detect_peaks,
    peak_spans,
    smooth_series,
)


def _series_pdf():
    # two series with planted peaks and an interior date gap; densify
    # fills [min(day), max(day)], so expected values are trimmed to the
    # first/last observed day
    d0 = dt.date(2024, 1, 1)
    rows = []
    vals_a = [1, 5, 9, 5, 1, 0, 0, 2, 7, 12, 7, 2]  # zeros = gap days
    for i, v in enumerate(vals_a):
        if v > 0:
            rows.append({"series": "a", "day": d0 + dt.timedelta(days=i), "n": v})
    vals_b = [3, 3, 3, 3, 3, 3]
    for i, v in enumerate(vals_b):
        rows.append({"series": "b", "day": d0 + dt.timedelta(days=i), "n": v})
    return pd.DataFrame(rows), {"a": vals_a, "b": vals_b}


def _np_smooth(vals, radius):
    out = []
    for i in range(len(vals)):
        lo, hi = max(0, i - radius), min(len(vals), i + radius + 1)
        out.append(float(np.mean(vals[lo:hi])))
    return out


def test_densify_smooth_peaks_match_numpy(spark):
    pdf, truth = _series_pdf()
    dense = densify_daily(spark.createDataFrame(pdf))
    sm = smooth_series(dense, radius=2)
    flagged = (
        detect_peaks(sm, min_height=1.0)
        .orderBy("series", "day")
        .toPandas()
    )
    for name, vals in truth.items():
        sub = flagged[flagged["series"] == name]
        assert list(sub["n"]) == vals  # densify restored the gaps
        want_sm = _np_smooth(vals, 2)
        assert list(sub["smoothed"]) == pytest.approx(want_sm)
        want_peaks = [
            0 < i < len(want_sm) - 1
            and want_sm[i] > want_sm[i - 1]
            and want_sm[i] >= want_sm[i + 1]
            and want_sm[i] >= 1.0
            for i in range(len(want_sm))
        ]
        assert list(sub["is_peak"]) == want_peaks
    # flat series has no peaks
    assert not flagged[flagged["series"] == "b"]["is_peak"].any()


def test_peak_spans_half_height(spark):
    pdf, truth = _series_pdf()
    dense = densify_daily(spark.createDataFrame(pdf))
    flagged = detect_peaks(smooth_series(dense, radius=1), min_height=1.0)
    spans = peak_spans(flagged).orderBy("series", "peak_day").toPandas()
    assert len(spans) >= 2  # both planted bumps in series a found
    for _, row in spans.iterrows():
        vals = truth[row["series"]]
        sm = _np_smooth(vals, 1)
        d0 = dt.date(2024, 1, 1)
        i = (row["peak_day"] - d0).days
        half = sm[i] / 2
        lo, hi = i, i
        while lo > 0 and sm[lo - 1] >= half:
            lo -= 1
        while hi < len(sm) - 1 and sm[hi + 1] >= half:
            hi += 1
        assert (row["start_day"] - d0).days == lo
        assert (row["end_day"] - d0).days == hi


def test_daily_event_peaks_runs_on_events(spark):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = daily_event_peaks(events, min_height=0.5)
    pdf = out.toPandas()
    assert {"series", "day", "n", "smoothed", "is_peak"} <= set(pdf.columns)
    assert len(pdf) > 0
