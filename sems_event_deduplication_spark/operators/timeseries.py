"""Time-series smoothing + peak detection (SURVEY.md §2.8 F16).

Reference: the crawl scheduler low-pass-filters the daily article-count
series, runs ``scipy.signal.find_peaks``, and turns each peak's width
into a crawl date range (``crawl_from_gdelt.py:53-92``). Re-expressed
Spark-first:

- ``densify_daily``   — fill missing days with 0 (sequence + explode,
  JVM-side; neighbor semantics need a dense grid)
- ``smooth_series``   — centered moving average over a rows-between
  window (the box low-pass; the reference's lpfilter is likewise a
  short symmetric FIR)
- ``detect_peaks``    — local maxima of the smoothed series above a
  height gate, lag/lead windows (endpoints excluded, as find_peaks)
- ``peak_spans``      — per-peak [start, end] at the half-height
  crossing (find_peaks' rel_height=0.5 width), grouped applyInPandas:
  the crossing walk is inherently sequential per series, and one group
  = one (small, day-grained) series, so Python here is per-series, not
  per-row.

All group/window keys are the series id: at 100 TB of events the series
table after the daily pre-aggregation is tiny (groups × days), so every
step downstream of the first groupBy is cheap by construction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def densify_daily(
    counts: DataFrame,
    group_col: str = "series",
    date_col: str = "day",
    value_col: str = "n",
) -> DataFrame:
    """Fill date gaps per group with value 0 over [min(day), max(day)]."""
    spans = counts.groupBy(group_col).agg(
        F.min(date_col).alias("__d0"), F.max(date_col).alias("__d1")
    )
    grid = spans.select(
        group_col,
        F.explode(F.sequence("__d0", "__d1")).alias(date_col),
    )
    return (
        grid.join(counts, [group_col, date_col], "left")
        .withColumn(value_col, F.coalesce(value_col, F.lit(0)))
    )


def smooth_series(
    series: DataFrame,
    group_col: str = "series",
    date_col: str = "day",
    value_col: str = "n",
    radius: int = 2,
    out_col: str = "smoothed",
) -> DataFrame:
    """Centered moving average of width 2·radius+1 (box low-pass)."""
    w = (
        Window.partitionBy(group_col)
        .orderBy(date_col)
        .rowsBetween(-radius, radius)
    )
    return series.withColumn(out_col, F.avg(value_col).over(w))


def detect_peaks(
    series: DataFrame,
    group_col: str = "series",
    date_col: str = "day",
    value_col: str = "smoothed",
    min_height: float = 0.0,
) -> DataFrame:
    """Local maxima of ``value_col``: strictly above the previous
    sample, at least the next (plateau keeps its left edge), above
    ``min_height``; series endpoints are never peaks (find_peaks
    semantics). Adds ``is_peak``."""
    w = Window.partitionBy(group_col).orderBy(date_col)
    prev = F.lag(value_col).over(w)
    nxt = F.lead(value_col).over(w)
    return series.withColumn(
        "is_peak",
        prev.isNotNull()
        & nxt.isNotNull()
        & (F.col(value_col) > prev)
        & (F.col(value_col) >= nxt)
        & (F.col(value_col) >= F.lit(min_height)),
    )


_SPAN_SCHEMA = (
    "series string, peak_day date, peak_height double, "
    "start_day date, end_day date"
)


def _spans_one_series(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("day").reset_index(drop=True)
    vals = pdf["smoothed"].to_numpy(dtype=np.float64)
    days = pdf["day"].to_numpy()
    rows = []
    for i in np.nonzero(pdf["is_peak"].to_numpy())[0]:
        half = vals[i] / 2.0
        lo = i
        while lo > 0 and vals[lo - 1] >= half:
            lo -= 1
        hi = i
        while hi < len(vals) - 1 and vals[hi + 1] >= half:
            hi += 1
        rows.append(
            {
                "series": pdf["series"].iloc[0],
                "peak_day": days[i],
                "peak_height": float(vals[i]),
                "start_day": days[lo],
                "end_day": days[hi],
            }
        )
    return pd.DataFrame(rows, columns=[
        "series", "peak_day", "peak_height", "start_day", "end_day",
    ])


def peak_spans(
    flagged: DataFrame,
    group_col: str = "series",
    date_col: str = "day",
    value_col: str = "smoothed",
) -> DataFrame:
    """(series, day, smoothed, is_peak) -> one row per peak with its
    half-height [start_day, end_day] span — the reference's
    width -> crawl-date-range step."""
    cols = flagged.select(
        F.col(group_col).cast("string").alias("series"),
        F.col(date_col).alias("day"),
        F.col(value_col).cast("double").alias("smoothed"),
        "is_peak",
    )
    return cols.groupBy("series").applyInPandas(_spans_one_series, _SPAN_SCHEMA)


def daily_event_peaks(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    radius: int = 2,
    min_height: float = 0.0,
) -> DataFrame:
    """The reference dataflow end-to-end over an events table:
    daily counts per group -> densify -> smooth -> flag peaks."""
    counts = events.groupBy(
        F.col(group_col).alias("series"),
        F.to_date(ts_col).alias("day"),
    ).agg(F.count(F.lit(1)).alias("n"))
    dense = densify_daily(counts)
    sm = smooth_series(dense, radius=radius)
    return detect_peaks(sm, min_height=min_height)
