"""Structured Streaming front-end for the dedup engine.

The reference is wholly batch (SURVEY.md §2.10); streaming here covers
the ingest-side operators a 10^12-scale pipeline needs in front of the
batch dedup stages:

- ``streaming_exact_dedup``: watermarked ``dropDuplicates`` on the
  content digest — exact dedup of an unbounded clip stream with
  bounded state.
- ``streaming_signature_counts``: windowed near-dup *pressure* metric
  (distinct rolling-fingerprint count per window) — cheap online
  signal of duplication rate feeding the batch scheduler.

Both are testable synchronously with a memory sink
(``processAllAvailable``), which is how the driver query runs them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalize_text
from ..operators.textstats import rolling_fingerprint


def streaming_exact_dedup(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Exact dedup over a stream of clips with event-time bound state.

    Key = sha2 of normalized transcript + sha2 payload; state for keys
    older than the watermark is dropped (at 10^12 scale unbounded
    dedup state is impossible — the watermark IS the design decision).
    """
    keyed = stream.withColumn(
        "ts", F.col("ts").cast("timestamp")
    ).withColumn(
        "content_key",
        F.sha2(
            F.concat_ws(
                "\u0000",
                normalize_text(F.col("transcript")),
                F.sha2(F.col("bytes"), 256),
            ),
            256,
        ),
    )
    return keyed.withWatermark("ts", watermark).dropDuplicates(["content_key"])


def streaming_signature_counts(
    stream: DataFrame, window: str = "10 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Distinct rolling-fingerprint count per event-time window."""
    fp = stream.withColumn("ts", F.col("ts").cast("timestamp")).withColumn(
        "fp", rolling_fingerprint(normalize_text(F.col("transcript")))
    )
    return (
        fp.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window))
        .agg(
            F.approx_count_distinct("fp").alias("approx_distinct_fps"),
            F.count(F.lit(1)).alias("n_clips"),
        )
    )


def run_stream_to_memory(agg: DataFrame, name: str, output_mode: str = "complete"):
    """Drive a bounded source to completion synchronously; returns the
    in-memory result table name."""
    q = (
        agg.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return name
