"""Multimodal binary-column plumbing (image / video frames / generic).

Pattern: opaque ``binary`` payload + typed metadata columns, processed
by ``mapInPandas`` in Arrow batches — the same shape as the audio path
(which is fully real in functions/audio.py). The image/video *decode*
steps are STUBBED (this container ships no codec libraries): the
Spark-side plumbing — schema, batch iteration, partitioning, UDF
signatures — is real and tested with the deterministic fake decoder.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_FEATURE_SCHEMA = (
    "item_id string, width int, height int, n_channels int, "
    "feature array<float>, decode_ok boolean"
)


def decode_image(buf: bytes, fmt: str) -> np.ndarray:
    """Decode an encoded image to an HxWxC uint8 array.

    STUB: real decode needs Pillow/libjpeg (not in this container).
    ``fake_rgb`` is a deterministic stand-in for tests; any real format
    raises so callers fail loudly rather than silently fabricate data.
    """
    if fmt == "fake_rgb":
        # header: 4B width, 4B height little-endian, then raw RGB
        w = int.from_bytes(buf[0:4], "little")
        h = int.from_bytes(buf[4:8], "little")
        return np.frombuffer(buf[8 : 8 + w * h * 3], dtype=np.uint8).reshape(h, w, 3)
    raise NotImplementedError(
        f"image format {fmt!r}: no codec libraries in this environment "
        "(plumbing is real; swap in PIL.Image.open at deploy time)"
    )


def image_features(df: DataFrame, n_bins: int = 16) -> DataFrame:
    """(item_id, bytes, fmt) -> per-image histogram feature via
    mapInPandas. Arrow-batched; one numpy pass per image."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for item_id, buf, fmt in zip(pdf["item_id"], pdf["bytes"], pdf["fmt"]):
                try:
                    img = decode_image(bytes(buf), fmt)
                    hist = np.histogram(img, bins=n_bins, range=(0, 255))[0]
                    feat = (hist / max(1, hist.sum())).astype(np.float32)
                    out.append(
                        (item_id, img.shape[1], img.shape[0], img.shape[2],
                         feat.tolist(), True)
                    )
                except NotImplementedError:
                    out.append((item_id, None, None, None, None, False))
            yield pd.DataFrame(
                out,
                columns=["item_id", "width", "height", "n_channels", "feature", "decode_ok"],
            )

    return df.select("item_id", "bytes", "fmt").mapInPandas(op, IMAGE_FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: expand (item_id, dur_ms) into frame
    timestamps JVM-side (explode over a sequence) — the expensive
    decode of each sampled frame would be a mapInPandas over this plan.
    Demonstrates keeping the combinatorial expansion out of Python."""
    return df.select(
        "item_id",
        F.explode(
            F.sequence(F.lit(0), F.col("dur_ms") - 1, F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


def make_fake_image(rng: np.random.Generator, w: int = 8, h: int = 8) -> bytes:
    raw = rng.integers(0, 256, size=w * h * 3, dtype=np.uint8).tobytes()
    return w.to_bytes(4, "little") + h.to_bytes(4, "little") + raw
