"""Property-based tests (hypothesis) for the pure kernels.

SURVEY.md §5.4 — these cover the deterministic functions the whole
engine's correctness rests on, without Spark in the loop.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from sems_event_deduplication_spark.functions.audio import (
    _band_edges,
    audio_landmarks,
    decode_pcm,
    pack_bits_to_words,
    snr_db,
    spectral_fingerprint,
)
from sems_event_deduplication_spark.synth import _encode

TEXT = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF), max_size=200
)


@given(st.lists(st.booleans(), min_size=0, max_size=256))
@settings(max_examples=200, deadline=None)
def test_pack_bits_roundtrip(bits):
    """Every input bit is recoverable from its word at position i%64."""
    arr = np.asarray(bits, dtype=bool)
    words = pack_bits_to_words(arr, max(1, len(arr)))
    for i, b in enumerate(bits):
        w = np.uint64(np.int64(words[i // 64]))
        assert bool((w >> np.uint64(i % 64)) & np.uint64(1)) == b


@given(st.integers(min_value=2, max_value=64), st.integers(min_value=8, max_value=513))
@settings(max_examples=200, deadline=None)
def test_band_edges_strictly_increasing(n_bands, n_bins):
    if n_bins <= n_bands + 1:
        return
    edges = _band_edges(n_bins, n_bands)
    assert len(edges) >= n_bands + 1
    assert (np.diff(edges) > 0).all()
    assert edges[0] >= 1 and edges[-1] <= n_bins - 1


@given(
    st.integers(min_value=64, max_value=4096),
    st.floats(min_value=0.05, max_value=1.0, allow_nan=False),
)
@settings(max_examples=50, deadline=None)
def test_fingerprint_amplitude_invariance(n, gain):
    """The fingerprint must be exactly amplitude-invariant (float path:
    no quantization)."""
    rng = np.random.default_rng(n)
    pcm = rng.standard_normal(n).astype(np.float64) * 0.3
    a = spectral_fingerprint(pcm)
    b = spectral_fingerprint(pcm * gain)
    assert np.allclose(a, b, atol=1e-9)


@given(st.integers(min_value=256, max_value=8192))
@settings(max_examples=50, deadline=None)
def test_landmarks_offset_invariant_interior(n):
    """Landmarks of a signal embedded behind an arbitrary pre-roll are a
    superset-modulo-boundary of the signal's own landmarks."""
    rng = np.random.default_rng(n)
    sr = 8000
    t = np.arange(sr) / sr  # 1 s
    sig = sum(
        a * np.sin(2 * np.pi * f * t)
        for f, a in zip(rng.uniform(100, 3000, 6), rng.uniform(0.1, 0.3, 6))
    )
    pre = rng.standard_normal(n) * 0.2
    own = set(audio_landmarks(sig, frame=512, hop=128).tolist())
    embedded = set(audio_landmarks(np.concatenate([pre, sig]), frame=512, hop=128).tolist())
    if own:
        overlap = len(own & embedded) / len(own)
        assert overlap >= 0.6, overlap


@given(st.binary(min_size=0, max_size=512))
@settings(max_examples=200, deadline=None)
def test_decode_s16_total(buf):
    """pcm_s16le decoding never raises and stays in [-1, 1]."""
    buf = buf[: len(buf) // 2 * 2]
    pcm = decode_pcm(buf, "pcm_s16le")
    assert len(pcm) == len(buf) // 2
    if len(pcm):
        assert float(np.abs(pcm).max()) <= 1.0


@given(st.integers(min_value=1, max_value=2000))
@settings(max_examples=50, deadline=None)
def test_snr_roundtrip_encoding(n):
    """16-bit re-encoding of any signal keeps SNR far above the 30 dB
    invariant floor."""
    rng = np.random.default_rng(n)
    pcm = np.clip(rng.standard_normal(n) * 0.3, -0.99, 0.99)
    back = decode_pcm(_encode(pcm, "pcm_s16le"), "pcm_s16le")
    assert snr_db(pcm.astype(np.float32), back) > 40


def test_normalize_text_properties(spark):
    """Idempotence + closed alphabet, via Spark itself (the function is
    a Column expression)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from sems_event_deduplication_spark.functions.text import normalize_text

    samples = [
        "", " ", "Hello, WORLD!", "a|bb|ccc", "tab\tand\xa0nbsp", "ünïcode émoji 🚀",
        "UPPER lower 123", "|||", "x" * 500, "a  b   c",
    ]
    df = spark.createDataFrame(pd.DataFrame({"t": samples}))
    once = df.select(normalize_text(F.col("t")).alias("n1"))
    twice = once.select(F.col("n1"), normalize_text(F.col("n1")).alias("n2"))
    rows = twice.collect()
    for r in rows:
        assert r["n1"] == r["n2"]  # idempotent
        assert all(c.islower() or c.isdigit() or c == " " for c in r["n1"])
        assert "  " not in r["n1"] and r["n1"] == r["n1"].strip()
