"""Deterministic synthetic audio_clips corpus (FIXTURES.md §1).

Seeded generator for the BASELINE.json input table shape::

    clip_id:string, bytes:binary, sr_hz:int32, dur_ms:int32,
    codec:string, transcript:string  (+ event_date, + sidecar group_id)

Planted duplicate kinds (FIXTURES.md §1):
  exact        identical transcript + identical bytes
  near_text    case/punct edits, "| Site" boilerplate suffix, word swap
  containment  transcript is a contiguous prefix of the source's
  near_audio   same signal, amplitude-scaled + noise at >= ~35 dB SNR,
               possibly re-encoded pcm_s16le <-> pcm_f32le
  distractor   same vocabulary, different event (precision check)

``group_id`` is ground truth for tests only — the pipeline never reads
it. Transcript style mirrors the reference's news titles (out.txt).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

EVENTS = [
    "typhoon mawar", "cyclone eloise", "storm freddy", "hurricane otis",
    "flood warning", "earthquake tremor", "wildfire front", "tropical storm biparjoy",
    "monsoon surge", "tornado outbreak", "landslide alert", "volcanic ash cloud",
]
PLACES = [
    "guam", "mozambique", "malawi", "acapulco", "queensland", "luzon",
    "gujarat", "okinawa", "sichuan", "valparaiso", "andalusia", "hokkaido",
]
VERBS = [
    "slams into", "makes landfall near", "intensifies off", "displaces thousands in",
    "cuts power across", "floods districts of", "triggers evacuations in",
    "weakens after striking", "leaves damage across", "approaches the coast of",
]
TAILS = [
    "residents urged to shelter", "rescue teams deployed overnight",
    "authorities issue red alert", "damage assessment under way",
    "relief supplies arriving", "schools closed until further notice",
]
BOILER = ["Global Disaster News", "Live Updates - Channel 7", "The Daily Storm Report"]

AUDIO_CLIPS_SCHEMA = T.StructType([
    T.StructField("clip_id", T.StringType(), False),
    T.StructField("bytes", T.BinaryType(), True),
    T.StructField("sr_hz", T.IntegerType(), True),
    T.StructField("dur_ms", T.IntegerType(), True),
    T.StructField("codec", T.StringType(), True),
    T.StructField("transcript", T.StringType(), True),
    T.StructField("event_date", T.DateType(), True),
    T.StructField("group_id", T.StringType(), True),  # sidecar ground truth
])


def _encode(pcm: np.ndarray, codec: str) -> bytes:
    if codec == "pcm_s16le":
        return (np.clip(pcm, -1, 1) * 32767.0).astype("<i2").tobytes()
    if codec == "pcm_f32le":
        return pcm.astype("<f4").tobytes()
    if codec == "pcm_mulaw":
        from .functions.audio import encode_mulaw

        return encode_mulaw(pcm)
    if codec == "pcm_alaw":
        from .functions.audio import encode_alaw

        return encode_alaw(pcm)
    raise ValueError(codec)


def _tone(
    rng: np.random.Generator, sr: int, dur_s: float, n_partials: int = 3
) -> np.ndarray:
    """Sum of random partials. 3 partials (test fixture) collide in the
    64-band spectral space often enough to exercise the Hamming verify;
    the large bench corpus uses 8 so distinct clips have distinct
    spectra, like real audio."""
    t = np.arange(int(sr * dur_s)) / sr
    freqs = rng.uniform(80, min(3500, sr / 2 * 0.9), size=n_partials)
    amps = rng.uniform(0.05, 0.35, size=n_partials)
    sig = sum(a * np.sin(2 * np.pi * f * t + rng.uniform(0, 2 * np.pi)) for f, a in zip(freqs, amps))
    return sig.astype(np.float64)


_SYLLABLES = [
    "ba", "do", "ri", "ku", "ta", "men", "sol", "ve", "na", "li", "po",
    "shu", "gra", "tem", "wi", "zo", "kar", "mi", "fen", "dal", "ur", "ost",
]


def _filler_words(rng: np.random.Generator, n_words: int) -> str:
    """Pseudo-word filler clause drawn from a combinatorially large
    lexicon (22^2..22^4 forms) — gives every transcript the lexical
    diversity of real speech so sub-threshold Jaccard between unrelated
    clips stays low (template-only text put most random pairs at
    J~0.4-0.6, flooding LSH candidate generation)."""
    words = []
    for _ in range(n_words):
        k = int(rng.integers(2, 5))
        words.append("".join(rng.choice(_SYLLABLES) for _ in range(k)))
    return " ".join(words)


def _add_noise(pcm: np.ndarray, rng: np.random.Generator, snr_db: float) -> np.ndarray:
    p_sig = float(np.mean(pcm**2))
    p_noise = p_sig / (10 ** (snr_db / 10))
    return pcm + rng.standard_normal(len(pcm)) * np.sqrt(p_noise)


def _transcript(rng: np.random.Generator, tag: str | None = None) -> str:
    """One news-style transcript. ``tag`` (an incident number) keeps
    transcripts globally unique across groups — without it the 12x10x12x6
    template space saturates around 10^4 clips and unrelated groups start
    sharing *identical* transcripts, which no real corpus does (and which
    quadratically inflates the candidate graph as the corpus grows)."""
    parts = [
        rng.choice(EVENTS), rng.choice(VERBS), rng.choice(PLACES),
        "as", rng.choice(TAILS),
    ]
    if tag is not None:
        parts += ["incident", tag]
    return " ".join(parts)


def make_corpus_pdf(n_base: int = 500, seed: int = 42) -> pd.DataFrame:
    """Deterministic corpus as pandas; ~35% of base rows grow duplicates."""
    rng = np.random.default_rng(seed)
    rows: list[dict] = []
    base_date = np.datetime64("2023-05-01")

    def add(gid, pcm, sr, codec, transcript, date, suffix):
        rows.append({
            "clip_id": f"c{gid:06d}_{suffix}",
            "bytes": _encode(pcm, codec),
            "sr_hz": int(sr),
            "dur_ms": int(1000 * len(pcm) / sr),
            "codec": codec,
            "transcript": transcript,
            "event_date": pd.Timestamp(date).date(),
            "group_id": f"g{gid:06d}",
        })

    for i in range(n_base):
        sr = int(rng.choice([8000, 16000]))
        dur = float(rng.uniform(0.25, 0.9))
        pcm = _tone(rng, sr, dur)
        codec = str(rng.choice(["pcm_s16le", "pcm_f32le"]))
        text = _transcript(rng)
        date = base_date + int(rng.integers(0, 60))
        add(i, pcm, sr, codec, text, date, "base")

        r = rng.uniform()
        if r < 0.10:  # exact dup
            add(i, pcm, sr, codec, text, date, "exact")
        elif r < 0.20:  # near-text dup (normalizes to identical)
            variant = text.upper() + "!!" if rng.uniform() < 0.5 else text + " | " + str(rng.choice(BOILER))
            add(i, pcm, sr, codec, variant, date + int(rng.integers(0, 2)), "neartxt")
        elif r < 0.27:  # containment: a long elaboration containing the base
            longer = text + " with " + " ".join(rng.choice(TAILS, size=2))
            add(i, pcm, sr, codec, longer, date, "contain")
        elif r < 0.35:  # near-audio dup: scaled + noisy, maybe re-encoded
            jitter = _add_noise(pcm * rng.uniform(0.6, 1.2), rng, snr_db=float(rng.uniform(34, 45)))
            codec2 = "pcm_f32le" if rng.uniform() < 0.5 else codec
            other_text = _transcript(rng)
            add(i, jitter, sr, codec2, other_text, date, "nearaud")

    pdf = pd.DataFrame(rows)
    # shuffle deterministically: permutation invariance is a tested property
    return pdf.sample(frac=1.0, random_state=seed).reset_index(drop=True)


def make_corpus(spark: SparkSession, n_base: int = 500, seed: int = 42) -> DataFrame:
    pdf = make_corpus_pdf(n_base, seed)
    return spark.createDataFrame(pdf, schema=AUDIO_CLIPS_SCHEMA)


def _group_rows(
    gid: int, seed: int, dur_lo: float, dur_hi: float, p_offset: float = 0.0,
    p_g711: float = 0.0,
) -> list[dict]:
    """All rows for one base clip (base + 0-1 planted dup), generated
    from an rng keyed by (seed, gid) only — deterministic regardless of
    partitioning, task order, or cluster size.

    ``p_offset`` > 0 adds an offset/containment dup kind: the base
    clip's audio embedded verbatim inside a longer host with unrelated
    lead-in/lead-out tones and an unrelated transcript — invisible to
    the text tiers AND to the clip-level SimHash (the pads change the
    global spectrum), detectable only by the landmark offset tier
    (operators/audio_segments.py).

    ``p_g711`` > 0 adds a telephony-transcode dup kind: the base
    clip's audio re-encoded as ITU-T G.711 (pcm_mulaw / pcm_alaw —
    decoded by the engine with pure numpy tables) under an UNRELATED
    transcript, so only the AUDIO tier can pair it (the clip-level
    SimHash is companding-robust as of round 5 — functions/audio.py
    FP_FLOOR_DB).

    Corpus versioning: both knobs extend the same uniform draw the
    other dup kinds consume, so at their 0.0 defaults they add no new
    rows and the generator reproduces any corpus persisted at the same
    seed and generator version. The generator itself HAS changed
    across rounds (r4 added filler words to nearaud transcripts; r5
    gave g711 rows unrelated transcripts) — a corpus regenerated at
    the same seed matches only within one generator version, so treat
    persisted corpora as stamped by the commit that wrote them."""
    rng = np.random.default_rng([seed, gid])
    rows: list[dict] = []
    base_date = np.datetime64("2023-05-01")

    def add(pcm, sr, codec, transcript, date, suffix):
        rows.append({
            "clip_id": f"c{gid:08d}_{suffix}",
            "bytes": _encode(pcm, codec),
            "sr_hz": int(sr),
            "dur_ms": int(1000 * len(pcm) / sr),
            "codec": codec,
            "transcript": transcript,
            "event_date": pd.Timestamp(date).date(),
            "group_id": f"g{gid:08d}",
        })

    sr = int(rng.choice([8000, 16000]))
    dur = float(rng.uniform(dur_lo, dur_hi))
    pcm = _tone(rng, sr, dur, n_partials=8)
    # per-clip band-limited noise: distinct clips get distinct spectral
    # fingerprints (pure partials collide in the 64-band space at ~10^5
    # clips, flooding the audio LSH buckets with false candidates);
    # -20 dB relative, far above the 34-45 dB planted near-dup noise
    spec = np.fft.rfft(rng.standard_normal(len(pcm)))
    c = rng.uniform(0.05, 0.9); w = rng.uniform(0.02, 0.1)
    mask = np.zeros(len(spec)); lo = int(c*len(spec)); hi = min(len(spec), int((c+w)*len(spec)) + 1)
    mask[lo:hi] = 1.0
    shaped = np.fft.irfft(spec * mask, n=len(pcm))
    rms_sig = float(np.sqrt(np.mean(pcm**2))) or 1.0
    rms_n = float(np.sqrt(np.mean(shaped**2))) or 1.0
    pcm = pcm + shaped * (rms_sig / rms_n) * 0.1
    codec = str(rng.choice(["pcm_s16le", "pcm_f32le"]))
    text = _transcript(rng, tag=str(gid)) + " " + _filler_words(rng, int(rng.integers(6, 11)))
    date = base_date + int(rng.integers(0, 60))
    add(pcm, sr, codec, text, date, "base")

    r = rng.uniform()
    if r < 0.10:
        add(pcm, sr, codec, text, date, "exact")
    elif r < 0.20:
        variant = text.upper() + "!!" if rng.uniform() < 0.5 else text + " | " + str(rng.choice(BOILER))
        add(pcm, sr, codec, variant, date + int(rng.integers(0, 2)), "neartxt")
    elif r < 0.27:
        longer = text + " with " + " ".join(rng.choice(TAILS, size=2))
        add(pcm, sr, codec, longer, date, "contain")
    elif r < 0.35:
        jitter = _add_noise(pcm * rng.uniform(0.6, 1.2), rng, snr_db=float(rng.uniform(34, 45)))
        codec2 = "pcm_f32le" if rng.uniform() < 0.5 else codec
        # filler words like every other kind: a template-only nearaud
        # transcript saturates the 12x10x12x6 template space past ~10^4
        # clips and clears J>=0.5 against ANY same-template row with a
        # short filler — measured at 324k clips: 19k nearaud rows all
        # "matched" unrelated index rows through the text tier. The
        # filler keeps unrelated transcripts sub-threshold, which is
        # its documented purpose (_filler_words docstring); the audio
        # tier remains the only honest way to pair a nearaud dup.
        text_n = _transcript(rng, tag=f"{gid}b") + " " + _filler_words(
            rng, int(rng.integers(6, 11))
        )
        add(jitter, sr, codec2, text_n, date, "nearaud")
    elif r < 0.35 + p_g711 + p_offset and r >= 0.35 + p_offset:
        # telephony transcode dup: IDENTICAL audio re-encoded as G.711
        # (mu-law/A-law) with an UNRELATED transcript — the realistic
        # shape (same recording, different/absent transcription), and
        # the honest fixture: only the AUDIO tier can pair it. Through
        # round 4 this kind reused the base transcript because the
        # clip-level SimHash was not companding-robust (the -60 dB band
        # flatten sat below G.711's noise floor; measured up to 26/128
        # flipped bits) and the text tier had to carry the pair. Round
        # 5 raised the flatten floor above the companding noise
        # (functions/audio.py FP_FLOOR_DB) — transcode pairs now
        # measure <= 4 flipped bits, 99.8% within hamming_threshold —
        # so the fixture demands what the engine now delivers.
        # CORPUS VERSION NOTE: this changes rows only when p_g711 > 0;
        # corpora generated with the knob at its 0.0 default (including
        # every persisted bench corpus) are byte-identical.
        # NB the branch occupies [0.35 + p_offset, 0.35 + p_offset +
        # p_g711): stacked AFTER the offset slice so the two knobs
        # compose independently — neither starves the other's planted
        # rate when both are set.
        codec_g = "pcm_mulaw" if rng.uniform() < 0.5 else "pcm_alaw"
        text_g = _transcript(rng, tag=f"{gid}t") + " " + _filler_words(
            rng, int(rng.integers(6, 11))
        )
        add(pcm, sr, codec_g, text_g, date, "g711")
    elif r < 0.35 + p_offset:
        # embedded/offset dup: base audio spliced between two unrelated
        # pads (~0.4-0.8x the clip each), new transcript — only the
        # landmark tier can tie it back to the base
        pre = _tone(rng, sr, float(rng.uniform(0.4, 0.8)) * dur, n_partials=8)
        post = _tone(rng, sr, float(rng.uniform(0.4, 0.8)) * dur, n_partials=8)
        host = np.concatenate([pre, pcm, post])
        text_o = _transcript(rng, tag=f"{gid}o") + " " + _filler_words(
            rng, int(rng.integers(6, 11))
        )
        add(host, sr, codec, text_o, date, "offset")
    return rows


def make_corpus_dist(
    spark: SparkSession,
    n_base: int,
    seed: int = 42,
    dur_lo: float = 0.25,
    dur_hi: float = 0.9,
    partitions: int | None = None,
    p_offset: float = 0.0,
    p_g711: float = 0.0,
) -> DataFrame:
    """Distributed deterministic corpus — same planted-dup mix as
    ``make_corpus`` but generated executor-side with ``mapInPandas``
    over ``spark.range`` (the driver never holds the payloads), so the
    bench corpus scales to millions of clips. Row content depends only
    on (seed, group id), never on partitioning."""
    n_parts = partitions or spark.sparkContext.defaultParallelism * 2

    cols = [f.name for f in AUDIO_CLIPS_SCHEMA.fields]

    def gen(batches):
        # yield in bounded chunks: one Arrow batch per input batch held
        # ~1 GB of payload per task at large n_base, and 32 concurrent
        # tasks blew the JVM's direct-memory cap — each yielded frame
        # becomes its own Arrow batch, so memory stays O(chunk)
        chunk = 200
        buf: list[dict] = []
        for pdf in batches:
            for gid in pdf["id"].tolist():
                buf.extend(
                    _group_rows(int(gid), seed, dur_lo, dur_hi, p_offset, p_g711)
                )
                if len(buf) >= chunk:
                    yield pd.DataFrame(buf, columns=cols)
                    buf = []
        if buf:
            yield pd.DataFrame(buf, columns=cols)

    return (
        spark.range(0, n_base, 1, n_parts)
        .mapInPandas(gen, AUDIO_CLIPS_SCHEMA)
    )
