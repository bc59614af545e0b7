"""Offset/containment audio dedup: per-frame sub-fingerprint sets.

The clip-level SimHash (functions/audio.py) decides "same recording,
possibly re-encoded or noisy". It cannot see a clip *embedded* inside a
longer one — the audio analogue of the text containment tier
(SURVEY.md §2.9 G2, the suffix-array path). This operator closes that
gap by treating each clip's set of spectral-peak landmark hashes
(Wang's Shazam constellation, ISMIR'03 — offset-invariant by
construction) as "audio shingles" and reusing the exact text machinery:

    landmark set --explode--> inverted index (landmark -> clip)
              --bucket-capped equi-self-join--> candidates with
                n_shared landmark votes (Shazam's index lookup as a
                join; MinHash-LSH would be wrong here — containment
                pairs have LOW Jaccard by construction, small set vs
                big set, which is exactly what band-LSH filters out)
              --overlap verify--> (id_a, id_b, containment)

containment = |A ∩ B| / min(|A|, |B|): 1.0 when the shorter clip's
frames all occur in the longer one (the reference's max-denominator
entity overlap at ``create_silver_label.py:424-430`` is the same shape;
min-denominator is the containment-oriented variant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..conf import DedupConfig
from ..functions.audio import make_audio_landmark_udf
from . import lsh


def audio_segment_signatures(clips: DataFrame, cfg: DedupConfig) -> DataFrame:
    """(clip_id, bytes, codec) -> (clip_id, landmarks)."""
    lm = make_audio_landmark_udf(cfg.fft_frame, cfg.fft_hop // 2)
    return clips.select(
        "clip_id", lm(F.col("bytes"), F.col("codec")).alias("landmarks")
    )


def verify_segment_overlap(
    pairs: DataFrame,
    sigs: DataFrame,
    containment_threshold: float,
) -> DataFrame:
    """Candidates -> (id_a, id_b, containment >= t).

    Exact set overlap on the int64 landmark arrays, min-size
    denominator (containment, not Jaccard — a 5 s clip inside a 60 s
    host has tiny Jaccard but containment ~1).
    """
    from .verify import attach_pair_sides

    sides = sigs.select("clip_id", "landmarks")
    joined = attach_pair_sides(pairs, sides, ["landmarks"])
    inter = F.size(F.array_intersect(F.col("landmarks_a"), F.col("landmarks_b")))
    denom = F.least(F.size("landmarks_a"), F.size("landmarks_b"))
    return (
        joined.withColumn(
            "containment",
            F.when(denom > 0, inter / denom).otherwise(F.lit(0.0)),
        )
        .filter(F.col("containment") >= F.lit(containment_threshold))
        .select("id_a", "id_b", "containment")
    )


def verify_segment_overlap_counts(
    pairs: DataFrame,
    sigs: DataFrame,
    containment_threshold: float,
) -> DataFrame:
    """The scale form of ``verify_segment_overlap``: containment from
    the candidate join's own co-occurrence count instead of an exact
    array intersect.

    Landmarks are DISTINCT per clip (``np.unique`` in
    ``landmarks_from_mag``) and the inverted index maps each landmark
    to its holders once, so for a pair whose shared landmarks all live
    in uncapped buckets ``n_shared_bands`` (from ``lsh.candidate_pairs``)
    IS ``|A ∩ B|`` — the count mode is then bit-identical to the exact
    mode (property-tested). Shared landmarks in star-capped buckets are
    not enumerated, so the count is a LOWER bound there: containment is
    underestimated, which can only suppress pairs (false negatives,
    surfaced by the pipeline's ``n_pairs_not_enumerated`` landmark
    stats), never admit wrong ones.

    Why it exists: the exact mode ships both clips' full landmark
    arrays (~10³-10⁴ int64 each) through the pair join — at corpus
    scale the arrays are the largest column after the payload itself,
    and re-shuffling them per candidate pair is the offset tier's
    dominant cost. This mode joins only ``(clip_id, n_landmarks)`` —
    two narrow int joins, no array ever leaves the signature table.
    """
    counts = sigs.select("clip_id", F.size("landmarks").alias("n_lm"))
    from .verify import attach_pair_sides

    joined = attach_pair_sides(
        pairs.select("id_a", "id_b", "n_shared_bands"), counts, ["n_lm"]
    )
    denom = F.least("n_lm_a", "n_lm_b")
    return (
        joined.withColumn(
            "containment",
            F.when(denom > 0, F.col("n_shared_bands") / denom).otherwise(F.lit(0.0)),
        )
        .filter(F.col("containment") >= F.lit(containment_threshold))
        .select("id_a", "id_b", "containment")
    )


def landmark_inverted_index(sigs: DataFrame) -> DataFrame:
    """(clip_id, landmarks) -> the (landmark -> clip) inverted index in
    the banded shape lsh.candidate_pairs consumes."""
    return sigs.select(
        "clip_id", F.lit(0).alias("band_id"),
        F.explode("landmarks").alias("band_hash"),
    )


def audio_offset_pairs_from_sigs(
    sigs: DataFrame,
    cfg: DedupConfig,
    containment_threshold: float = 0.8,
    min_shared_landmarks: int = 4,
    sized_inverted: DataFrame | None = None,
    verify_mode: str = "exact",
) -> DataFrame:
    """Offset-audio dup pairs from an existing ``(clip_id, landmarks)``
    table (e.g. the pipeline's checkpointed signatures stage, which
    computes landmarks in the SAME payload pass as the SimHash — the
    offset tier then never re-reads the 100 TB payload).

    Candidates come from the landmark inverted index: explode the
    landmark sets to (landmark -> clip_id) and reuse the bucket-capped
    LSH self-join (a landmark shared by more than max_bucket_size
    clips is a stop-landmark: its bucket degrades to star edges, and
    such pairs only survive if rarer landmarks also vote). Pairs need
    ``min_shared_landmarks`` co-occurrences before the exact-overlap
    verify — single-landmark collisions are noise.

    ``sized_inverted``: pass a (persisted) ``lsh.size_buckets(
    landmark_inverted_index(sigs))`` frame to share the index exchange
    with a ``lsh.bucket_stats`` observability pass (the pipeline does;
    stop-landmark recall loss must be visible, not inferred).

    ``verify_mode`` (same selectable-strategy shape as
    ``interval_merge_edges`` / ``stratified_cluster_split``):

    - ``"exact"`` (default): array-intersect overlap on the full
      landmark arrays — exact containment even for pairs whose shared
      landmarks hit the star cap, at the cost of shipping the arrays
      through the pair join.
    - ``"count"``: the scale form — containment from the candidate
      join's co-occurrence count + a narrow per-clip landmark count
      (``verify_segment_overlap_counts``); bit-identical absent star
      caps, lower-bound (never over-admitting) under them, and no
      landmark array ever rides the pair shuffle.
    """
    inverted = (
        sized_inverted
        if sized_inverted is not None
        else landmark_inverted_index(sigs)
    )
    cands = lsh.candidate_pairs(inverted, cfg.max_bucket_size).filter(
        F.col("n_shared_bands") >= min_shared_landmarks
    )
    if verify_mode == "count":
        return verify_segment_overlap_counts(cands, sigs, containment_threshold)
    if verify_mode != "exact":
        raise ValueError(f"unknown offset verify_mode: {verify_mode!r}")
    return verify_segment_overlap(cands, sigs, containment_threshold)


def audio_offset_pairs(
    clips: DataFrame,
    cfg: DedupConfig,
    containment_threshold: float = 0.8,
    min_shared_landmarks: int = 4,
) -> DataFrame:
    """End-to-end offset-audio dup pairs over a raw audio_clips table.

    Standalone entry point: computes landmark signatures itself (one
    payload pass), caches them for the index + verify consumers, and
    materializes the (small) verified-pair set before releasing the
    cache — without that the persist outlived the call and leaked
    executor storage. Pipelines that already computed landmarks in the
    signature stage should call ``audio_offset_pairs_from_sigs``.
    """
    sigs = audio_segment_signatures(clips, cfg).persist()
    try:
        return audio_offset_pairs_from_sigs(
            sigs, cfg, containment_threshold, min_shared_landmarks
        ).localCheckpoint()
    finally:
        sigs.unpersist()
