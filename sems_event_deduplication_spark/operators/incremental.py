"""Incremental dedup: a new batch against an existing signature index.

The reference re-runs its whole pipeline per corpus snapshot
(``create_silver_label.py`` is a batch job over everything); at 100 TB
with daily ingest that is not viable — the standing corpus is already
signed and clustered, and each new batch must be deduped **against**
it without re-clustering the world. This operator family is that path:

- ``sign_batch``      — compute the same signatures the pipeline
  persists (reuses the exact pipeline expressions, so index and batch
  signatures are always comparable).
- ``batch_vs_index_candidates`` — banded equi-join of the new batch's
  bands against the index's bands (NOT a self-join: candidates are
  (new, indexed) only; intra-batch dups are the ordinary self-join on
  the much smaller batch). Hot index buckets are capped by size, same
  star-logic rationale as ``lsh.candidate_pairs``: an oversized bucket
  is boilerplate and one representative suffices to mark the newcomer
  a dup.
- ``incremental_dedup`` — end-to-end: exact digest hits (anti-join
  form), near-dup hits (band join -> Jaccard verify), and the novel
  remainder that should be appended to the index.

Shuffle shape: the index side is read pre-banded (the pipeline's
``signatures`` stage persists bands), so the join shuffles only
``(band_id, band_hash, clip_id)`` triples of the *batch* against the
index's band table — at rest this is a bucketed/partitioned layout and
the batch (small) side broadcasts per AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..conf import DedupConfig
from ..functions import minhash as M
from ..functions import text as X
from . import lsh
from .verify import verify_jaccard


def sign_batch(batch: DataFrame, cfg: DedupConfig, id_col: str = "clip_id",
               text_col: str = "transcript") -> DataFrame:
    """(id, transcript) -> (id, transcript_norm, digest, shingle_hashes,
    minhash_sig, bands) — identical expressions to the pipeline's
    signatures stage, so batch and index signatures are comparable."""
    mh = M.make_minhash_udf(cfg.num_perm, cfg.seed)
    norm = X.normalize_text(F.col(text_col))
    return (
        batch.select(F.col(id_col).alias("clip_id"), norm.alias("transcript_norm"))
        .withColumn("digest", F.sha2(F.col("transcript_norm"), 256))
        .withColumn(
            "shingle_hashes",
            M.shingle_hashes(X.char_shingles(F.col("transcript_norm"), cfg.shingle_k)),
        )
        .withColumn("minhash_sig", mh(F.col("shingle_hashes")))
        .withColumn(
            "bands", M.band_hashes(F.col("minhash_sig"), cfg.bands, cfg.rows_per_band)
        )
    )


def batch_vs_index_candidates(
    batch_banded: DataFrame,
    index_banded: DataFrame,
    max_bucket_size: int = 256,
) -> DataFrame:
    """(new clip_id, band_id, band_hash) x (indexed clip_id, band_id,
    band_hash) -> distinct (id_new, id_indexed, n_shared_bands).

    Index buckets above ``max_bucket_size`` contribute only their
    min-id representative (stop-bucket cap): the newcomer still gets
    flagged as a dup of the boilerplate family without emitting m
    pairs per band.
    """
    idx = (
        lsh.size_buckets(index_banded)
        .filter(
            (F.col("__bucket_n") <= max_bucket_size)
            | (F.col("clip_id") == F.col("__bucket_min"))
        )
        .select("band_id", "band_hash", F.col("clip_id").alias("id_indexed"))
    )
    new = batch_banded.select(
        "band_id", "band_hash", F.col("clip_id").alias("id_new")
    )
    return (
        new.join(idx, ["band_id", "band_hash"])
        .groupBy("id_new", "id_indexed")
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )


def incremental_dedup(
    batch: DataFrame,
    index_sigs: DataFrame,
    cfg: DedupConfig,
    id_col: str = "clip_id",
    text_col: str = "transcript",
) -> dict[str, DataFrame]:
    """Dedup a new batch against a standing signature index.

    ``index_sigs``: the pipeline's persisted signatures stage
    (clip_id, transcript_norm, shingle_hashes, minhash_sig, bands) —
    optionally pre-extended with a ``digest`` column; it is derived
    from transcript_norm here if absent.

    Returns dict of DataFrames:
    - ``exact_hits``   (id_new, id_indexed): content-identical to an
      indexed clip (digest equi-join; at rest the index digest table
      is bucketed on digest, so this join is shuffle-free on the big
      side).
    - ``neardup_hits`` (id_new, id_indexed, jaccard): verified near
      dups of indexed clips.
    - ``novel``        the batch rows that matched nothing — the set
      to append to the corpus and its index.
    """
    signed = sign_batch(batch, cfg, id_col, text_col)
    if "digest" not in index_sigs.columns:
        index_sigs = index_sigs.withColumn(
            "digest", F.sha2(F.col("transcript_norm"), 256)
        )

    exact_hits = (
        signed.select("clip_id", "digest")
        .join(
            index_sigs.select(
                F.col("clip_id").alias("id_indexed"), "digest"
            ),
            "digest",
        )
        .groupBy(F.col("clip_id").alias("id_new"))
        .agg(F.min("id_indexed").alias("id_indexed"))
    )

    remaining = signed.join(
        exact_hits.select(F.col("id_new").alias("clip_id")), "clip_id", "left_anti"
    )
    cands = batch_vs_index_candidates(
        lsh.explode_bands(remaining, "clip_id", "bands"),
        lsh.explode_bands(index_sigs, "clip_id", "bands"),
        cfg.max_bucket_size,
    ).select(
        F.col("id_new").alias("id_a"), F.col("id_indexed").alias("id_b")
    )
    # verify across the two tables with ROLE-AWARE sides: id_a (the
    # batch row) resolves against the batch signatures and id_b (the
    # indexed row) against the index's. A clip_id existing in BOTH
    # (re-ingest of an updated doc under its old id) is then compared
    # new-version-vs-indexed-version — a single merged lookup table
    # would either fan candidates across both versions or verify
    # against the wrong one (and score self-pairs at jaccard 1.0).
    neardup_hits = verify_jaccard(
        cands, remaining, cfg.num_perm, cfg.jaccard_threshold, cfg.est_margin,
        shingles_col="shingle_hashes", docs_b=index_sigs,
    ).select(
        F.col("id_a").alias("id_new"),
        F.col("id_b").alias("id_indexed"),
        "jaccard",
    )

    matched = exact_hits.select("id_new").unionByName(
        neardup_hits.select("id_new")
    ).distinct()
    novel = signed.join(
        matched.select(F.col("id_new").alias("clip_id")), "clip_id", "left_anti"
    )
    return {
        "exact_hits": exact_hits,
        "neardup_hits": neardup_hits,
        "novel": novel,
    }
