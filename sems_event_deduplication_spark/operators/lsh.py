"""LSH band-bucket candidate generation (SURVEY.md §2.4 J1).

Replaces the reference's O(n²) all-pairs loop
(``create_silver_label.py:351-355`` — ``combinations(cluster_id, 2)``)
with an equi-self-join on ``(band_id, band_hash)``.

Scale design (the part that must survive 10¹² rows):

- Signatures are exploded to ``(clip_id, band_id, band_hash)`` —
  O(n·bands) rows, never the raw text/payload.
- **Skew**: a boilerplate-heavy bucket of size m would emit m² pairs.
  Every bucket gets its size via a count window (same shuffle key as
  the join, so co-partitioned). Buckets with ``size <= max_bucket_size``
  do the full intra-bucket pair join; larger buckets fall back to
  **star edges** (every member -> bucket-min member, via a min window)
  — O(m) output that still connects the component for CC. This is the
  salting-adjacent cap: correctness of *clusters* is preserved because
  edges only need to connect, not enumerate.
- AQE skew-join splitting stays on as the second line of defense, and
  the verify stage repartitions by a salted key
  (``pmod(xxhash64(id_a), salt_buckets)``) to spread hot verification
  work.
- Pairs are deduped across bands with a groupBy on (id_a, id_b) —
  map-side partial aggregation collapses most duplicates before the
  shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def explode_bands(df: DataFrame, id_col: str, bands_col: str) -> DataFrame:
    """(id, array<long> bands) -> (id, band_id, band_hash)."""
    return df.select(
        F.col(id_col).alias("clip_id"),
        F.posexplode(F.col(bands_col)).alias("band_id", "band_hash"),
    )


def size_buckets(banded: DataFrame) -> DataFrame:
    """Attach per-bucket size and min member (one exchange on the
    bucket key). ``candidate_pairs``, ``bucket_stats`` and the
    containment pre-filter all need exactly this — callers that run
    more than one of them should compute it once, ``persist()`` it,
    and pass the sized frame to each consumer so the explode + window
    shuffle happens a single time per banded input (the pipeline does
    this; unshared, the observability pass alone costs one extra full
    shuffle per modality)."""
    w = Window.partitionBy("band_id", "band_hash")
    return banded.withColumn("__bucket_n", F.count(F.lit(1)).over(w)).withColumn(
        "__bucket_min", F.min("clip_id").over(w)
    )


def candidate_pairs(
    banded: DataFrame,
    max_bucket_size: int = 256,
) -> DataFrame:
    """(clip_id, band_id, band_hash) -> distinct (id_a, id_b), id_a < id_b.

    Small buckets: full intra-bucket pairs. Oversized buckets: star
    edges to the bucket minimum (O(m)); the recall degradation is
    reported by ``bucket_stats`` — the pipeline runs it per banded
    input and surfaces the counts in its stage metrics.

    Accepts either a raw ``(clip_id, band_id, band_hash)`` frame or an
    already-``size_buckets``-ed one (detected by column).
    """
    sized = banded if "__bucket_n" in banded.columns else size_buckets(banded)

    small = sized.filter(
        (F.col("__bucket_n") <= max_bucket_size) & (F.col("__bucket_n") > 1)
    )
    a = small.select("band_id", "band_hash", F.col("clip_id").alias("id_a"))
    b = small.select("band_id", "band_hash", F.col("clip_id").alias("id_b"))
    small_pairs = a.join(b, ["band_id", "band_hash"]).filter(F.col("id_a") < F.col("id_b"))

    big_pairs = (
        sized.filter(F.col("__bucket_n") > max_bucket_size)
        .filter(F.col("clip_id") != F.col("__bucket_min"))
        .select(F.col("__bucket_min").alias("id_a"), F.col("clip_id").alias("id_b"))
    )

    return (
        small_pairs.select("id_a", "id_b")
        .unionByName(big_pairs)
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )


def bucket_stats(banded: DataFrame, max_bucket_size: int = 256) -> DataFrame:
    """Observability for the star-edge cap: one row of bucket metrics.

    The cap in ``candidate_pairs`` silently degrades oversized buckets
    to star edges; recall lost there must be *visible*, not inferred.
    Returns (n_buckets, n_star_buckets, n_star_members,
    n_pairs_not_enumerated) where ``n_pairs_not_enumerated`` counts the
    intra-bucket pairs a capped bucket did NOT emit (m·(m-1)/2 full
    pairs minus the m-1 star edges). One narrow agg over the already
    co-partitioned bucket key; cheap enough to run every pipeline run.

    Accepts a raw banded frame or a ``size_buckets`` output — with the
    latter persisted, this is a cache read plus a partial agg (no new
    exchange: the cached frame is already hash-partitioned on the
    bucket key).
    """
    over = F.col("n") > max_bucket_size
    if "__bucket_n" in banded.columns:
        sizes = banded.groupBy("band_id", "band_hash").agg(
            F.first("__bucket_n").alias("n")
        )
    else:
        sizes = banded.groupBy("band_id", "band_hash").agg(
            F.count(F.lit(1)).alias("n")
        )
    return sizes.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(F.when(over, 1).otherwise(0)).alias("n_star_buckets"),
        F.sum(F.when(over, F.col("n")).otherwise(0)).alias("n_star_members"),
        F.sum(
            F.when(
                over, (F.col("n") * (F.col("n") - 1)) / 2 - (F.col("n") - 1)
            ).otherwise(0)
        ).cast("long").alias("n_pairs_not_enumerated"),
    )


def salted(df: DataFrame, key_col: str, salt_buckets: int) -> DataFrame:
    """Append a deterministic salt column for repartitioning hot keys."""
    return df.withColumn("__salt", F.pmod(F.xxhash64(F.col(key_col)), F.lit(salt_buckets)))
