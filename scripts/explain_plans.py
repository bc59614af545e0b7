"""Dump the physical plans of the flagship pipeline's key stages to
BENCH/PLANS.md, with notes on what each plan must (and must not)
contain — scan pruning, broadcast joins, codegen spans, no payload
shuffles. Run after any plan-shape change:

    python scripts/explain_plans.py
"""

from __future__ import annotations

import io
import os
import sys
import tempfile
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    from pyspark.sql import functions as F

    from sems_event_deduplication_spark.conf import DedupConfig
    from sems_event_deduplication_spark.functions import audio as A
    from sems_event_deduplication_spark.functions import minhash as M
    from sems_event_deduplication_spark.functions import text as X
    from sems_event_deduplication_spark.operators import lsh, verify
    from sems_event_deduplication_spark.operators.exact_dedup import (
        exact_dedup_with_edges,
    )
    from sems_event_deduplication_spark.session import get_spark
    from sems_event_deduplication_spark.synth import make_corpus_dist

    spark = get_spark("explain-plans", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    cfg = DedupConfig()

    corpus_dir = os.path.join(tempfile.mkdtemp(prefix="plans_"), "audio_clips")
    make_corpus_dist(spark, n_base=500, seed=42).write.parquet(corpus_dir)
    clips = spark.read.parquet(corpus_dir)

    normalized = clips.select(
        "clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript",
        X.normalize_text(F.col("transcript")).alias("transcript_norm"),
    )
    exact, exact_edges = exact_dedup_with_edges(
        normalized, text_col="transcript_norm", payload_col="bytes",
        order_col="clip_id",
    )
    mh = M.make_minhash_udf(cfg.num_perm, cfg.seed)
    ash = A.make_audio_simhash_udf(
        cfg.fft_frame, cfg.fft_hop, cfg.n_mel_bands, cfg.simhash_bits, cfg.seed
    )
    sigs = (
        exact.withColumn("shingles", X.char_shingles(F.col("transcript_norm"), cfg.shingle_k))
        .withColumn("shingle_hashes", M.shingle_hashes(F.col("shingles")))
        .withColumn("minhash_sig", mh(F.col("shingle_hashes")))
        .withColumn("bands", M.band_hashes(F.col("minhash_sig"), cfg.bands, cfg.rows_per_band))
        .withColumn("audio_simhash", ash(F.col("bytes"), F.col("codec")))
        .select("clip_id", "transcript_norm", "shingles", "minhash_sig", "bands", "audio_simhash")
    )
    banded = lsh.explode_bands(sigs, "clip_id", "bands")
    cands = lsh.candidate_pairs(banded, cfg.max_bucket_size)
    verified = verify.verify_jaccard(
        cands, sigs, cfg.num_perm, cfg.jaccard_threshold, cfg.est_margin
    )

    sections = [
        ("signatures (scan -> exact dedup -> Arrow UDFs)", sigs, [
            "the payload-side scan must feed a **BroadcastHashJoin LeftSemi** "
            "(BuildRight) — no Exchange above the payload scan: `bytes` never shuffles",
            "the digest side is a narrow projection (ReadSchema has no `bytes` "
            "on the window branch beyond the sha2 input)",
            "both pandas UDFs appear as a fused ArrowEvalPython (one Python round-trip)",
        ]),
        ("LSH candidates (explode -> bucket window -> self-join)", cands, [
            "posexplode then a single Exchange on (band_id, band_hash) reused by "
            "the count window and both sides of the self-join (co-partitioned)",
            "partial aggregation (HashAggregate before Exchange) collapses "
            "duplicate pairs map-side",
        ]),
        ("verify (signature-estimate prefilter -> exact Jaccard)", verified, [
            "signature table is projected to (clip_id, sig, shingles) before the "
            "pair join — column pruning visible in ReadSchema",
            "Jaccard math is native exprs inside WholeStageCodegen, no Python",
        ]),
    ]

    out_path = os.path.join(REPO, "BENCH", "PLANS.md")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        f.write(
            "# Physical plans of the flagship stages\n\n"
            "Captured with `.explain(\"formatted\")` (initial AQE plan; AQE "
            "re-optimizes at runtime). Regenerate with "
            "`python scripts/explain_plans.py`.\n"
        )
        for title, df, notes in sections:
            f.write(f"\n## {title}\n\n")
            for n in notes:
                f.write(f"- {n}\n")
            f.write("\n```\n")
            f.write(plan_of(df))
            f.write("```\n")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
