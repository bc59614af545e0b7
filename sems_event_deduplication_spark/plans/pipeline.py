"""End-to-end dedup pipeline (SURVEY.md §3.1 new-engine lifecycle).

    read audio_clips
      -> normalize (native exprs)                [stage: normalized]
      -> exact dedup on content digests          [stage: exact_dedup]
      -> MinHash + SimHash signatures (Arrow)    [stage: signatures]
      -> LSH candidates (text + audio)           [stage: candidates]
      -> verify (Jaccard / Hamming / suffix-SA)  [stage: verified_pairs]
      -> connected components (star/star)        [stage: components]
      -> clusters + survivors + metrics          [stages: clusters, survivors]

Every stage checkpoints through WarehouseIO (resume = skip committed
stages, the reference's exists-check pattern at
``create_silver_label.py:224``). The binary payload is dropped right
after signature computation and re-joined only for the survivor
output, so ``bytes`` never rides a shuffle (SURVEY.md §7 hard part d).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..conf import DedupConfig
from ..functions import audio as A
from ..functions import minhash as M
from ..functions import text as X
from ..operators import lsh, verify
from ..operators.components import assign_components, connected_components
from ..operators.survivors import cluster_summary, select_survivors
from ..sources.warehouse import WarehouseIO


def _estimated_scan_partitions(df: DataFrame, max_partition_bytes: int = 64 << 20) -> int:
    """Cheap estimate of a scan's task count, without compiling plans.

    The old probes were all driver bottlenecks at lake scale:
    ``df.rdd.getNumPartitions()`` compiled the non-AQE plan and forced
    an RDD conversion; an ``os.path.getsize``-per-file Python loop was
    local-FS-only; a ``getContentSummary``-per-directory variant
    counted non-input siblings recursively (an inflated estimate
    silently skips the spread-the-payload repartition this feeds) and
    a listStatus-filter variant still paid py4j round trips per
    directory ENTRY. The load-bearing observation: the ONLY decision
    this estimate feeds is "is the scan spread over at least
    ``defaultParallelism`` tasks", and splittable parquet yields at
    least one task per file — so when the scan has at least that many
    input files the answer is yes with NO I/O at all (one Python
    ``len``, even at millions of lake files). Only a scan with FEWER
    files than cores needs sizes, and then a per-file
    ``getFileStatus`` is exact, immune to sibling inflation, and
    bounded by ``defaultParallelism`` RPCs. Splittable parquet yields
    ``sum(max(1, ceil(size/maxPartitionBytes)))`` tasks (session.py
    pins maxPartitionBytes=64m). Non-file DataFrames (createDataFrame,
    memory streams) report ``defaultParallelism`` — already well
    spread, no repartition wanted; a file that vanishes or cannot be
    stat'ed between planning and estimation falls back to "adequately
    partitioned" rather than triggering the payload shuffle.
    """
    try:
        files = df.inputFiles()
    except Exception:
        files = []
    sc = df.sparkSession.sparkContext
    if not files:
        return sc.defaultParallelism
    if len(files) >= sc.defaultParallelism:
        # >= 1 task per file: already spread; zero RPCs, any file count
        return len(files)
    jvm = sc._jvm
    hconf = sc._jsc.hadoopConfiguration()
    n = 0
    for f in files:
        p = jvm.org.apache.hadoop.fs.Path(f)
        try:
            size = p.getFileSystem(hconf).getFileStatus(p).getLen()
        except Exception:
            # vanished/renamed/unreadable since planning: assume
            # adequately partitioned rather than triggering the
            # payload-shuffling repartition this heuristic exists to
            # avoid
            return sc.defaultParallelism * 4
        n += max(1, -(-size // max_partition_bytes))
    return max(1, n)


@dataclass
class StageMetric:
    stage: str
    rows_out: int
    seconds: float
    write_sec: float = 0.0
    count_sec: float = 0.0


@dataclass
class PipelineResult:
    clusters: DataFrame
    survivors: DataFrame
    verified_pairs: DataFrame
    metrics: list[StageMetric] = field(default_factory=list)
    lsh_stats: dict = field(default_factory=dict)
    # true end-to-end driver wall of run(); NOT the sum of stage
    # seconds — the survivors/clusters commits overlap in two threads,
    # so the sum double-counts their shared wall
    wall_sec: float = 0.0
    # which digest algo produced the committed exact_edges table —
    # surfaced so an audit can distinguish xxh128 (trusted-corpus
    # speed) from sha256 (adversarial-content safety) runs after the
    # fact (conf.py exact_digest_algo caveat)
    exact_digest_algo: str = ""

    def metrics_dict(self) -> dict:
        out = {
            m.stage: {
                "rows": m.rows_out,
                "sec": round(m.seconds, 3),
                "write_sec": round(m.write_sec, 3),
            }
            for m in self.metrics
        }
        if self.lsh_stats:
            out["lsh_buckets"] = self.lsh_stats
        if self.exact_digest_algo:
            out["exact_digest_algo"] = self.exact_digest_algo
        return out


class DedupPipeline:
    def __init__(self, spark: SparkSession, cfg: DedupConfig, warehouse: WarehouseIO):
        self.spark = spark
        self.cfg = cfg
        self.wh = warehouse

    def _stage(
        self, df: DataFrame, name: str, resume: bool,
        metrics: list[StageMetric], count_rows: bool = True,
    ) -> DataFrame:
        t0 = time.monotonic()
        out = self.wh.checkpoint(df, name, resume=resume)
        t1 = time.monotonic()
        # row counts are metrics sugar, not needed for correctness: in
        # min-checkpoint mode every count is one more job on the
        # latency floor, so the caller turns them off (rows = -1)
        n = out.count() if count_rows else -1
        t2 = time.monotonic()
        metrics.append(StageMetric(name, n, t2 - t0, t1 - t0, t2 - t1))
        return out

    def run(
        self,
        clips: DataFrame,
        resume: bool = False,
        with_audio: bool = True,
        checkpoint_mode: str = "all",
        payload_in_survivors: bool = True,
    ) -> PipelineResult:
        """checkpoint_mode:
        - "all": every stage materializes to the warehouse (finest
          resume granularity; the test suite uses this).
        - "min": only signatures / verified_pairs / components /
          survivors / clusters checkpoint. Candidate pairs are NOT
          materialized — they are a pure re-derivation of the committed
          signature table (explode + window + self-join), so committing
          them buys no resume granularity that verified_pairs doesn't
          already provide, and at production latency the two extra
          commits are pure floor. Cheap projections and windows stay
          lazy and fuse into the downstream stage.

        payload_in_survivors: when False the survivors table carries
        clip metadata but not ``bytes`` — the 100 TB shape: payloads are
        immutable in the lake and are addressed by ``clip_id``, never
        rewritten by the dedup job.
        """
        cfg = self.cfg
        t_run = time.monotonic()
        metrics: list[StageMetric] = []
        cp_all = checkpoint_mode == "all"

        def stage(df: DataFrame, name: str) -> DataFrame:
            return self._stage(df, name, resume, metrics, count_rows=cp_all)

        def maybe_stage(df: DataFrame, name: str) -> DataFrame:
            if cp_all:
                return stage(df, name)
            return df

        # ---- normalize (native exprs only) -------------------------------
        normalized = clips.select(
            "clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript",
            X.normalize_text(F.col("transcript")).alias("transcript_norm"),
        )
        normalized = maybe_stage(normalized, "normalized")

        offset_tier = with_audio and cfg.with_offset_audio
        fused_scan = cfg.signature_scan_mode == "fused"
        cores = self.spark.sparkContext.defaultParallelism

        def add_signature_columns(df: DataFrame) -> DataFrame:
            """Every fingerprint in one select; the Arrow UDFs fuse into
            a single ArrowEvalPython over one payload read."""
            out = df.withColumn(
                "shingles", X.char_shingles(F.col("transcript_norm"), cfg.shingle_k)
            ).withColumn("shingle_hashes", M.shingle_hashes(F.col("shingles")))
            mh = M.make_minhash_udf(cfg.num_perm, cfg.seed)
            out = out.withColumn("minhash_sig", mh(F.col("shingle_hashes"))).withColumn(
                "bands", M.band_hashes(F.col("minhash_sig"), cfg.bands, cfg.rows_per_band)
            )
            if offset_tier:
                # fuse the offset-tier landmark extraction into the SAME
                # payload pass as the SimHash: one decode feeds both
                # FFTs, and the offset tier later reads the checkpointed
                # signatures table instead of re-scanning the payload —
                # at 100 TB the payload re-read IS the cost
                asl = A.make_audio_sig_landmark_udf(
                    cfg.fft_frame, cfg.fft_hop, cfg.n_mel_bands, cfg.simhash_bits,
                    cfg.seed, cfg.fft_hop // 2, floor_db=cfg.fp_floor_db,
                )
                out = out.withColumn(
                    "__audio", asl(F.col("bytes"), F.col("codec"))
                ).select(
                    "*",
                    F.col("__audio.audio_simhash").alias("audio_simhash"),
                    F.col("__audio.landmarks").alias("landmarks"),
                ).withColumn(
                    "audio_bands",
                    A.simhash_bands(F.col("audio_simhash"), cfg.simhash_bands, cfg.simhash_bits),
                )
            elif with_audio:
                ash = A.make_audio_simhash_udf(
                    cfg.fft_frame, cfg.fft_hop, cfg.n_mel_bands, cfg.simhash_bits,
                    cfg.seed, floor_db=cfg.fp_floor_db,
                )
                out = out.withColumn(
                    "audio_simhash", ash(F.col("bytes"), F.col("codec"))
                ).withColumn(
                    "audio_bands",
                    A.simhash_bands(F.col("audio_simhash"), cfg.simhash_bands, cfg.simhash_bits),
                )
            return out

        sig_cols = ["clip_id", "transcript_norm", "shingle_hashes", "minhash_sig", "bands"]
        if with_audio:
            sig_cols += ["audio_simhash", "audio_bands"]
        if offset_tier:
            sig_cols += ["landmarks"]

        def sig_stage(df: DataFrame) -> DataFrame:
            """The signatures checkpoint — the longest stage of a real
            run. With cfg.signature_chunks > 0 it commits as that many
            independent chunk partitions (S8 mid-stage commits): a job
            killed at chunk k resumes at chunk k instead of recomputing
            hours of fingerprints."""
            if cfg.signature_chunks > 0:
                t0 = time.monotonic()
                out = self.wh.checkpoint_chunked(
                    df, "signatures", cfg.signature_chunk_col,
                    n_chunks=cfg.signature_chunks, resume=resume,
                )
                t1 = time.monotonic()
                n = out.count() if cp_all else -1
                t2 = time.monotonic()
                metrics.append(
                    StageMetric("signatures", n, t2 - t0, t1 - t0, t2 - t1)
                )
                return out
            return stage(df, "signatures")

        if fused_scan:
            # ---- ONE payload pass: digests + every signature -------------
            # Exact dedup then ranks the narrow digest projection of the
            # checkpointed signature table, and keepers are selected by a
            # broadcast anti-join against the (small) dropped-id set — the
            # payload is read exactly once end-to-end. Tradeoff vs
            # dedup_first: fingerprints are computed for rows exact dedup
            # will drop, so prefer dedup_first when the dup rate is high
            # and fused when payload I/O dominates (the 100 TB shape).
            from ..operators.exact_dedup import (
                digest_rank_edges, exact_dedup_digest_keys, kept_from_edges,
            )

            src = normalized
            if _estimated_scan_partitions(normalized) < cores:
                src = src.repartition(cores * 2)
            keys, digests = exact_dedup_digest_keys(
                "transcript_norm", "bytes" if with_audio else None,
                cfg.exact_digest_algo,
            )
            enriched = src.select("*", *digests)
            sigs_all = sig_stage(
                add_signature_columns(enriched).select(*sig_cols, *keys)
            )

            exact_edges = stage(
                digest_rank_edges(sigs_all.select("clip_id", *keys), keys),
                "exact_edges",
            )
            # driver-safety gate shared with the dedup_first path: the
            # committed edge table makes the 'auto' count a cheap
            # narrow scan, and above the cap the anti-join runs without
            # a broadcast hint instead of force-broadcasting an
            # arbitrarily large dropped-id set
            t_kept = time.monotonic()
            sigs = kept_from_edges(
                sigs_all, exact_edges, "clip_id",
                cfg.exact_dedup_strategy, cfg.exact_dedup_max_broadcast_ids,
            ).drop(*keys)
            metrics.append(
                StageMetric("exact_auto_count", -1, time.monotonic() - t_kept)
            )
        else:
            # ---- exact dedup on content digests (reference ordering) -----
            # The edge list is staged STRAIGHT to the warehouse — one
            # digest scan total, timed as the exact_edges stage — and
            # keepers derive from the committed table (kept_from_edges,
            # same strategy gate as the fused path). On resume the stage
            # loads the committed table, so the digest scan never re-runs.
            from ..operators.exact_dedup import (
                digest_rank_edges, exact_dedup_digest_keys, kept_from_edges,
            )

            key_names, digests = exact_dedup_digest_keys(
                "transcript_norm", "bytes" if with_audio else None,
                cfg.exact_digest_algo,
            )
            exact_edges = stage(
                digest_rank_edges(
                    normalized.select("clip_id", *digests), key_names
                ),
                "exact_edges",
            )
            t_kept = time.monotonic()
            exact = kept_from_edges(
                normalized, exact_edges, "clip_id",
                cfg.exact_dedup_strategy, cfg.exact_dedup_max_broadcast_ids,
            )
            metrics.append(
                StageMetric("exact_auto_count", -1, time.monotonic() - t_kept)
            )
            exact = maybe_stage(exact, "exact_dedup")

            # ---- signatures (payload dropped after this stage) -----------
            # spread the Arrow-UDF work across every core — but only
            # shuffle when the scan is genuinely under-partitioned (a
            # single-file table or a tiny checkpoint read-back); a wide
            # parquet scan is already parallel, and repartitioning it
            # would push the whole binary payload through a shuffle for
            # nothing. The session sets spark.sql.files.maxPartitionBytes
            # =64m so payload scans split finely enough to keep every
            # core busy without that shuffle.
            if _estimated_scan_partitions(normalized) < cores:
                exact = exact.repartition(cores * 2)
            sigs = sig_stage(add_signature_columns(exact).select(*sig_cols))

        # ---- LSH candidates ------------------------------------------------
        # The band-bucket exchange (explode -> window on (band_id,
        # band_hash)) is the shared substrate of candidate generation,
        # the star-edge observability stats, and the containment
        # pre-filter. Compute it ONCE — r6: for BOTH modalities in a
        # single exchange — persist it (narrow: id + band ints + two
        # window columns), and let every consumer read the cache.
        # Text and audio bands are concatenated before the explode, so
        # the positional band_id is 0..bands-1 for text and
        # bands..bands+simhash_bands-1 for audio: the id spaces are
        # disjoint, buckets can never mix across modalities, and each
        # modality's consumers filter their slice of the one cached,
        # already-partitioned frame (one shuffle + one cache
        # materialization instead of two of each; per-modality pair
        # sets and bucket stats are unchanged because every
        # (band_id, band_hash) group is identical to the split form —
        # the audio band_hash already encodes its own band index, so
        # only the internal positional id shifts).
        lsh_stats: dict = {}
        n_text_bands = cfg.bands
        all_bands = (
            F.concat(F.col("bands"), F.col("audio_bands"))
            if with_audio
            else F.col("bands")
        )
        sized_all = lsh.size_buckets(
            lsh.explode_bands(sigs.withColumn("__all_bands", all_bands),
                              "clip_id", "__all_bands")
        ).persist()
        sized_text = sized_all.filter(F.col("band_id") < n_text_bands)
        sized_audio = (
            sized_all.filter(F.col("band_id") >= n_text_bands)
            if with_audio
            else None
        )
        sized_lm = None
        stats_future = None
        # everything from candidates through verified runs under one
        # try/finally: an exception anywhere in between must not leak
        # the persisted band-bucket frames into executor storage for the
        # rest of the application
        try:
            cand_text = lsh.candidate_pairs(sized_text, cfg.max_bucket_size)
            cand_text = maybe_stage(cand_text, "candidates_text")

            if with_audio:
                cand_audio = lsh.candidate_pairs(sized_audio, cfg.max_bucket_size)
                cand_audio = maybe_stage(cand_audio, "candidates_audio")
            else:
                cand_audio = None

            # ---- verify ----------------------------------------------------
            # No pre-salting shuffle here: the verify equi-join hashes by
            # id_a/id_b regardless, so a salt repartition is a wasted pass
            # over the candidate table. Hot verify keys (one doc in many
            # pairs) are handled by AQE skew-join splitting; lsh.salted()
            # remains available for clusters running with AQE off.
            # exact Jaccard runs on the int64 shingle-hash arrays, not the
            # 9-char string shingles: same value (xxhash64 collisions in
            # ~10^2-element sets are ~2^-50) at a fraction of the join
            # payload and intersect cost
            pairs_text = verify.verify_jaccard(
                cand_text, sigs, cfg.num_perm, cfg.jaccard_threshold, cfg.est_margin,
                shingles_col="shingle_hashes",
            ).withColumn("kind", F.lit("text"))

            contain = verify.containment_pairs(
                sized_text, sigs, cfg.max_bucket_size, n_bands=cfg.containment_bands
            ).select("id_a", "id_b", F.lit(1.0).alias("jaccard")).withColumn(
                "kind", F.lit("containment")
            )
            verified = pairs_text.unionByName(contain)

            if with_audio:
                pairs_audio = verify.verify_hamming(
                    cand_audio, sigs, cfg.hamming_threshold
                ).select(
                    "id_a", "id_b", F.lit(None).cast("double").alias("jaccard"),
                    F.lit("audio").alias("kind"),
                )
                verified = verified.unionByName(pairs_audio)

            if offset_tier:
                from ..operators.audio_segments import (
                    audio_offset_pairs_from_sigs, landmark_inverted_index,
                )

                # size the landmark inverted index once and share it between
                # candidate generation and the stop-landmark cap stats
                sized_lm = lsh.size_buckets(landmark_inverted_index(sigs)).persist()
                offset_pairs = audio_offset_pairs_from_sigs(
                    sigs, cfg, cfg.landmark_containment, cfg.landmark_min_shared,
                    sized_inverted=sized_lm, verify_mode=cfg.offset_verify_mode,
                ).select(
                    "id_a", "id_b", F.lit(None).cast("double").alias("jaccard"),
                    F.lit("audio_offset").alias("kind"),
                )
                verified = verified.unionByName(offset_pairs)

            verified = verified.groupBy("id_a", "id_b").agg(
                F.max("jaccard").alias("jaccard"),
                F.sort_array(F.collect_set("kind")).alias("kinds"),
            )
            verified = stage(verified, "verified_pairs")

            # stats AFTER the verified materialization so every cache is
            # already populated: ONE unioned collect over cached
            # partitions covers text + audio + landmark bucket metrics
            # (previously two driver actions)
            stats_df = lsh.bucket_stats(sized_text, cfg.max_bucket_size).withColumn(
                "kind", F.lit("text")
            )
            if sized_audio is not None:
                stats_df = stats_df.unionByName(
                    lsh.bucket_stats(sized_audio, cfg.max_bucket_size).withColumn(
                        "kind", F.lit("audio")
                    )
                )
            if sized_lm is not None:
                stats_df = stats_df.unionByName(
                    lsh.bucket_stats(sized_lm, cfg.max_bucket_size).withColumn(
                        "kind", F.lit("landmarks")
                    )
                )
            # stats collect OVERLAPS the CC fixpoint (guide §2.6:
            # overlap independent jobs): the stats read only the
            # persisted band-bucket caches, while CC reads the two
            # committed edge tables — no shared lineage. The stats job
            # is submitted from a helper thread here and joined before
            # the caches unpersist; the recorded metric is the time the
            # critical path actually BLOCKED on it (normally ~0: the
            # fixpoint jobs are longer than the one cached partial agg).
            from concurrent.futures import ThreadPoolExecutor

            stats_pool = ThreadPoolExecutor(max_workers=1)
            stats_future = stats_pool.submit(stats_df.collect)
            stats_pool.shutdown(wait=False)  # thread finishes its one job

            # ---- connected components (overlapped with stats) ----------
            all_edges = verified.select("id_a", "id_b").unionByName(
                exact_edges.select("id_a", "id_b")
            )
            t_cc = time.monotonic()
            cc_info: dict = {}
            comp = connected_components(
                all_edges, "id_a", "id_b", cfg.cc_max_iterations,
                local_threshold=cfg.cc_local_edges, info=cc_info,
            )
            # the fixpoint's driver jobs (fingerprint collects / union-find
            # collect) run inside the call above — surface them as their own
            # metric so the fixed-latency floor is observable per run
            metrics.append(
                StageMetric("cc_fixpoint", cc_info.get("n_edges", -1), time.monotonic() - t_cc)
            )

            t_stats = time.monotonic()
            for row in stats_future.result():
                d = row.asDict()
                kind = d.pop("kind")
                lsh_stats[kind] = {k: int(v or 0) for k, v in d.items()}
            metrics.append(
                StageMetric("lsh_stats_collect", -1, time.monotonic() - t_stats)
            )
        finally:
            # an exception path must still wait for the in-flight stats
            # job before unpersisting the caches it reads (unpersist
            # under a running job is safe but silently recomputes the
            # whole explode+window lineage)
            if stats_future is not None:
                from concurrent.futures import wait as _fwait

                _fwait([stats_future])
            sized_all.unpersist()
            if sized_lm is not None:
                sized_lm.unpersist()
        lsh_stats["cc"] = cc_info
        # fused mode: the committed signatures table carries every row's
        # (clip_id, transcript_norm) — committed BEFORE exact dedup, so
        # its row set equals `normalized`'s — and reading two narrow
        # columns from that checkpoint replaces a full re-scan of the
        # corpus table + a transcript re-normalize (measured at 648k
        # clips / 47 GB: the components stage drops ~20 s -> ~2 s at 8
        # cores; at lake scale the avoided corpus scan is the whole
        # point). dedup_first commits only keeper rows, so that path
        # keeps reading `normalized` (dropped rows must still appear in
        # the final clusters).
        assign_nodes = (
            sigs_all.select("clip_id", "transcript_norm")
            if fused_scan
            else normalized.select("clip_id", "transcript_norm")
        )
        clustered = assign_components(assign_nodes, comp)
        # always materialize: both the survivors and the clusters outputs
        # consume this (lazy it would run the assign join twice), and the
        # component assignment is the natural resume point after the CC loop
        clustered = stage(clustered, "components")

        # ---- outputs --------------------------------------------------------
        # survivors and clusters both derive from the COMMITTED
        # components table and share no lineage past it — their write
        # jobs run concurrently from two driver threads (Spark's
        # scheduler interleaves independent jobs), overlapping the last
        # two commits of the run instead of serializing them
        meta_cols = ["clip_id", "sr_hz", "dur_ms", "codec", "transcript"]
        if payload_in_survivors:
            meta_cols.insert(1, "bytes")
        survivors_df = select_survivors(clustered).join(
            clips.select(*meta_cols), "clip_id"
        )
        clusters_df = cluster_summary(clustered)
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as pool:
            f_surv = pool.submit(stage, survivors_df, "survivors")
            f_clus = pool.submit(stage, clusters_df, "clusters")
            survivors = f_surv.result()
            clusters = f_clus.result()

        return PipelineResult(
            clusters=clusters, survivors=survivors, verified_pairs=verified,
            metrics=metrics, lsh_stats=lsh_stats,
            wall_sec=time.monotonic() - t_run,
            exact_digest_algo=cfg.exact_digest_algo,
        )

    def throughput(self, result: PipelineResult, n_clips: int) -> dict:
        """Throughput over the run's true wall time. Summing per-stage
        seconds would double-count the overlapped survivors/clusters
        commits (two driver threads) and so UNDERSTATE clips/sec; the
        per-stage numbers remain available under ``stages`` for
        attribution."""
        total = result.wall_sec or sum(m.seconds for m in result.metrics)
        return {
            "n_clips": n_clips,
            "total_sec": round(total, 3),
            "clips_per_sec": round(n_clips / total, 2) if total > 0 else None,
            "stages": result.metrics_dict(),
        }
