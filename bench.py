"""Benchmark harness. Prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline jobs:
  - text_dedup_e2e   : flagship MinHash-LSH near-dup clustering over the
                       sf documents table (normalize -> signatures ->
                       bands -> candidates -> verify -> CC).
  - audio_dedup_e2e  : full audio+text pipeline on the deterministic
                       synthetic corpus (pandas/Arrow UDF path);
                       emits clips/sec.
  - contract queries : representative operator set from __spark_entry__.

Scaling evidence (north rule: efficiency >= 0.8 between N and 4N):
    python bench.py --scaling       # runs local[2], local[8], local[32]
generates ONE shared corpus (distributed, deterministic), warms the
page cache, then runs the identical flagship pipeline at each
parallelism level in its own subprocess (one JVM each) and writes
BENCH/SCALING_RUN.md (raw latest run; the curated analysis lives in
BENCH/BASELINE.md) with clips/sec at every level plus the headline
efficiency = (T_2 / T_8) / 4 on the pipeline wall time (the N -> 4N
pair; 8 -> 32 is reported alongside as the shared-bandwidth ceiling
of this single-socket VM — see BENCH/BASELINE.md).

The scaling corpus is sized so the job is throughput-bound (the whole
point of the measurement): per-clip signature work dominates the fixed
per-job scheduling latency. Checkpoint mode is "min" (the north-rule
stages still materialize) and survivors are metadata-only — at 100 TB
the dedup job never rewrites immutable payloads.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
AUDIO_N_BASE = int(os.environ.get("BENCH_AUDIO_N_BASE", "4000"))
SCALING_N_BASE = int(os.environ.get("BENCH_SCALING_N_BASE", "80000"))
SCALING_DUR = (3.0, 6.0)


def _sf_label(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def run_text_dedup(spark, sf_dir: str, cores: int, limit: int | None = None) -> int:
    """``limit``: cap the document count — used by the untimed warmup
    pass (same code path, tiny input) so the timed leg measures
    steady-state throughput, not first-query JVM/codegen/Arrow-worker
    startup (the same untimed-setup policy ``run_audio_dedup``
    documents)."""
    from pyspark.sql import functions as F

    from sems_event_deduplication_spark.conf import DedupConfig
    from sems_event_deduplication_spark.functions.minhash import (
        band_hashes, make_minhash_udf, shingle_hashes,
    )
    from sems_event_deduplication_spark.functions.text import (
        char_shingles, normalize_text,
    )
    from sems_event_deduplication_spark.operators.components import (
        assign_components, connected_components,
    )
    from sems_event_deduplication_spark.operators.lsh import (
        candidate_pairs, explode_bands,
    )
    from sems_event_deduplication_spark.operators.verify import verify_jaccard

    cfg = DedupConfig(jaccard_threshold=0.5)
    raw = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    if limit is not None:
        raw = raw.limit(limit)
    docs = (
        raw
        # single-file table reads back as one split; spread the UDF work
        .repartition(cores * 2)
        .select(
            F.col("doc_id").cast("string").alias("clip_id"),
            normalize_text(F.col("text"), strip_boilerplate=False).alias("transcript_norm"),
        )
    )
    mh = make_minhash_udf(cfg.num_perm, cfg.seed)
    sigs = (
        docs.withColumn("shingles", char_shingles(F.col("transcript_norm"), cfg.shingle_k))
        .withColumn("shingle_hashes", shingle_hashes(F.col("shingles")))
        .withColumn("minhash_sig", mh(F.col("shingle_hashes")))
        .withColumn("bands", band_hashes(F.col("minhash_sig"), cfg.bands, cfg.rows_per_band))
        # verify on the int64 shingle hashes (the pipeline's own shape):
        # same Jaccard modulo xxhash64 collisions, and neither the
        # persist nor the two-side verify join carries the string arrays
        .select("clip_id", "shingle_hashes", "minhash_sig", "bands")
    )
    # signatures are reused by candidates + both verify sides + assign:
    # persist once (the pipeline proper uses a durable checkpoint here)
    sigs = sigs.persist()
    try:
        cands = candidate_pairs(explode_bands(sigs, "clip_id", "bands"), cfg.max_bucket_size)
        verified = verify_jaccard(
            cands, sigs, cfg.num_perm, cfg.jaccard_threshold, cfg.est_margin,
            shingles_col="shingle_hashes",
        )
        comp = connected_components(
            verified, "id_a", "id_b", cfg.cc_max_iterations,
            local_threshold=cfg.cc_local_edges,
        )
        return assign_components(sigs.select("clip_id"), comp).count()
    finally:
        sigs.unpersist()


def gen_corpus(spark, corpus_dir: str, n_base: int, dur_lo: float, dur_hi: float) -> None:
    from sems_event_deduplication_spark.synth import make_corpus_dist

    make_corpus_dist(spark, n_base=n_base, seed=42, dur_lo=dur_lo, dur_hi=dur_hi).write.mode(
        "overwrite"
    ).parquet(corpus_dir)


def run_audio_dedup(spark, corpus_dir: str | None) -> tuple[int, float, dict, str]:
    """Returns (n_clips, wall_sec, per-stage metrics dict, corpus_dir).

    Setup (untimed): materialize the synthetic corpus as a parquet
    table + warm the Python workers — the pipeline's contract is to
    read an existing table, and worker spin-up is a per-cluster
    constant, not per-job throughput. Timed: the full pipeline in
    'min' checkpoint mode (signatures/candidates/verified/clusters
    still checkpoint, per the north rule), survivors metadata-only.
    """
    from pyspark.sql import functions as F

    from sems_event_deduplication_spark.conf import DedupConfig
    from sems_event_deduplication_spark.functions.audio import make_audio_simhash_udf
    from sems_event_deduplication_spark.plans.pipeline import DedupPipeline
    from sems_event_deduplication_spark.sources.warehouse import WarehouseIO

    # fused = the 100 TB shape this bench stands in for: digests + every
    # fingerprint in ONE payload pass (dedup_first reads the payload
    # twice — measured at 216k clips, the second read is ~77 s of the
    # 2-core wall and scales at 0.46 because cached-read bandwidth is
    # shared across cores; at real scale it is a full extra corpus scan)
    cfg = DedupConfig(signature_scan_mode="fused")
    if corpus_dir is None:
        corpus_dir = os.path.join(tempfile.mkdtemp(prefix="bench_corpus_"), "audio_clips")
        gen_corpus(spark, corpus_dir, AUDIO_N_BASE, 0.25, 0.9)
    clips = spark.read.parquet(corpus_dir)
    n = clips.count()
    # warm the Arrow workers (collect defeats column pruning)
    ash = make_audio_simhash_udf(
        cfg.fft_frame, cfg.fft_hop, cfg.n_mel_bands, cfg.simhash_bits,
        cfg.seed, floor_db=cfg.fp_floor_db,
    )
    clips.limit(256).repartition(64).select(ash(F.col("bytes"), F.col("codec")).alias("s")).collect()

    wh = WarehouseIO(spark, tempfile.mkdtemp(prefix="wh_bench_"))
    t0 = time.monotonic()
    res = DedupPipeline(spark, cfg, wh).run(
        clips, with_audio=True, checkpoint_mode="min", payload_in_survivors=False
    )
    return n, time.monotonic() - t0, res.metrics_dict(), corpus_dir


OFFSET_N_BASE = int(os.environ.get("BENCH_OFFSET_N_BASE", "8000"))
OFFSET_P = 0.07
OFFSET_DUR = (1.0, 2.0)


def run_offset_bench(cores: int) -> dict:
    """Offset/containment audio tier at bench scale (``--offset``).

    The flagship bench keeps ``with_offset_audio=False`` because its
    corpus plants no embedded clips — this variant generates a corpus
    where ~7% of groups embed the base clip inside a longer host
    (unrelated pads + unrelated transcript: invisible to the text tiers
    and to the clip-level SimHash), runs the full pipeline with the
    landmark tier ON, and reports (a) recall on the planted offset
    pairs via the components output, (b) the tier's stage cost inside
    the shared fused payload pass, (c) the landmark inverted-index
    bucket stats incl. stop-landmark pairs-not-enumerated."""
    import tempfile

    from pyspark.sql import functions as F

    from sems_event_deduplication_spark.conf import DedupConfig
    from sems_event_deduplication_spark.plans.pipeline import DedupPipeline
    from sems_event_deduplication_spark.session import get_spark
    from sems_event_deduplication_spark.sources.warehouse import WarehouseIO
    from sems_event_deduplication_spark.synth import make_corpus_dist

    spark = get_spark(f"bench-offset-{cores}", cores=cores, shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")
    corpus_dir = os.path.join(tempfile.mkdtemp(prefix="bench_offset_"), "audio_clips")
    make_corpus_dist(
        spark, n_base=OFFSET_N_BASE, seed=42,
        dur_lo=OFFSET_DUR[0], dur_hi=OFFSET_DUR[1], p_offset=OFFSET_P,
    ).write.mode("overwrite").parquet(corpus_dir)
    clips = spark.read.parquet(corpus_dir)
    n = clips.count()

    verify_mode = os.environ.get("BENCH_OFFSET_VERIFY", "count")
    cfg = DedupConfig(
        signature_scan_mode="fused", with_offset_audio=True,
        offset_verify_mode=verify_mode,
    )
    wh = WarehouseIO(spark, tempfile.mkdtemp(prefix="wh_offset_"))
    t0 = time.monotonic()
    res = DedupPipeline(spark, cfg, wh).run(
        clips, with_audio=True, checkpoint_mode="min", payload_in_survivors=False
    )
    wall = time.monotonic() - t0

    comp = wh.load_clean("components").select("clip_id", "component")
    gidc = F.substring_index("clip_id", "_", 1)
    offs = comp.filter(F.col("clip_id").endswith("_offset")).select(
        gidc.alias("g"), F.col("component").alias("c_off")
    )
    bases = comp.filter(F.col("clip_id").endswith("_base")).select(
        gidc.alias("g"), F.col("component").alias("c_base")
    )
    agg = offs.join(bases, "g").agg(
        F.count(F.lit(1)).alias("n_planted"),
        F.sum(
            F.when(F.col("c_off") == F.col("c_base"), 1).otherwise(0)
        ).alias("n_recovered"),
    ).collect()[0]
    n_planted = int(agg["n_planted"] or 0)
    n_rec = int(agg["n_recovered"] or 0)
    return {
        "metric": "offset_tier_recall",
        "value": round(n_rec / n_planted, 4) if n_planted else None,
        "unit": "ratio",
        "queries": {"audio_offset_e2e": round(wall, 3)},
        "sf": -1.0,
        "cores": cores,
        "audio_clips": n,
        "clips_per_sec": round(n / wall, 2),
        "n_planted_offset_pairs": n_planted,
        "n_recovered_offset_pairs": n_rec,
        "offset_verify_mode": verify_mode,
        "calibration_sec": run_calibration(spark),
        "audio_stages": res.metrics_dict(),
    }


def run_incremental_bench(cores: int) -> dict:
    """Incremental batch-vs-index dedup at bench scale (``--incremental``).

    The contract query proves correctness at sf0.01; this measures the
    SCALE path: a standing signature index (built once, persisted at
    rest like the pipeline's signatures stage) and a daily-ingest-sized
    batch deduped against it without re-clustering the world.

    Corpus: reuses ``SPARK_GRAFT_CORPUS`` (or the 324k scaling corpus
    if present) — text tiers only, so parquet column pruning never
    reads the audio payload. Split by planted-dup kind, which gives
    exact ground truth: the text-dup rows (``_exact``/``_neartxt``/
    ``_contain``) form the batch and each MUST hit its ``_base`` in
    the index (the first two normalize to the identical transcript —
    exact tier; ``_contain`` is a near hit), while ``_nearaud`` rows
    (unrelated transcripts, audio-only dups) MUST come back novel —
    text tiers finding them would be a false positive."""
    import tempfile

    from pyspark.sql import functions as F

    from sems_event_deduplication_spark.conf import DedupConfig
    from sems_event_deduplication_spark.operators.incremental import (
        incremental_dedup, sign_batch,
    )
    from sems_event_deduplication_spark.session import get_spark

    spark = get_spark(f"bench-incr-{cores}", cores=cores, shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")
    corpus_dir = os.environ.get("SPARK_GRAFT_CORPUS")
    if not corpus_dir and os.path.isdir("/tmp/corpus324k/audio_clips"):
        corpus_dir = "/tmp/corpus324k/audio_clips"
    if not corpus_dir:
        corpus_dir = os.path.join(tempfile.mkdtemp(prefix="incr_corpus_"), "audio_clips")
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--gen-corpus", corpus_dir,
             "40000", "0.25", "0.5"],
            check=True, timeout=3000,
        )
    cfg = DedupConfig(jaccard_threshold=0.5)
    clips = spark.read.parquet(corpus_dir).select("clip_id", "transcript")
    kind = F.substring_index("clip_id", "_", -1)
    batch_kinds = ("exact", "neartxt", "contain", "nearaud")
    batch_df = clips.filter(kind.isin(*batch_kinds))
    index_df = clips.filter(~kind.isin(*batch_kinds))

    # standing index: signed once, persisted at rest (pre-banded), read
    # back like the pipeline's signatures checkpoint
    idx_path = tempfile.mkdtemp(prefix="incr_index_") + "/signatures"
    t0 = time.monotonic()
    sign_batch(index_df, cfg).write.mode("overwrite").parquet(idx_path)
    index_sign_sec = time.monotonic() - t0
    index_sigs = spark.read.parquet(idx_path)
    n_index = index_sigs.count()

    t0 = time.monotonic()
    out = incremental_dedup(batch_df, index_sigs, cfg)
    hits = (
        out["exact_hits"].select("id_new").withColumn("tier", F.lit("exact"))
        .unionByName(
            out["neardup_hits"].select("id_new").distinct()
            .withColumn("tier", F.lit("near"))
        )
        .withColumn("kind", F.substring_index("id_new", "_", -1))
        .groupBy("kind", "tier").agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    novel_kinds = {
        r["kind"]: r["n"]
        for r in out["novel"].select(
            F.substring_index("clip_id", "_", -1).alias("kind")
        ).groupBy("kind").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    batch_dedup_sec = time.monotonic() - t0
    n_batch = batch_df.count()

    hit_by_kind: dict[str, int] = {}
    for r in hits:
        hit_by_kind[r["kind"]] = hit_by_kind.get(r["kind"], 0) + r["n"]
    n_dup_expected = n_batch - novel_kinds.get("nearaud", 0) - hit_by_kind.get("nearaud", 0)
    n_dup_found = sum(v for k, v in hit_by_kind.items() if k != "nearaud")
    recall = round(n_dup_found / n_dup_expected, 4) if n_dup_expected else None
    return {
        "metric": "incremental_batch_clips_per_sec",
        "value": round(n_batch / batch_dedup_sec, 2),
        "unit": "clips/sec",
        "queries": {
            "index_sign_sec": round(index_sign_sec, 3),
            "batch_dedup_sec": round(batch_dedup_sec, 3),
        },
        "sf": -1.0,
        "cores": cores,
        "n_index": n_index,
        "n_batch": n_batch,
        "recall_planted_text_dups": recall,
        "hits_by_kind": hit_by_kind,
        "novel_by_kind": novel_kinds,
        "nearaud_false_text_hits": hit_by_kind.get("nearaud", 0),
        "calibration_sec": run_calibration(spark),
    }


def run_streaming_bench(cores: int, engine: str = "join") -> dict:
    """Streaming near-dup throughput (``--streaming [engine]``).

    Drives a bounded file stream of ``BENCH_STREAM_ROWS`` documents
    (default 200k; every 33rd row is a planted near dup of its
    predecessor, the rest are unique md5-token texts) through the
    online candidate operator across many micro-batches and reports
    events/sec plus recall on the planted pairs. Docs are generated
    JVM-side and written as ~32 json files so maxFilesPerTrigger
    yields a real multi-batch run with state carried across batches.

    ``engine``:
    - ``"join"`` (default, the scale path): the native stream-stream
      self-join operator (``streaming_neardup_join_candidates``) —
      JVM state store, zero Python in the loop.
    - ``"stateful"``: the ``applyInPandasWithState`` operator
      (``streaming_neardup_candidates``) — the per-group Python
      dispatch ceiling this bench originally measured (~1,069
      events/s at local[32]); kept runnable so the comparison stays
      reproducible (``python bench.py --streaming stateful``)."""
    import tempfile

    from pyspark.sql import functions as F

    from sems_event_deduplication_spark.session import get_spark
    from sems_event_deduplication_spark.streaming.stream_dedup import (
        run_stream_to_memory, streaming_neardup_candidates,
        streaming_neardup_join_candidates,
    )

    spark = get_spark(f"bench-stream-{cores}", cores=cores, shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")
    n = int(os.environ.get("BENCH_STREAM_ROWS", "200000"))
    src = tempfile.mkdtemp(prefix="bench_stream_") + "/docs"

    is_dup = F.pmod(F.col("id"), 33) == 32
    base_id = F.when(is_dup, F.col("id") - 1).otherwise(F.col("id")).cast("string")
    tokens = [F.md5(F.concat(base_id, F.lit(f":{i}"))) for i in range(20)]
    docs = spark.range(0, n, 1, 32).select(
        F.concat(F.lit("d"), F.col("id")).alias("clip_id"),
        (F.to_timestamp(F.lit("2024-01-01 00:00:00"))
         + F.make_interval(secs=F.col("id") / F.lit(10.0))).alias("ts"),
        F.concat_ws(
            " ", *tokens, F.when(is_dup, F.lit("extra")).otherwise(F.lit(""))
        ).alias("transcript"),
    )
    docs.write.mode("overwrite").json(src)
    # arrival order must track event time, as in a real stream:
    # FileStreamSource batches by modification time, and the 32 part
    # files land with tied mtimes in arbitrary order — an early-id file
    # processed after the watermark has advanced past its rows gets
    # DROPPED as late data (measured: the earliest planted pairs vanish
    # once the corpus spans more event time than the watermark delay).
    # spark.range splits ids contiguously, so part-file name order IS
    # event-time order — stamp strictly increasing mtimes to match.
    part_files = sorted(
        f for f in os.listdir(src) if f.startswith("part-")
    )
    t_base = time.time() - len(part_files) - 10
    for i, f in enumerate(part_files):
        os.utime(os.path.join(src, f), (t_base + i, t_base + i))
    static = spark.read.json(src)
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 4)
        .json(src)
    )
    op = (streaming_neardup_join_candidates if engine == "join"
          else streaming_neardup_candidates)
    # untimed warmup, same policy as the flagship audio/text legs (r4):
    # a tiny stream through the SAME operator first, so the timed run
    # measures the operator, not first-query codegen compilation /
    # RocksDB class loading (measured ~3 s on the first micro-batch of
    # a cold JVM)
    warm_src = tempfile.mkdtemp(prefix="bench_stream_warm_") + "/docs"
    docs.limit(4096).coalesce(4).write.mode("overwrite").json(warm_src)
    warm = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 2)
        .json(warm_src)
    )
    run_stream_to_memory(
        op(warm, min_est_jaccard=0.5), "bench_stream_warmup", "append"
    )
    pairs = op(stream, min_est_jaccard=0.5)
    t0 = time.monotonic()
    name = run_stream_to_memory(pairs, "bench_stream_neardup", "append")
    wall = time.monotonic() - t0
    found = {
        (r["id_a"], r["id_b"])
        for r in spark.table(name).select("id_a", "id_b").distinct().collect()
    }
    planted = {
        (f"d{i - 1}", f"d{i}") if f"d{i - 1}" < f"d{i}" else (f"d{i}", f"d{i - 1}")
        for i in range(32, n, 33)
    }
    return {
        "metric": "streaming_neardup_events_per_sec",
        "value": round(n / wall, 2),
        "unit": "events/sec",
        "queries": {"stream_neardup_wall_sec": round(wall, 3)},
        "sf": -1.0,
        "engine": engine,
        "cores": cores,
        "n_events": n,
        "n_planted_pairs": len(planted),
        "n_planted_recovered": len(found & planted),
        "recall_planted": round(len(found & planted) / len(planted), 4),
        "n_extra_pairs": len(found - planted),
        "calibration_sec": run_calibration(spark),
    }


def run_bw_probe(spark, corpus_dir: str | None, target_bytes: int = 4 << 30):
    """Fixed-work cached-read BANDWIDTH probe: scan the same ~4 GB
    prefix of the (page-cache-warmed) corpus in 8 coalesced tasks and
    sum payload lengths. The sha2 calibration probe measures CPU only —
    r3 measured whole sessions where multi-core legs ran 15-20% slow
    on *memory/IO bandwidth* contention while sha2 stayed normal, which
    is exactly the resource the payload-heavy stages contend on. This
    probe streams real payload bytes through the same scan path, so a
    bandwidth-contended window inflates it even when sha2 does not.
    Deterministic file subset (sorted names), best of two runs. Returns
    None when there is no corpus dir (contract-only benches) or it is
    not a local directory."""
    if corpus_dir is None or not os.path.isdir(corpus_dir):
        return None
    from pyspark.sql import functions as F

    picked, acc = [], 0
    for name in sorted(os.listdir(corpus_dir)):
        if not name.endswith(".parquet"):
            continue
        p = os.path.join(corpus_dir, name)
        picked.append(p)
        acc += os.path.getsize(p)
        if acc >= target_bytes:
            break
    if not picked:
        return None
    best = None
    for _ in range(2):
        t0 = time.monotonic()
        spark.read.parquet(*picked).coalesce(8).agg(
            F.sum(F.octet_length("bytes"))
        ).collect()
        el = time.monotonic() - t0
        best = el if best is None or el < best else best
    return round(best, 3)


def run_calibration(spark) -> float:
    """Fixed-work VM-speed probe: sha2 over 4M ~1.2 KB strings in 8
    tasks (~8 CPU-core-seconds) — identical work regardless of sf,
    corpus size, or session core count (8 tasks saturate at cores >= 8;
    at cores < 8 it also reflects that leg's true core budget).
    Recorded in every bench JSON so cross-round/cross-VM comparisons
    can be normalized against a constant instead of argued (bench VMs
    differ round to round — measured in r2). Best of two runs (the
    first pays codegen warmup). CPU-only by design — see
    ``run_bw_probe`` for the bandwidth companion.
    """
    from pyspark.sql import functions as F

    best = None
    for _ in range(2):
        t0 = time.monotonic()
        spark.range(0, 4_000_000, 1, 8).agg(
            F.expr("bit_xor(xxhash64(sha2(repeat(cast(id as string), 64), 256)))")
        ).collect()
        el = time.monotonic() - t0
        best = el if best is None or el < best else best
    return round(best, 3)


CONTRACT_QUERIES = [
    "minhash_md5_signature",
    "jaccard_pairs_topk",
    "session_count_per_user",
    "lineitem_agg",
    "revenue_by_segment",
    "embedding_cosine_topk",
]


def bench_once(
    cores: int,
    sf_dir: str,
    include_contract: bool = True,
    include_text: bool = True,
    corpus_dir: str | None = None,
) -> dict:
    import __spark_entry__ as entrymod
    from sems_event_deduplication_spark.session import get_spark

    spark = get_spark(f"bench-{cores}", cores=cores, shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")

    queries: dict[str, float] = {}

    if include_text:
        # untimed warmup: same code path over 200 docs pays the
        # first-query JVM/codegen/Arrow-worker startup (~10 s, constant
        # regardless of data size) so the timed leg measures
        # steady-state throughput — the policy run_audio_dedup already
        # applies to its own setup
        run_text_dedup(spark, sf_dir, cores, limit=200)
        t0 = time.monotonic()
        run_text_dedup(spark, sf_dir, cores)
        queries["text_dedup_e2e"] = round(time.monotonic() - t0, 3)

    n_clips, audio_sec, stages, corpus_dir = run_audio_dedup(spark, corpus_dir)
    queries["audio_dedup_e2e"] = round(audio_sec, 3)
    clips_per_sec = round(n_clips / audio_sec, 2)

    if include_contract:
        qs = entrymod.queries()
        for name in CONTRACT_QUERIES:
            t0 = time.monotonic()
            qs[name](spark, sf_dir).toPandas()
            queries[name] = round(time.monotonic() - t0, 3)

    total = round(sum(queries.values()), 3)
    return {
        "metric": "dedup_bench_total_sec",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": _sf_label(sf_dir),
        "cores": cores,
        "audio_clips": n_clips,
        "clips_per_sec": clips_per_sec,
        "calibration_sec": run_calibration(spark),
        "bw_probe_sec": run_bw_probe(spark, corpus_dir),
        "audio_stages": stages,
    }


# a leg is host-contended (and rejected) when its normalized
# calibration exceeds this multiple of the session's best — 1.5x sits
# well above same-session jitter (~±10% measured) and well below the
# 2-5x probes of the contention episodes that produced r3's outlier
# pairs
CAL_GUARD = 1.5
MAX_LEG_RETRIES = int(os.environ.get("BENCH_SCALING_RETRIES", "3"))


def run_probe_anchor(cores: int, corpus_dir: str | None) -> dict:
    """``--bw-anchor`` mode: ONLY the two fixed-work probes at the
    given core count, no pipeline — a ~25 s subprocess whose result
    anchors the contention guard for that core count BEFORE the first
    real leg runs. Without it the bandwidth guard's per-core-count
    anchor had no sample until a second attempt existed, so a
    bw-contended FIRST leg at a core count could never be rejected on
    the bandwidth axis — and a slow 2-core leg inflates the headline
    efficiency, the exact false positive the guard exists to stop."""
    from sems_event_deduplication_spark.session import get_spark

    spark = get_spark(f"bwanchor-{cores}", cores=cores, shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")
    return {
        "cores": cores,
        "calibration_sec": run_calibration(spark),
        "bw_probe_sec": run_bw_probe(spark, corpus_dir),
    }


def _run_anchor(cores: int, corpus_dir: str) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--bw-anchor", str(cores)],
        capture_output=True, text=True,
        env={**os.environ, "SPARK_GRAFT_CORPUS": corpus_dir},
        timeout=1200,
    )
    json_lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if out.returncode != 0 or not json_lines:
        raise RuntimeError(
            f"probe anchor local[{cores}] failed (rc={out.returncode}); "
            f"stderr tail:\n{out.stderr[-2000:]}"
        )
    r = json.loads(json_lines[-1])
    bw = r.get("bw_probe_sec")
    return {
        "cores": cores,
        "cal_norm": round(r["calibration_sec"] * min(cores, 8), 3),
        "bw_norm": round(bw * min(cores, 8), 3) if bw is not None else None,
    }


def _run_leg(cores: int, sf_dir: str, corpus_dir: str) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--single", str(cores)],
        capture_output=True, text=True,
        env={**os.environ, "SPARK_GRAFT_SF_DIR": sf_dir,
             "SPARK_GRAFT_CORPUS": corpus_dir},
        timeout=6000,
    )
    json_lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if out.returncode != 0 or not json_lines:
        # surface the child's actual error instead of dying with an
        # opaque IndexError on the missing JSON line
        raise RuntimeError(
            f"scaling leg local[{cores}] failed (rc={out.returncode}); "
            f"stderr tail:\n{out.stderr[-2000:]}"
        )
    r = json.loads(json_lines[-1])
    # normalized probes: both probes are 8 fixed tasks, so they use
    # min(cores, 8) cores — value * min(cores, 8) is ~constant core-
    # seconds on an uncontended box, comparable ACROSS core counts.
    # cal = CPU (sha2); bw = cached-read bandwidth (payload scan) —
    # the two known contention modes of this shared host, measured
    # independently because r3 recorded sessions where one moved and
    # the other did not
    bw = r.get("bw_probe_sec")
    return {
        "cores": cores,
        "t_sec": r["queries"]["audio_dedup_e2e"],
        "clips_per_sec": r["clips_per_sec"],
        "cal_sec": r["calibration_sec"],
        "cal_norm": round(r["calibration_sec"] * min(cores, 8), 3),
        "bw_sec": bw,
        "bw_norm": round(bw * min(cores, 8), 3) if bw is not None else None,
        "n_clips": r["audio_clips"],
        "stages": r.get("audio_stages", {}),
    }


def run_scaling(sf_dir: str) -> dict:
    """Self-guarding paired scaling protocol (north rule: efficiency
    >= 0.8 between N and 4N): the identical flagship job at N=2 and
    4N=8 cores (plus a 32-core run for reference) over ONE shared
    corpus; efficiency = (T_N / T_4N) / 4 on the pipeline wall time.

    Every leg carries TWO fixed-work probes — sha2 CPU calibration and
    a cached payload-scan bandwidth probe (``run_bw_probe``; r4
    measured slow windows where multi-core legs ran 15-20% long with
    the CPU probe normal — the contended resource was cached-read
    bandwidth). A leg where either normalized probe exceeds
    ``CAL_GUARD`` x the session's best is host-contended — it is
    REJECTED and re-run automatically (up to ``MAX_LEG_RETRIES``), so
    one command either produces a clean pair or says exactly which leg
    stayed contended. This replaces r3's run-many-disclose-all
    protocol, where the headline pair had to be argued against outlier
    pairs by hand. ``SPARK_GRAFT_SCALING_CORPUS`` reuses an existing
    corpus directory instead of regenerating 34 GB per invocation.

    The headline pair is 2 -> 8: on this single-socket 32-vCPU VM,
    payload-heavy stages lose per-core efficiency above ~8 concurrent
    tasks to shared-cache/VM contention (measured: a fixed 3.3 GB
    payload scan costs ~2x the core-seconds at 32 tasks vs 8; the VM's
    own embarrassingly-parallel probe scales 8->32 at ~0.66), which is
    a property of the box, not of the plan. The 8 -> 32 numbers are
    reported alongside for transparency."""
    corpus_dir = os.environ.get("SPARK_GRAFT_SCALING_CORPUS")
    if not corpus_dir:
        corpus_dir = os.path.join(
            tempfile.mkdtemp(prefix="scaling_corpus_"), "audio_clips"
        )
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--gen-corpus", corpus_dir,
             str(SCALING_N_BASE), str(SCALING_DUR[0]), str(SCALING_DUR[1])],
            check=True, timeout=3000,
        )
    # cached-regime: warm the page cache once so the FIRST leg reads
    # the same medium as the later ones (without this, leg order biases
    # the ratio — the first leg pays cold virtio reads and then warms
    # the cache for everyone after it)
    buf = bytearray(1 << 22)
    for name in os.listdir(corpus_dir):
        with open(os.path.join(corpus_dir, name), "rb") as fh:
            while fh.readinto(buf):
                pass

    # Standalone probe anchors BEFORE any leg: ~25 s subprocesses that
    # run only the two fixed-work probes at each core count. They give
    # the bandwidth guard an independent per-core-count anchor, so even
    # the FIRST pipeline leg at a core count can be rejected as
    # bw-contended (previously the per-core anchor had no sample until
    # a re-run existed — a bw-contended initial 2-core leg sailed
    # through and INFLATED the headline efficiency, the exact false
    # positive the guard exists to stop). If an anchor itself runs in a
    # contended window, min() with subsequent leg probes still tightens
    # it — the anchor can only make the guard stricter, never looser.
    anchors = {c: _run_anchor(c, corpus_dir) for c in (2, 8, 32)}

    attempts: list[dict] = []

    def leg(cores: int) -> dict:
        a = _run_leg(cores, sf_dir, corpus_dir)
        attempts.append(a)
        return a

    selected = {c: leg(c) for c in (2, 8, 32)}

    # Guard anchors: CPU cal is cross-core comparable (sha2 saturates
    # its min(cores, 8) task slots with no shared resource), so its
    # anchor is the session-wide best across anchors + attempts. The
    # bandwidth probe is NOT — higher concurrency structurally shares
    # cached-read bandwidth (measured: bw_norm ~1.4x higher on 8-core
    # legs than 2-core legs on a quiet host) — so its anchor is the
    # best among the standalone anchor and attempts AT THE SAME core
    # count. A leg is contended when either probe exceeds the guard
    # multiple of its anchor; r4 measured slow windows where only the
    # bandwidth axis moved.
    def is_dirty(a: dict) -> bool:
        cal_anchor = min(
            [x["cal_norm"] for x in attempts]
            + [x["cal_norm"] for x in anchors.values()]
        )
        if a["cal_norm"] > CAL_GUARD * cal_anchor:
            return True
        same = [
            x["bw_norm"] for x in attempts
            if x["cores"] == a["cores"] and x["bw_norm"] is not None
        ]
        anchor_bw = anchors[a["cores"]]["bw_norm"]
        if anchor_bw is not None:
            same.append(anchor_bw)
        return bool(
            same
            and a["bw_norm"] is not None
            and a["bw_norm"] > CAL_GUARD * min(same)
        )

    retries = 0
    while retries < MAX_LEG_RETRIES:
        dirty = [c for c, a in selected.items() if is_dirty(a)]
        if not dirty:
            break
        retries += 1
        for c in dirty:
            selected[c]["rejected_contended"] = True
            selected[c] = leg(c)
    for a in attempts:
        a["clean"] = not is_dirty(a)
    anc = (
        min(
            [a["cal_norm"] for a in attempts]
            + [x["cal_norm"] for x in anchors.values()]
        ),
        min(
            (
                a["bw_norm"]
                for a in list(attempts) + list(anchors.values())
                if a["bw_norm"] is not None
            ),
            default=None,
        ),
    )

    t2, t8, t32 = (selected[c]["t_sec"] for c in (2, 8, 32))
    eff = round((t2 / t8) / 4.0, 3)
    eff_8_32 = round((t8 / t32) / 4.0, 3)
    pair_clean = selected[2]["clean"] and selected[8]["clean"]

    # the VM's own 2->8 efficiency on each probe, same formula as the
    # pipeline pair — context for reading the headline: a pipeline
    # number between/above the box's own probe efficiencies means the
    # plan adds no scaling overhead beyond the hardware's sharing
    def probe_eff(key: str):
        v2, v8 = selected[2].get(key), selected[8].get(key)
        return round((v2 / v8) / 4.0, 3) if v2 and v8 else None
    report = {
        "metric": "scaling_efficiency_n_to_4n",
        "value": eff,
        "unit": "ratio",
        "queries": {
            "t_local2_sec": round(t2, 3),
            "t_local8_sec": round(t8, 3),
            "t_local32_sec": round(t32, 3),
            "clips_per_sec_local2": selected[2]["clips_per_sec"],
            "clips_per_sec_local8": selected[8]["clips_per_sec"],
            "clips_per_sec_local32": selected[32]["clips_per_sec"],
            "efficiency_8_to_32": eff_8_32,
        },
        "sf": _sf_label(sf_dir),
        "n_clips": selected[2]["n_clips"],
        "pair_clean": pair_clean,
        "meets_north_rule": bool(eff >= 0.8),
        "vm_probe_eff_2_8": {"cpu": probe_eff("cal_sec"), "bw": probe_eff("bw_sec")},
        "cal_anchor_core_sec": anc[0],
        "bw_anchor_core_sec": anc[1],
        "probe_anchors": {str(c): a for c, a in anchors.items()},
        "attempts": [
            {k: v for k, v in a.items() if k != "stages"} for a in attempts
        ],
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    _write_scaling_run_md(report, selected, attempts)
    return report


def _write_scaling_run_md(report: dict, selected: dict, attempts: list[dict]) -> None:
    """SCALING_RUN.md = the guarded protocol's own output (every
    attempt disclosed with its calibration and clean/contended
    verdict) — regenerated per run so it can never contradict the
    analysis in BENCH/BASELINE.md."""
    eff = report["value"]
    q = report["queries"]
    lines = [
        "# BENCH scaling evidence (sandbox proxy for N vs 4N executors)",
        "",
        "Output of `python bench.py --scaling` — the self-guarding paired",
        "protocol: identical flagship dedup pipeline (min-checkpoint mode,",
        "north-rule stages still materialize) over ONE shared deterministic",
        f"corpus of {report['n_clips']} clips ({SCALING_DUR[0]}-{SCALING_DUR[1]}s audio each),",
        "one JVM per leg; every leg carries TWO fixed-work probes — sha2",
        "CPU calibration and a ~4 GB cached payload-scan bandwidth probe",
        "(the two contention modes of a shared host move independently) —",
        f"and any leg where either normalized probe exceeds {CAL_GUARD}x the",
        "session best is rejected as host-contended and re-run. Standalone",
        "probe-anchor subprocesses run BEFORE the first leg at each core",
        "count, so even a first leg can be rejected on the bandwidth axis",
        "(anchors below; an anchor can only tighten the guard, never",
        "loosen it).",
        "",
        "Probe anchors (no pipeline, probes only):",
        "",
        "| cores | cal_norm | bw_norm |",
        "|---|---|---|",
    ] + [
        f"| {c} | {a['cal_norm']} | {a['bw_norm']} |"
        for c, a in sorted(report.get("probe_anchors", {}).items(),
                           key=lambda kv: int(kv[0]))
    ] + [
        "",
        "| cores | pipeline wall (s) | audio clips/sec | cal norm | bw norm | clean |",
        "|---|---|---|---|---|---|",
    ]
    for c in (2, 8, 32):
        a = selected[c]
        lines.append(
            f"| local[{c}] | {round(a['t_sec'], 3)} | {a['clips_per_sec']} "
            f"| {a['cal_norm']} | {a['bw_norm']} "
            f"| {'yes' if a['clean'] else 'NO - still contended'} |"
        )
    lines += [
        "",
        f"**Scaling efficiency N=2 -> 4N=8: (T_2 / T_8) / 4 = {eff}"
        f"{' (>= 0.8: north rule MET)' if report['meets_north_rule'] else ' (< 0.8)'}**",
        f"Pair legs clean by probe guard: {report['pair_clean']}.",
        f"The VM's OWN 2->8 probe efficiencies this session (same formula): "
        f"CPU {report['vm_probe_eff_2_8']['cpu']}, cached-read bandwidth "
        f"{report['vm_probe_eff_2_8']['bw']} — the ceiling the box itself "
        f"imposes on any job whose inner loop is CPU or payload streaming.",
        "",
        f"8 -> 32 for reference: (T_8 / T_32) / 4 = {q['efficiency_8_to_32']}. On this",
        "single-socket 32-vCPU VM, per-core efficiency of payload-heavy",
        "stages degrades above ~8 concurrent tasks (shared cache / VM",
        "contention measured independently of Spark: a fixed-size payload",
        "scan costs ~2x the core-seconds at 32 concurrent tasks vs 8, and",
        "the VM's own embarrassingly-parallel probe scales 8->32 at ~0.66),",
        "so the clean N -> 4N comparison on this box is 2 -> 8.",
        "",
        "Every attempt this session (rejected legs disclosed, not hidden):",
        "",
        "| cores | wall (s) | cal_norm | bw_norm | verdict |",
        "|---|---|---|---|---|",
    ]
    for a in attempts:
        verdict = "accepted" if a.get("clean") else "rejected (contended)"
        if a.get("rejected_contended"):
            verdict = "rejected (contended), re-run"
        lines.append(
            f"| {a['cores']} | {round(a['t_sec'], 3)} | {a['cal_norm']} "
            f"| {a['bw_norm']} | {verdict} |"
        )
    lines += ["", "Full report JSON:", "```json", json.dumps(report), "```", ""]
    with open(os.path.join(REPO, "BENCH", "SCALING_RUN.md"), "w") as f:
        f.write("\n".join(lines))


def main():
    if "--gen-corpus" in sys.argv:
        i = sys.argv.index("--gen-corpus")
        path, n_base = sys.argv[i + 1], int(sys.argv[i + 2])
        dur_lo, dur_hi = float(sys.argv[i + 3]), float(sys.argv[i + 4])
        from sems_event_deduplication_spark.session import get_spark

        spark = get_spark("gen-corpus", cores=CPUS, shuffle_partitions=CPUS)
        spark.sparkContext.setLogLevel("ERROR")
        gen_corpus(spark, path, n_base, dur_lo, dur_hi)
        spark.stop()
        return
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling(SF_DIR)))
        return
    if "--offset" in sys.argv:
        print(json.dumps(run_offset_bench(CPUS)))
        return
    if "--incremental" in sys.argv:
        print(json.dumps(run_incremental_bench(CPUS)))
        return
    if "--streaming" in sys.argv:
        i = sys.argv.index("--streaming")
        engine = sys.argv[i + 1] if len(sys.argv) > i + 1 and not sys.argv[i + 1].startswith("-") else "join"
        if engine not in ("join", "stateful"):
            raise SystemExit(
                f"--streaming engine must be 'join' or 'stateful', got {engine!r}"
            )
        print(json.dumps(run_streaming_bench(CPUS, engine)))
        return
    if "--bw-anchor" in sys.argv:
        cores = int(sys.argv[sys.argv.index("--bw-anchor") + 1])
        print(json.dumps(run_probe_anchor(cores, os.environ.get("SPARK_GRAFT_CORPUS"))))
        return
    if "--single" in sys.argv:
        cores = int(sys.argv[sys.argv.index("--single") + 1])
        corpus_dir = os.environ.get("SPARK_GRAFT_CORPUS")
        print(json.dumps(bench_once(
            cores, SF_DIR, include_contract=False, include_text=False,
            corpus_dir=corpus_dir,
        )))
        return
    print(json.dumps(bench_once(CPUS, SF_DIR)))


if __name__ == "__main__":
    main()
