"""Structured Streaming front-end for the dedup engine.

The reference is wholly batch (SURVEY.md §2.10); streaming here covers
the ingest-side operators a 10^12-scale pipeline needs in front of the
batch dedup stages:

- ``streaming_exact_dedup``: ``dropDuplicatesWithinWatermark`` on the
  content digest — exact dedup of an unbounded clip stream with
  bounded state (plain ``dropDuplicates`` only evicts state when the
  event-time column is part of the KEY, which it must not be here —
  same content at different times is still a dup).
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

    ``dropDuplicatesWithinWatermark``, NOT ``dropDuplicates``: the
    plain variant only applies watermark eviction when the event-time
    column is among the key columns, and keying on ``ts`` would defeat
    content dedup — measured on this Spark build, the plain form's
    state grew monotonically (numRowsRemoved=0) as the watermark
    advanced. The WithinWatermark form evicts keys older than the
    watermark; a duplicate arriving later than the window re-emits,
    which is the documented bounded-state tradeoff.
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
    return keyed.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["content_key"])


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


NEARDUP_OUTPUT_SCHEMA = (
    "id_a string, id_b string, est_jaccard double"
)
NEARDUP_STATE_SCHEMA = "ids array<string>, sketches array<array<bigint>>"


def kmv_est_many(new_sk, stored, stored_len):
    """Vectorized bottom-k KMV Jaccard estimates of ``new_sk`` vs every
    stored sketch: among the k smallest of A ∪ B the fraction present
    in both, with k = min(|A|, |B|) — the standard KMV truncation, so
    the estimate only counts the hash-value region both sketches
    actually cover (a longer sketch beyond the shorter one's coverage
    must not deflate the estimate).

    ``stored`` is (m, K) sentinel-padded (``np.iinfo(int64).max``),
    each row sorted ascending with sentinels last (bottom-k sketches
    are stored sorted). One numpy broadcast replaces a per-row-pandas
    loop.
    """
    import numpy as np

    sentinel = np.iinfo(np.int64).max
    m, K = stored.shape
    ln = len(new_sk)
    new_pad = np.full(K, sentinel, dtype=np.int64)
    new_pad[:ln] = new_sk
    merged = np.concatenate([stored, np.broadcast_to(new_pad, (m, K))], axis=1)
    merged.sort(axis=1)
    real = merged < sentinel
    is_first = np.ones_like(real)
    is_first[:, 1:] = merged[:, 1:] != merged[:, :-1]
    # unique-rank of each real value within the sorted union
    rank = np.cumsum(is_first & real, axis=1)
    k = np.minimum(stored_len, ln)[:, None]
    # second occurrence of a duplicated value = present in both
    # sketches (values are unique within each sketch)
    both_in_bottom_k = (~is_first) & real & (rank <= k)
    return both_in_bottom_k.sum(axis=1) / np.maximum(1, k[:, 0])


def streaming_neardup_candidates(
    stream: DataFrame,
    cfg=None,
    watermark: str = "1 hour",
    state_ttl_minutes: int = 60,
    max_state_per_bucket: int = 64,
    min_est_jaccard: float = 0.55,
    sketch_k: int = 64,
    n_bucket_keys: int = 4,
) -> DataFrame:
    """Online near-dup detection with explicit keyed state
    (``applyInPandasWithState`` — the custom stateful operator the
    batch path has no counterpart for).

    Everything upstream of the state boundary is JVM-native: shingle
    hashing (xxhash64 in a transform), a bottom-k (KMV) sketch via
    ``array_sort`` + ``slice``, and the bucket keys = the ``n``
    smallest shingle hashes (single-permutation bottom-k MinHash: two
    docs share the global minimum with probability J, so n keys miss a
    true near-dup with probability (1-J)^n — ~6e-4 at J=0.85, n=4).
    This also sidesteps a Spark 4 planner gap where an ArrowEvalPython
    stage feeding the stateful exchange loses its columnar->row
    transition (ClassCastException: ColumnarBatchRow).

    Per (bucket key) the state holds ids + bottom-k sketches of seen
    members; a new arrival emits a row for each member whose
    KMV-estimated Jaccard clears ``min_est_jaccard`` — candidate
    generation + tier-1 verify online; exact verification and CC
    remain batch jobs over the emitted pairs.

    OUTPUT CONTRACT — canonical pairs, at-least-once: every emitted
    row is ``(id_a, id_b) = (least, greatest)`` of the two clip ids,
    so the same unordered pair ALWAYS ships as the identical row no
    matter which member arrived later or which bucket key produced it.
    Delivery is at-least-once: a pair sharing ``m`` bucket keys is
    emitted up to ``m`` times (cross-bucket dedup would need a second
    stateful exchange, which also trips a Spark 4 planner gap — see
    the note at the return expression). Downstream consumers MUST
    aggregate by ``(id_a, id_b)`` (``distinct`` / ``max(est_jaccard)``)
    before counting; because rows are canonical, that dedup is a plain
    exact groupBy — no least/greatest normalization left to forget.

    State is bounded two ways (non-negotiable over an unbounded
    stream): a FIFO cap of ``max_state_per_bucket`` members per bucket
    and an event-time timeout of ``state_ttl_minutes`` past the
    watermark, after which idle buckets are evicted.

    Measured scale ceiling (bench.py --streaming, 200k events,
    local[32]): ~1,069 events/s with recall 1.0 on planted pairs and
    TTL eviction active. The binding cost is per-GROUP Python
    dispatch: most bucket keys are singletons, so Spark invokes the
    stateful generator ~``n_bucket_keys`` times per event for
    microscopic groups. A 10x-throughput evolution at production
    rates would coarsen the state key (group = hash(bucket_key) % K
    with a per-bucket map inside one state row) to amortize dispatch
    over many buckets — kept out of this round because it complicates
    the timeout story (per-map-entry TTL instead of per-state-row),
    and because the win is NOT free: a coarse row (de)serializes its
    WHOLE bucket map every batch it is touched, so past
    ~total_state/K per row the serialization bytes eat the dispatch
    saving — K must track live state size, which is exactly the kind
    of self-tuning knob to add only with a production trace in hand.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..conf import DedupConfig
    from ..functions import minhash as M
    from ..functions.text import char_shingles

    cfg = cfg or DedupConfig()
    signed = (
        stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withColumn("__norm", normalize_text(F.col("transcript")))
        .withColumn(
            "__sketch",
            F.slice(
                F.array_sort(M.shingle_hashes(char_shingles(F.col("__norm"), cfg.shingle_k))),
                1, sketch_k,
            ),
        )
        .select(
            "clip_id", "ts", "__sketch",
            F.explode(F.slice(F.col("__sketch"), 1, n_bucket_keys)).alias("bucket_key"),
        )
    )
    ttl_ms = state_ttl_minutes * 60 * 1000

    SENTINEL = np.iinfo(np.int64).max
    est_jaccard_many = kmv_est_many

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        ids: list[str] = []
        sketches: list[list[int]] = []
        if state.exists:
            prev_ids, prev_sk = state.get
            ids, sketches = list(prev_ids), [list(x) for x in prev_sk]

        def padded(sk_list: list[int]) -> np.ndarray:
            row = np.full(sketch_k, SENTINEL, dtype=np.int64)
            row[: len(sk_list)] = sk_list
            return row

        stored_rows = [padded(s) for s in sketches]
        stored_lens = [len(s) for s in sketches]
        out_rows = []
        max_ts = None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values("ts")
            batch_ids = pdf["clip_id"].to_numpy()
            batch_sks = pdf["__sketch"].to_list()
            batch_ts = pdf["ts"].to_list()
            for cid, sk_list, ts in zip(batch_ids, batch_sks, batch_ts):
                sk = np.asarray(sk_list, dtype=np.int64)
                if ids:
                    ests = est_jaccard_many(
                        sk,
                        np.vstack(stored_rows),
                        np.asarray(stored_lens, dtype=np.int64),
                    )
                    for hit in np.nonzero(ests >= min_est_jaccard)[0]:
                        seen = ids[hit]
                        lo, hi = (cid, seen) if cid <= seen else (seen, cid)
                        out_rows.append((lo, hi, round(float(ests[hit]), 6)))
                ids.append(cid)
                sketches.append([int(v) for v in sk])
                stored_rows.append(padded(sketches[-1]))
                stored_lens.append(len(sk))
                if len(ids) > max_state_per_bucket:
                    ids = ids[-max_state_per_bucket:]
                    sketches = sketches[-max_state_per_bucket:]
                    stored_rows = stored_rows[-max_state_per_bucket:]
                    stored_lens = stored_lens[-max_state_per_bucket:]
                max_ts = ts if max_ts is None or ts > max_ts else max_ts
        state.update((ids, sketches))
        if max_ts is not None:
            state.setTimeoutTimestamp(int(pd.Timestamp(max_ts).value // 1_000_000) + ttl_ms)
        if out_rows:
            yield pd.DataFrame(out_rows, columns=["id_a", "id_b", "est_jaccard"])

    # NB at-least-once: a pair sharing several bucket keys is emitted
    # once per key — rows are canonicalized (least, greatest) above so
    # the duplicates are exact row repeats, and dedup belongs to the
    # downstream batch verify (adding a streaming dropDuplicates here
    # also trips a Spark 4 planner gap: the stateful operator's
    # columnar output reaches the dedup exchange without a
    # columnar->row transition and dies with ClassCastException:
    # ColumnarBatchRow).
    return (
        signed.withWatermark("ts", watermark)
        .groupBy("bucket_key")
        .applyInPandasWithState(
            update,
            outputStructType=NEARDUP_OUTPUT_SCHEMA,
            stateStructType=NEARDUP_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def run_stream_to_memory(agg: DataFrame, name: str, output_mode: str = "append"):
    """Drive a bounded source to completion synchronously; returns the
    in-memory result table name. Default mode is "append" — the only
    mode all three operators in this module accept (dropDuplicates and
    the append-mode stateful op reject "complete"); the windowed
    aggregation passes "complete" explicitly."""
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
