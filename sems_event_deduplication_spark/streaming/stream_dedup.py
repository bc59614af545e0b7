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
- ``streaming_neardup_join_candidates``: online near-dup candidates
  as a NATIVE stream-stream self-join on bottom-k bucket keys with
  the KMV Jaccard estimate as JVM array expressions — the scale path
  (state lives in the JVM state store; no Python in the loop).
- ``streaming_neardup_candidates``: the same semantics as an explicit
  ``applyInPandasWithState`` operator — kept for workloads needing a
  per-bucket FIFO member cap, and as the custom-stateful template.

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
    bucket_stoplist=None,
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
    watermark, after which idle buckets are evicted. Known-hot
    boilerplate keys can additionally be shed BEFORE any state is
    keyed on them via ``bucket_stoplist`` (see
    ``_apply_bucket_stoplist`` / ``hot_bucket_keys``).

    Measured scale ceiling (bench.py --streaming, 200k events,
    local[32]): 1,069 events/s in r4; 1,416 after r5's shared
    parallel prep (the prep, not Python dispatch, was partly binding
    at source parallelism) — recall 1.0 on planted pairs and TTL
    eviction active either way. The binding cost is per-GROUP Python
    dispatch: most bucket keys are singletons, so Spark invokes the
    stateful generator ~``n_bucket_keys`` times per event for
    microscopic groups. THE SCALE PATH IS
    ``streaming_neardup_join_candidates`` (r5): the same candidate
    semantics as a native stream-stream self-join with the KMV
    estimate as JVM array expressions — measured 3.7x this operator's
    rate on the identical fixture (5,206 vs 1,416 events/s). This stateful form remains the
    right tool when a per-bucket FIFO member cap
    (``max_state_per_bucket``) is a hard requirement — the join bounds
    state by time only — and as the template for stateful logic the
    join genuinely cannot express (e.g. per-bucket online sketch
    MERGING rather than pairwise probing).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..conf import DedupConfig

    cfg = cfg or DedupConfig()
    signed = _apply_bucket_stoplist(
        _sketch_prep(stream, cfg, sketch_k, n_bucket_keys), bucket_stoplist
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


def _sketch_expr(k: int, sketch_k: int, hash_fn=F.xxhash64, hash_type: str = "bigint"):
    """Bottom-``sketch_k`` KMV sketch of the k-shingle xxhash64 set of
    the already-normalized ``__norm`` column, as one codegen'd
    expression. Shingle -> hash -> distinct on the INT64 hashes ->
    sort -> bottom k. Equivalent to hashing char_shingles'
    distinct-string output (hash of duplicate shingles = duplicate
    hashes; dedup commutes with hashing up to 2^-64 collisions) but
    the dedup compares 8-byte longs instead of UTF8 strings — measured
    ~2x cheaper per doc, and the prep is the single largest cost of
    the streaming operators. Shared by the streaming prep and the
    batch-side ``hot_bucket_keys`` so both enumerate the SAME key
    space.

    ``hash_fn``/``hash_type`` exist for the DuckDB-checkable contract
    twin (md5/string — an oracle can recompute it); production callers
    always take the xxhash64/bigint default."""
    n = F.length(F.col("__norm"))
    hashes = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - F.lit(k - 1)),
            lambda i: hash_fn(F.substr(F.col("__norm"), i, F.lit(k))),
        ),
    ).otherwise(
        F.when(n > 0, F.array(hash_fn(F.col("__norm"))))
        .otherwise(F.array().cast(f"array<{hash_type}>"))
    )
    return F.slice(F.array_sort(F.array_distinct(hashes)), 1, sketch_k)


def _sketch_prep(
    stream: DataFrame, cfg, sketch_k: int, n_bucket_keys: int
) -> DataFrame:
    """Shared JVM-native prep for both near-dup streaming operators:
    normalize -> distinct shingle xxhash64 -> bottom-k (KMV) sketch ->
    explode the ``n`` smallest hashes as bucket keys (single-permutation
    bottom-k MinHash: two docs share the global minimum with
    probability J, so n keys miss a true near-dup with probability
    (1-J)^n — ~6e-4 at J=0.85, n=4)."""
    # spread the prep across the cluster FIRST: the shingle/sort work
    # is ~1.4 ms/doc and a file/kafka micro-batch arrives in as many
    # tasks as source splits (maxFilesPerTrigger=4 -> FOUR tasks) — a
    # narrow prep chained onto the source runs at source parallelism
    # while the rest of the cluster idles (measured: the prep, not the
    # join state, dominated the whole operator before this exchange).
    # Hash-partition on clip_id (deterministic, uniform); the raw rows
    # being shuffled are small (id + ts + transcript).
    n_parts = stream.sparkSession.sparkContext.defaultParallelism
    norm = normalize_text(F.col("transcript"))
    return (
        stream.repartition(n_parts, "clip_id")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withColumn("__norm", norm)
        .withColumn("__sketch", _sketch_expr(cfg.shingle_k, sketch_k))
        .select(
            "clip_id", "ts", "__sketch",
            F.explode(F.slice(F.col("__sketch"), 1, n_bucket_keys)).alias("bucket_key"),
        )
    )


# persisted stop-key frames, keyed by the identity of the caller's
# input (the strong reference in the registry keeps the key stable):
# the same hot_bucket_keys frame passed to BOTH streaming operators —
# the documented deployment shape — now pins ONE cached copy instead of
# one per operator call, and `release_stoplists()` unpersists them all
# when the queries stop (ADVICE r5: per-call persist leak).
# Keys: id(frame) for DataFrame inputs (entry stores the source frame
# so a recycled id cannot alias), or ("vals", <sorted value tuple>) for
# oversized value lists — value-keyed, because each call materializes a
# FRESH internal DataFrame for a list input and an id()-keyed entry
# would never hit again (one pinned copy per call: exactly the leak
# this registry exists to prevent).
_STOPLIST_CACHE: dict[object, tuple[DataFrame | None, DataFrame]] = {}

# a literal isin above this many values bloats the plan/codegen that
# every micro-batch re-compiles; past it the value list becomes a
# DataFrame and takes the broadcast anti-join path instead
_STOPLIST_ISIN_MAX = 4096


def release_stoplists() -> int:
    """Unpersist every stop-key frame `_apply_bucket_stoplist` pinned
    and clear the registry; returns how many were released. Call after
    the streaming queries using them have stopped (a long-lived driver
    running many queries otherwise accumulates pinned frames)."""
    n = 0
    for _src, cached in _STOPLIST_CACHE.values():
        cached.unpersist()
        n += 1
    _STOPLIST_CACHE.clear()
    return n


def _apply_bucket_stoplist(signed: DataFrame, bucket_stoplist) -> DataFrame:
    """Drop exploded bucket-key rows whose key is stop-listed, BEFORE
    any state is keyed on them — a stop-listed key therefore holds
    zero join/operator state on either side.

    ``bucket_stoplist`` is either an iterable of int64 key values
    (compiled to a literal ``isin`` — zero extra state or exchange) or
    a STATIC DataFrame with an INTEGRAL ``bucket_key`` column
    (broadcast stream-static left-anti join — supported in append mode
    with the stream on the left), e.g. the output of
    ``hot_bucket_keys`` over a historical batch. A string-keyed frame
    (e.g. the md5 contract twin of ``hot_bucket_keys``) is rejected
    loudly: casting it to bigint would yield NULLs and the anti-join
    would silently shed nothing. The key frame is persisted and
    materialized HERE, once — the static side of a stream-static join
    is re-evaluated every micro-batch, so an unpersisted
    ``hot_bucket_keys`` plan would re-run its full historical
    scan/aggregation per batch; the persisted copy is registered per
    INPUT frame (passing the same frame to both streaming operators
    reuses one cache instead of pinning two) and released by
    ``release_stoplists()`` once the queries stop. Value lists larger
    than ``_STOPLIST_ISIN_MAX`` also take the anti-join path — a
    100k-value literal ``isin`` would be re-codegen'd per micro-batch.

    Recall accounting (callers should size ``n_bucket_keys`` with this
    in mind): a pair's miss bound is (1-J)^n over its n bucket keys;
    stop-listing s of them degrades that pair's bound to (1-J)^(n-s).
    A pair ALL of whose shared bottom keys are stop-listed is — by
    construction of the list — boilerplate-dominated, exactly the
    traffic the list exists to shed."""
    if bucket_stoplist is None:
        return signed
    if not isinstance(bucket_stoplist, DataFrame):
        # dedup + sort: isin semantics are unchanged, the literal is
        # deterministic, and the tuple doubles as the value-based cache
        # key for the anti-join path below
        vals = sorted({int(v) for v in bucket_stoplist})
        if not vals:
            return signed
        if len(vals) <= _STOPLIST_ISIN_MAX:
            return signed.filter(~F.col("bucket_key").isin(vals))
        # a huge literal list (min_members bounds the count only at
        # n_rows/min_members) would become a giant expression tree
        # recompiled per micro-batch — route it through the same
        # broadcast anti-join as the DataFrame form. Cache by VALUE:
        # each call builds a fresh DataFrame here, so an id()-keyed
        # entry could never hit again and every call would pin a new
        # persisted copy (the per-call leak this registry fixes).
        cache_key = ("vals", tuple(vals))
        cached_entry = _STOPLIST_CACHE.get(cache_key)
        if cached_entry is not None:
            return signed.join(
                F.broadcast(cached_entry[1]), "bucket_key", "left_anti"
            )
        spark = signed.sparkSession
        stop = (
            spark.createDataFrame([(v,) for v in vals], "bucket_key bigint")
            .persist()
        )
        stop.count()  # materialize once, not once per micro-batch
        _STOPLIST_CACHE[cache_key] = (None, stop)
        return signed.join(F.broadcast(stop), "bucket_key", "left_anti")
    dtype = dict(bucket_stoplist.dtypes).get("bucket_key")
    if dtype not in ("bigint", "int", "smallint", "tinyint"):
        raise ValueError(
            "bucket_stoplist DataFrame needs an integral bucket_key "
            f"column matching the streaming key space (got {dtype!r}; "
            "a string-keyed frame such as the md5 contract twin of "
            "hot_bucket_keys would cast to NULL and shed nothing)"
        )
    cached_entry = _STOPLIST_CACHE.get(id(bucket_stoplist))
    if cached_entry is not None and cached_entry[0] is bucket_stoplist:
        stop = cached_entry[1]
    else:
        stop = (
            bucket_stoplist.select(
                F.col("bucket_key").cast("bigint").alias("bucket_key")
            )
            .distinct()
            .persist()
        )
        stop.count()  # materialize once, not once per micro-batch
        _STOPLIST_CACHE[id(bucket_stoplist)] = (bucket_stoplist, stop)
    return signed.join(F.broadcast(stop), "bucket_key", "left_anti")


def hot_bucket_keys(
    batch: DataFrame,
    cfg=None,
    n_bucket_keys: int = 4,
    min_members: int = 256,
    hash_fn=F.xxhash64,
    hash_type: str = "bigint",
    id_col: str | None = None,
) -> DataFrame:
    """Hot-key report for the STREAMING operators' key space: the
    bucket keys (bottom-``n_bucket_keys`` shingle hashes, the exact
    ``_sketch_expr`` the streaming prep uses) that at least
    ``min_members`` rows of a historical batch would have landed on.

    The batch tier's ``lsh_stats`` reports hot BAND hashes — a
    different key space than the streaming bottom-k keys — so a
    streaming deployment derives its stop-list here instead: run over
    yesterday's corpus (or the exact-dedup survivors), persist the
    result, and pass it (or its collected values) as
    ``bucket_stoplist``. A key this common is boilerplate by
    definition: at bucket size m the join would hold m rows of state
    per side and emit O(m^2) candidate pairs that downstream exact
    verification would reject or CC would merge into one mega-cluster.

    Returns (bucket_key, n_members), descending by count. One explode
    + one partial-agg groupBy; no payload columns ride the shuffle.

    ``id_col``: when set, ``n_members`` counts DISTINCT ids per key
    instead of rows. A historical batch with repeated clip rows (the
    common shape BEFORE exact dedup) otherwise inflates the count and
    can stop-list a key whose distinct-document population is below
    ``min_members`` — silently shedding recall for it (ADVICE r5).
    Pass the batch's id column unless the input is known to be
    exact-dedup survivors; the default stays row-count so derivations
    over already-deduped corpora keep the single-pass partial-agg
    plan (distinct counting adds one exchange on (key, id))."""
    from ..conf import DedupConfig

    cfg = cfg or DedupConfig()
    signed = (
        batch.withColumn("__norm", normalize_text(F.col("transcript")))
        # sketch_k = n_bucket_keys: only the exploded key prefix matters
        .withColumn(
            "__sketch",
            _sketch_expr(cfg.shingle_k, n_bucket_keys, hash_fn, hash_type),
        )
    )
    if id_col is not None:
        counted = (
            signed.select(
                F.col(id_col).alias("__id"),
                F.explode("__sketch").alias("bucket_key"),
            )
            .groupBy("bucket_key")
            .agg(F.count_distinct("__id").alias("n_members"))
        )
    else:
        counted = (
            signed.select(F.explode("__sketch").alias("bucket_key"))
            .groupBy("bucket_key")
            .agg(F.count(F.lit(1)).alias("n_members"))
        )
    return counted.filter(F.col("n_members") >= min_members).orderBy(
        F.desc("n_members"), "bucket_key"
    )


def kmv_est_expr(a, b):
    """JVM-native bottom-k KMV Jaccard estimate between two sorted
    distinct-value sketch arrays — the exact arithmetic of
    ``kmv_est_many`` (property-tested equal) as codegen'd expressions:
    among the k = min(|a|, |b|) smallest values of the union, the
    fraction present in both. Entirely ``array_intersect`` /
    ``array_union`` / ``filter`` — no Python anywhere."""
    inter = F.array_intersect(a, b)
    uni = F.array_sort(F.array_union(a, b))
    k = F.least(F.size(a), F.size(b))
    kth = F.get(uni, k - 1)  # 0-based; k >= 1 guaranteed by the guard
    return F.when(
        k > 0,
        F.size(F.filter(inter, lambda v: v <= kth)) / k,
    ).otherwise(F.lit(0.0))


def streaming_neardup_join_candidates(
    stream: DataFrame,
    cfg=None,
    watermark: str = "1 hour",
    horizon_minutes: int = 60,
    min_est_jaccard: float = 0.55,
    sketch_k: int = 32,
    n_bucket_keys: int = 4,
    bucket_stoplist=None,
) -> DataFrame:
    """Online near-dup candidates as a NATIVE stream-stream self-join —
    the scale path (r5), replacing per-group Python dispatch with
    JVM-side state.

    ``streaming_neardup_candidates`` (below) is correct but its
    ``applyInPandasWithState`` invokes Python once per bucket-key group
    per micro-batch; most groups are singletons, so the measured
    ceiling was ~1,069 events/s at local[32] — production-insufficient
    and the engine's one documented weak-for-scale operator. This
    variant expresses the SAME candidate semantics as operations the
    JVM executes end-to-end:

    - same prep (``_sketch_prep``: bottom-k sketch + n smallest hashes
      as bucket keys, all codegen'd),
    - candidate pairing = inner self-join on ``bucket_key`` with an
      event-time range (``r.ts`` within ``horizon_minutes`` before
      ``l.ts``) — Spark's symmetric-hash-join state store keeps each
      side keyed by bucket under the watermark, evicting rows older
      than the horizon: per-key state lives in the JVM state store
      (RocksDB-capable), never crossing into Python,
    - tier-1 verify = the KMV estimate as native array expressions
      (``kmv_est_expr``), filtered at ``min_est_jaccard``.

    OUTPUT CONTRACT — identical to the stateful op: canonical
    ``(least, greatest)`` pairs, at-least-once (a pair sharing m bucket
    keys is emitted m times; consumers aggregate by (id_a, id_b)).
    Each unordered pair is produced by exactly one (l, r) orientation:
    the later arrival probes as ``l`` (ties broken by clip_id), so no
    (b, a) mirror rows exist even pre-dedup.

    Semantics vs the stateful op (both documented, neither hidden):
    - State bound: the join bounds state by TIME only (watermark +
      horizon). The stateful op also FIFO-caps members per bucket
      (``max_state_per_bucket``) — under a hot boilerplate bucket the
      join emits the full quadratic pair set where the cap would
      degrade recall to the newest members. At production rates pass
      ``bucket_stoplist`` — a list of key values or a static
      DataFrame from ``hot_bucket_keys`` over a historical batch —
      which drops stop-listed keys BEFORE the join keys state on them
      (``_apply_bucket_stoplist``), the same way the batch candidate
      join star-caps its buckets.
    - A duplicate arriving LATER than the horizon pairs with nothing —
      the same bounded-state tradeoff the other two operators document.

    ``sketch_k`` defaults to 32 here (the stateful op stores 64): the
    sketch rides EVERY state row (n_bucket_keys rows per event per join
    side), so its width directly prices the state path — measured ~25%
    of the whole operator's wall at 200k events. KMV error math says 32
    is enough for a CANDIDATE tier: the estimate's std dev is
    sqrt(J(1-J)/k) ~= 0.07 at J=0.8, k=32, so a true J=0.8 pair misses
    a 0.55 threshold only ~2e-4 of the time — and every emitted pair is
    exactly re-verified by the downstream batch Jaccard anyway. Raise
    it when the online estimate itself must be tight.

    Relies on the session's streaming state conf (session.py): RocksDB
    provider + join stateFormatVersion 3 + changelog checkpointing —
    measured ~2x on the state commit path vs the defaults.

    Measured (bench.py --streaming, the same 200k-event / 8-micro-batch
    fixture and VM, local[32], fresh process each): 5,206 events/s
    with planted recall 1.0 and zero extra pairs, vs 1,416 for the
    stateful op — 3.7x (the stateful op itself gained ~30% from the
    shared parallel prep; against its r4 measurement the join is
    4.9x). The remaining wall is Spark's per-row symmetric-hash-join
    state work (~0.4 ms/update measured), not Python.
    """
    from ..conf import DedupConfig

    cfg = cfg or DedupConfig()
    signed = _apply_bucket_stoplist(
        _sketch_prep(stream, cfg, sketch_k, n_bucket_keys), bucket_stoplist
    )
    wm = signed.withWatermark("ts", watermark)
    l, r = wm.alias("l"), wm.alias("r")
    cond = (
        (F.col("l.bucket_key") == F.col("r.bucket_key"))
        # extractable range conjuncts first: Spark derives state
        # eviction bounds from these (r rows older than the horizon
        # below the left watermark are dropped from the join state)
        & (F.col("r.ts") >= F.col("l.ts") - F.expr(f"INTERVAL {int(horizon_minutes)} MINUTES"))
        & (F.col("r.ts") <= F.col("l.ts"))
        # orientation tie-break: the later arrival is the probe, equal
        # timestamps resolve by id — each unordered pair joins exactly
        # once
        & ((F.col("r.ts") < F.col("l.ts")) | (F.col("r.clip_id") < F.col("l.clip_id")))
    )
    est = kmv_est_expr(F.col("l.__sketch"), F.col("r.__sketch"))
    return (
        l.join(r, cond)
        .withColumn("est_jaccard", F.round(est, 6))
        .filter(F.col("est_jaccard") >= F.lit(min_est_jaccard))
        .select(
            F.least(F.col("l.clip_id"), F.col("r.clip_id")).alias("id_a"),
            F.greatest(F.col("l.clip_id"), F.col("r.clip_id")).alias("id_b"),
            "est_jaccard",
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
