"""Exact deduplication (SURVEY.md §2.3 D1 / §2.6 W1).

Reference: ``drop_duplicates(subset='title', keep="last")``
(``create_silver_label.py:67``). "last" is positional there; here order
is an explicit column (``order_col``), so the semantics are
deterministic and distribution-safe:

    row_number() OVER (PARTITION BY key ORDER BY ord DESC) = 1

For the big pipeline the exact key is a content digest
``sha2(transcript) [, sha2(bytes)]`` so the (possibly huge) payload
never becomes a shuffle key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_keep_last(
    df: DataFrame, key_cols: list[str], order_col: str
) -> DataFrame:
    """Keep the last row (max order_col) per key. Deterministic."""
    w = Window.partitionBy(*key_cols).orderBy(F.col(order_col).desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def exact_dedup_by_content(
    df: DataFrame,
    text_col: str = "transcript_norm",
    payload_col: str | None = "bytes",
    order_col: str = "clip_id",
    algo: str = "xxh128",
) -> DataFrame:
    """Content-hash exact dedup: cheap cardinality cut before LSH.

    Mirrors the reference's "dedup before the expensive stage" ordering
    (``create_silver_label.py:67`` before ``:76``), keyed on digests so
    binary payloads don't ride the shuffle. Digest algo notes:
    ``exact_dedup_digest_keys``.
    """
    key_names, digests = exact_dedup_digest_keys(text_col, payload_col, algo)
    with_keys = df.select("*", *digests)
    out = dedup_keep_last(with_keys, key_names, order_col)
    return out.drop(*key_names)


def digest_rank_edges(
    narrow: DataFrame,
    key_names: list[str],
    id_col: str = "clip_id",
    order_col: str = "clip_id",
) -> DataFrame:
    """The keep-last ranking core: (id, order, digest keys) ->
    (id_a = keeper, id_b = dropped) edge list. Shared by
    ``exact_dedup_with_edges`` and the pipeline's fused scan path so
    keep-last semantics and edge orientation cannot drift apart.

    Skew bound: the window partitions by the digest keys, so a
    boilerplate mega-dup family (one digest shared by m rows) sorts its
    whole group in ONE task — O(m log m) narrow rows (id + order + two
    64-hex digests, no payload). That is ~10 GB of window state at
    m = 10^8 identical rows; corpora beyond that should pre-aggregate
    ``max(order) per key`` and join back instead of ranking (the LSH
    tier's star-edge cap is the analogous guard). Not the default
    because the agg+join form costs an extra shuffle on every corpus to
    protect against a shape exact dedup rarely sees."""
    w = Window.partitionBy(*key_names).orderBy(F.col(order_col).desc())
    ranked = narrow.withColumn("__rn", F.row_number().over(w)).withColumn(
        "__keeper", F.first(F.col(id_col)).over(w)
    )
    return (
        ranked.filter(F.col("__rn") > 1)
        .select(F.col("__keeper").alias("id_a"), F.col(id_col).alias("id_b"))
    )


def resolve_dedup_strategy(
    strategy: str, dropped_ids: DataFrame, max_broadcast_ids: int
) -> str:
    """'auto' -> count the dropped ids and pick anti_broadcast vs
    shuffle at the cap. Callers must hand in a MATERIALIZED dropped-id
    frame (checkpointed edges / warehouse table) — counting a lazy
    frame would re-run its whole lineage."""
    if strategy != "auto":
        return strategy
    n = dropped_ids.count()
    return "anti_broadcast" if n <= max_broadcast_ids else "shuffle"


def kept_from_edges(
    df: DataFrame,
    edges: DataFrame,
    id_col: str = "clip_id",
    strategy: str = "auto",
    max_broadcast_ids: int = 20_000_000,
) -> DataFrame:
    """Keeper rows of ``df`` given a MATERIALIZED edge table (e.g. a
    warehouse checkpoint): resolve the re-attach strategy (auto counts
    the cheap materialized table, never the payload lineage) and apply
    the corresponding join. Shared by both pipeline scan modes."""
    dropped_ids = edges.select(F.col("id_b").alias(id_col))
    strategy = resolve_dedup_strategy(strategy, dropped_ids, max_broadcast_ids)
    if strategy == "anti_broadcast":
        return df.join(F.broadcast(dropped_ids), id_col, "left_anti")
    if strategy == "semi_broadcast":
        keep_ids = df.select(id_col).join(dropped_ids, id_col, "left_anti")
        return df.join(F.broadcast(keep_ids), id_col, "left_semi")
    if strategy == "shuffle":
        return df.join(dropped_ids, id_col, "left_anti")
    raise ValueError(f"unknown exact-dedup strategy: {strategy!r}")


def exact_dedup_digest_keys(
    text_col: str, payload_col: str | None, algo: str = "xxh128"
) -> tuple[list[str], list]:
    """(key column names, digest select expressions) for content-hash
    exact dedup — one definition shared by the operator and both
    pipeline scan modes.

    ``algo``:

    - ``"xxh128"`` (default): two independent ``xxhash64`` words per
      content (second word salt-PREFIXES the input with a distinct
      literal) — a 128-bit composite key. The salt must come BEFORE
      the content column: Spark chains multi-arg ``xxhash64`` by
      feeding each argument's running hash in as the next seed, so a
      suffix salt (``xxhash64(col, lit)``) yields a word that is a
      pure function of ``xxhash64(col)`` — any first-word collision
      would automatically be a full-key collision, silently reducing
      the key to 64 bits. Prefixing hashes the content under a
      distinct derived seed instead, making the two words
      independent for accidental collisions.
      xxhash runs ~10x sha2's bytes/sec and,
      measured on the 108k-clip bench corpus, sha2 is also the
      worst-scaling work under core contention — the digest pass is
      pure overhead, so it should be the cheapest hash that cannot
      collide. Collision math: P(two DIFFERENT contents agree on both
      words) ~ 2^-128 per pair; at 10^12 rows (~2^79 pairs) the
      corpus-wide false-merge probability is ~2^-49 — negligible
      against any operational risk, including task retries.
    - ``"sha256"``: cryptographic digests, for warehouses that audit or
      share the digest column externally (content-addressable stores
      want preimage resistance, which xxhash does not offer).
    """
    if algo == "sha256":
        key_names = ["__k_text"]
        digests = [F.sha2(F.col(text_col), 256).alias("__k_text")]
        if payload_col is not None:
            key_names.append("__k_payload")
            digests.append(F.sha2(F.col(payload_col), 256).alias("__k_payload"))
        return key_names, digests
    if algo != "xxh128":
        raise ValueError(f"unknown exact-dedup digest algo: {algo!r}")
    key_names = ["__k_text_1", "__k_text_2"]
    digests = [
        F.xxhash64(F.col(text_col)).alias("__k_text_1"),
        F.xxhash64(F.lit("#2"), F.col(text_col)).alias("__k_text_2"),
    ]
    if payload_col is not None:
        key_names += ["__k_payload_1", "__k_payload_2"]
        digests += [
            F.xxhash64(F.col(payload_col)).alias("__k_payload_1"),
            F.xxhash64(F.lit("#2"), F.col(payload_col)).alias("__k_payload_2"),
        ]
    return key_names, digests


def exact_dedup_with_edges(
    df: DataFrame,
    id_col: str = "clip_id",
    text_col: str = "transcript_norm",
    payload_col: str | None = "bytes",
    order_col: str = "clip_id",
    strategy: str = "auto",
    max_broadcast_ids: int = 20_000_000,
    precomputed_edges: DataFrame | None = None,
    algo: str = "xxh128",
) -> tuple[DataFrame, DataFrame]:
    """Exact dedup + the (kept_id, dropped_id) edge list.

    The dropped rows must still appear in the final clusters (the
    reference keeps them implicitly because it dedups the *same* frame
    it clusters); the edges feed connected components so exact dups
    re-attach to their keeper's component.

    Shuffle shape (the 100 TB concern): the ranking window only ever
    sees the **narrow** projection (id, order, digests) — the binary
    payload never rides the digest shuffle. Payload rows re-attach via
    an id join whose plan is picked by ``strategy``:

    - ``anti_broadcast``: broadcast the **dropped**-id set and
      ``left_anti``-join the payload table against it. The dropped set
      is exactly what dedup removes — at a realistic dup rate it is a
      small fraction of the corpus, unlike the keeper set (≈ all rows),
      so the broadcast stays driver-safe even at 10⁹+ input rows.
    - ``semi_broadcast``: broadcast the keeper ids + ``left_semi`` —
      right only when the dup rate is huge (keepers ≪ dropped).
    - ``shuffle``: plain ``left_anti`` with no broadcast hint — the
      fallback when *both* id sets outgrow the driver; on a real
      cluster pair it with tables bucketed by ``id_col``
      (``WarehouseIO.save_bucketed``) so neither side exchanges.
    - ``auto`` (default): count the dropped ids (one cheap narrow job)
      and pick ``anti_broadcast`` vs ``shuffle`` at ``max_broadcast_ids``
      — the only mode safe at ANY dup rate, so it is the default; the
      explicit modes skip the count when the caller knows the shape.

    The old unconditional keeper broadcast was a driver bomb at scale
    (keepers ≈ all unique rows); explicit broadcast is still needed
    because AQE materializes both shuffle sides before converting a
    sort-merge join, which would exchange the payload.

    ``precomputed_edges``: an already-materialized edge table (e.g. a
    committed warehouse checkpoint on resume) — the digest scan and
    ranking are skipped entirely, so a resumed run never re-pays the
    payload-digest pass.
    """
    if precomputed_edges is not None:
        edges = precomputed_edges
    else:
        key_names, digests = exact_dedup_digest_keys(text_col, payload_col, algo)
        base_cols = [id_col] if order_col == id_col else [id_col, order_col]
        edges = digest_rank_edges(
            df.select(*base_cols, *digests), key_names, id_col, order_col
        )
        if strategy == "auto":
            # materialize the (tiny) edge list before the auto count:
            # the count's lineage otherwise re-runs the full digest
            # scan — sha2 over the payload column — once for the count
            # and again when the returned plans execute (a duplicated
            # full payload pass at exactly the scale "auto" protects).
            # (The pipeline avoids even this single extra
            # materialization by staging the edges to the warehouse
            # first and calling kept_from_edges on the committed table.)
            edges = edges.localCheckpoint()

    kept = kept_from_edges(df, edges, id_col, strategy, max_broadcast_ids)
    return kept, edges
