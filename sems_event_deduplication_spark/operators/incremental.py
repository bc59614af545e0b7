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
from .exact_dedup import exact_dedup_digest_keys
from .strategies import register_persisted
from .verify import verify_jaccard


def sign_batch(batch: DataFrame, cfg: DedupConfig, id_col: str = "clip_id",
               text_col: str = "transcript",
               payload_col: str | None = None) -> DataFrame:
    """(id, transcript[, payload]) -> (id, transcript_norm, digest key
    columns, shingle_hashes, minhash_sig, bands) — identical
    expressions to the pipeline's signatures stage, so batch and index
    signatures are comparable.

    The exact-tier keys come from ``exact_dedup_digest_keys`` —
    ONE definition of "exact" shared with the pipeline
    (``cfg.exact_digest_algo``: xxh128 default, sha256 audit mode),
    never a locally re-derived digest. With ``payload_col`` the keys
    cover text + payload, matching the pipeline's flagship semantics
    (same transcript over different audio is NOT content-identical);
    text-only callers get text-only keys — see ``incremental_dedup``
    for the semantic consequences of each choice."""
    mh = M.make_minhash_udf(cfg.num_perm, cfg.seed)
    norm = X.normalize_text(F.col(text_col))
    _, digests = exact_dedup_digest_keys(
        "transcript_norm", payload_col, cfg.exact_digest_algo
    )
    keep = [F.col(payload_col)] if payload_col is not None else []
    return (
        batch.select(
            F.col(id_col).alias("clip_id"), norm.alias("transcript_norm"), *keep
        )
        .select("clip_id", "transcript_norm", *digests)
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
    payload_col: str | None = None,
    persist: bool = True,
) -> dict[str, DataFrame]:
    """Dedup a new batch against a standing signature index.

    ``persist`` (default True): the three returned frames share the
    expensive lineage (batch sign UDFs, exact digest join, band join +
    verify) and ``novel`` anti-joins against the other two — consumed
    lazily, every downstream action would re-execute the whole shared
    tree (measured: 20x wall amplification on a 42k batch). The
    intermediates are therefore ``strategies.register_persisted``-ed;
    call ``strategies.release_gated_broadcasts()`` after the batch's
    outputs are written. Pass ``persist=False`` for plan-only
    construction (no eager job is run either way, but persisted frames
    pin executor storage once actions run).

    ``index_sigs``: the pipeline's persisted signatures stage
    (clip_id, transcript_norm, shingle_hashes, minhash_sig, bands
    [, digest key columns]). The exact tier keys on the SAME
    ``exact_dedup_digest_keys`` definition as the pipeline
    (``cfg.exact_digest_algo``), so the pipeline's persisted digest
    columns are reused verbatim when present (the fused scan mode
    persists them on the signatures table); a text-only index without
    them gets text keys derived from ``transcript_norm`` here. With
    ``payload_col`` the index MUST carry the payload key columns —
    payloads are not in the signature table, so they cannot be
    re-derived.

    Exact-hit semantics (explicit, per the key choice):

    - ``payload_col=None`` (text-only): "exact" = identical normalized
      transcript. A batch clip with the same transcript but different
      audio is an exact hit — right for text-only corpora, WRONG for
      the flagship audio+text table (the pipeline would keep that row
      as a distinct clip).
    - ``payload_col="bytes"``: the pipeline's flagship definition —
      "exact" = identical transcript AND identical payload. Same
      transcript over different audio falls through to the near tier,
      where the text Jaccard (1.0) flags it as a NEAR dup of the
      indexed clip — clustered with it, not silently dropped as
      content-identical, exactly as the batch pipeline treats it.

    Returns dict of DataFrames:
    - ``exact_hits``   (id_new, id_indexed): content-identical to an
      indexed clip (digest-key equi-join; at rest the index digest
      table is bucketed on the key columns, so this join is
      shuffle-free on the big side).
    - ``neardup_hits`` (id_new, id_indexed, jaccard): verified near
      dups of indexed clips.
    - ``novel``        the batch rows that matched nothing — the set
      to append to the corpus and its index.
    """
    signed = sign_batch(batch, cfg, id_col, text_col, payload_col)
    if persist:
        signed = register_persisted(signed)
    keys, _ = exact_dedup_digest_keys(
        "transcript_norm", payload_col, cfg.exact_digest_algo
    )
    missing = [k for k in keys if k not in index_sigs.columns]
    if missing:
        if payload_col is not None:
            raise ValueError(
                f"incremental_dedup: index_sigs lacks persisted payload digest "
                f"columns {missing} and payloads are not part of the signature "
                f"table — sign the index with payload_col={payload_col!r} "
                f"(the pipeline's fused scan mode persists these keys)"
            )
        text_keys, text_digests = exact_dedup_digest_keys(
            "transcript_norm", None, cfg.exact_digest_algo
        )
        # add ONLY the missing digest expressions: an index that already
        # persists a partial subset of the key columns (e.g. just
        # __k_text_1) would otherwise end up with duplicate column
        # names and an ambiguous-column failure at the exact-hit join
        index_sigs = index_sigs.select(
            "*",
            *[d for k, d in zip(text_keys, text_digests) if k in missing],
        )

    exact_hits = (
        signed.select("clip_id", *keys)
        .join(
            index_sigs.select(F.col("clip_id").alias("id_indexed"), *keys),
            keys,
        )
        .groupBy(F.col("clip_id").alias("id_new"))
        .agg(F.min("id_indexed").alias("id_indexed"))
    )
    if persist:
        exact_hits = register_persisted(exact_hits)

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
    if persist:
        neardup_hits = register_persisted(neardup_hits)

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


def append_to_index(
    novel_signed: DataFrame,
    wh,
    batch_id: str,
    name: str = "signatures",
    n_chunks: int = 0,
) -> DataFrame:
    """Commit a deduped batch's ``novel`` signatures to the standing
    index and return the grown index (closes the ingest loop: through
    round 4 ``incremental_dedup`` returned the rows "to append" but
    nothing performed the append, so day 2's batch could not match day
    1's novel rows).

    Layout: each ingest batch lands as its own committed increment
    directory ``<name>__inc/batch=<batch_id>/`` next to the pipeline's
    base ``<name>`` table — never rewriting the (100 TB-scale) base.
    ``load_index`` unions the base with every COMMITTED increment, so
    a reader never sees a half-written batch.

    Idempotency/retry: the write is keyed by ``batch_id`` —
      - a retry of a batch whose commit marker never landed overwrites
        the partial directory (parquet overwrite), and with
        ``n_chunks > 1`` resumes at the first uncommitted chunk via
        ``WarehouseIO.checkpoint_chunked`` (marker-validated, S8);
      - a re-run of an already-committed ``batch_id`` is a no-op (the
        committed increment is trusted, like every stage checkpoint) —
        so the ingest driver can safely replay its whole schedule.

    At real scale the increments accumulate; fold them into the base
    periodically by re-running the batch pipeline over the corpus (or,
    on the Iceberg backend, a table MERGE/rewrite — the parquet
    fallback deliberately does not implement an in-place base rewrite,
    which cannot be made crash-atomic on a plain filesystem).
    """
    import os as _os

    if getattr(wh, "use_iceberg", False):
        # the increment layout below is a parquet-directory protocol
        # (batch dirs + commit markers); on Iceberg the equivalent is a
        # native transactional append/MERGE into the signatures table,
        # which this sandbox cannot integration-test (no runtime jar —
        # DEPLOYMENT.md records the attempted run). Fail loudly rather
        # than writing catalog identifiers containing '/' and '=' that
        # load_index would never read back.
        raise NotImplementedError(
            "append_to_index implements the parquet-fallback increment "
            "layout; on an Iceberg catalog append the batch with a "
            "transactional writeTo(...).append() / MERGE into the "
            "signatures table instead"
        )
    sub = f"{name}__inc/batch={batch_id}"
    if n_chunks and n_chunks > 1:
        marker = _os.path.join(wh._path(sub), "_SUCCESS")
        if wh._fs_read_text(marker) is None:
            wh.checkpoint_chunked(
                novel_signed, sub, "clip_id", n_chunks, resume=True
            )
            # batch-level marker AFTER every chunk committed: readers
            # include an increment only when it is whole
            wh._fs_write_text(marker, "")
    else:
        if not wh.exists(sub):
            wh.save(novel_signed, sub, stage=f"{name}_increment")
    return load_index(wh, name)


def load_index(wh, name: str = "signatures") -> DataFrame:
    """The standing signature index: the pipeline's base ``<name>``
    table unioned with every committed ``append_to_index`` increment
    (uncommitted/partial batch directories are invisible). Column sets
    are reconciled by name; the base's column order wins."""
    import os as _os

    base = wh.load_clean(name)
    inc_root = wh._path(f"{name}__inc")
    if not wh._fs_exists(inc_root):
        return base
    if wh.remote:
        fs, p = wh._hadoop_fs(inc_root)
        batch_dirs = [
            str(st.getPath()) for st in fs.listStatus(p) if st.isDirectory()
        ]
    else:
        batch_dirs = [
            _os.path.join(inc_root, d)
            for d in sorted(_os.listdir(inc_root))
            if d.startswith("batch=")
        ]
    out = base
    for d in batch_dirs:
        if not wh._fs_exists(_os.path.join(d, "_SUCCESS")):
            continue
        inc = wh.spark.read.parquet(d)
        inc = inc.drop(
            *[c for c in ("_lineage_stage", "_lineage_part", "chunk")
              if c in inc.columns]
        )
        out = out.unionByName(inc.select(*base.columns))
    return out
