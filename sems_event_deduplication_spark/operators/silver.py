"""Silver-label assignment + pair-dataset semantics (SURVEY.md G6, §3.2).

Reference:
- silver label = majority ``pred_event_type`` per merged cluster
  (README.md:15; mode ops at ``create_silver_label.py:305-312``,
  relabel at ``:405-410``).
- pair labeling rule (``models/Datasets.py:162-198``): same cluster
  key => ``same_event`` (with a date-prefix temporal comparison),
  different => ``different_event``.
- cluster-size-stratified splits (``models/Datasets.py:16-41``) and
  balanced random pairs (``:57-99``) — re-expressed as seeded-hash
  (``xxhash64(key, seed)``) window pairing + ``sampleBy``:
  deterministic under fixed seed AND under repartitioning/retries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .strategies import DEFAULT_BROADCAST_CAP_ROWS, gated_broadcast


def silver_labels(
    df: DataFrame,
    cluster_col: str = "merged_component",
    type_col: str = "pred_event_type",
    oos_label: str = "oos",
    broadcast_cap_rows: int = DEFAULT_BROADCAST_CAP_ROWS,
) -> DataFrame:
    """Majority type per cluster (mode, ties -> lexicographic min);
    clusters whose only label is ``oos`` keep it (reference drops them
    at ``create_silver_label.py:273-278`` — callers filter).

    The mode table has one row per cluster — in a dedup corpus that is
    ~the row count, so the broadcast is count-gated
    (``strategies.gated_broadcast``), not assumed. NB the gate runs one
    eager count job and pins one persisted aggregate at construction
    time; release with ``strategies.release_gated_broadcasts`` after
    the consuming stage materializes."""
    cnt = df.groupBy(cluster_col, type_col).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy(cluster_col).orderBy(F.col("n").desc(), type_col)
    mode = (
        cnt.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(cluster_col, F.col(type_col).alias("silver_label"))
    )
    return df.join(gated_broadcast(mode, broadcast_cap_rows), cluster_col, "left")


def drop_all_oos_clusters(
    df: DataFrame,
    cluster_col: str = "merged_component",
    type_col: str = "pred_event_type",
    oos_label: str = "oos",
) -> DataFrame:
    """A7: remove clusters whose every row is out-of-scope
    (``create_silver_label.py:267-286``) — group predicate + anti-join."""
    bad = (
        df.groupBy(cluster_col)
        .agg(
            F.count_distinct(type_col).alias("n_types"),
            F.max(type_col).alias("only_type"),
        )
        .filter((F.col("n_types") == 1) & (F.col("only_type") == oos_label))
        .select(cluster_col)
    )
    return df.join(bad, cluster_col, "left_anti")


def label_pairs(
    pairs: DataFrame,
    members: DataFrame,
    id_col: str = "clip_id",
    cluster_col: str = "merged_component",
    date_col: str = "event_date",
) -> DataFrame:
    """Pair ground-truth labeling (``models/Datasets.py:162-198``):
    same cluster -> same_event / same_event_previous / same_event_later
    by date comparison; different cluster -> different_event."""
    a = members.select(
        F.col(id_col).alias("id_a"),
        F.col(cluster_col).alias("cl_a"),
        F.col(date_col).alias("d_a"),
    )
    b = members.select(
        F.col(id_col).alias("id_b"),
        F.col(cluster_col).alias("cl_b"),
        F.col(date_col).alias("d_b"),
    )
    j = pairs.join(a, "id_a").join(b, "id_b")
    same = F.col("cl_a") == F.col("cl_b")
    return j.select(
        "id_a",
        "id_b",
        F.when(~same, "different_event")
        .when(F.col("d_a") == F.col("d_b"), "same_event")
        .when(F.col("d_a") < F.col("d_b"), "same_event_previous")
        .otherwise("same_event_later")
        .alias("label"),
    )


def stratified_cluster_split(
    members: DataFrame,
    cluster_col: str = "merged_component",
    weights: tuple[float, float, float] = (0.8, 0.1, 0.1),
    seed: int = 420,
    large: int = 500,
    medium: int = 100,
    strategy: str = "exact",
) -> DataFrame:
    """Cluster-size-stratified train/val/test split (A9 + Datasets:16-41).

    Buckets clusters by size (>500 large, 100-500 medium, else small),
    then assigns whole clusters to splits — every member of a cluster
    lands in the same split (the reference's core requirement).

    The assignment key is ``xxhash64(cluster, seed)``, NOT
    ``rand(seed)``: rand's output depends on partition layout, so a
    different partition count or a task retry would silently reassign
    train/val/test membership. The hash is a pure function of the row —
    identical splits under any repartitioning.

    ``strategy`` (mirrors ``interval_merge_edges(strategy=...)``):

    - ``"exact"`` (default): rank clusters by the seeded hash within
      each size bucket (``row_number`` window) and cut at the exact
      cumulative fractions. Exact per-stratum fractions need a total
      order per stratum, so each bucket's cluster list sorts in ONE
      task — fine to ~10^8 clusters per bucket (narrow rows), not
      beyond.
    - ``"hash"``: the scale form — each cluster's split is a pure
      threshold test on its own hash mapped to [0, 1) (the
      ``deterministic_split`` contract query's device). A plain
      per-row projection: no window, no per-stratum sort, no join, no
      shuffle, no extra job AT ALL — the split is a function of
      nothing but the row's own cluster key, so attaching it needs no
      cluster table (an earlier form materialized distinct clusters
      and joined them back; that distinct shuffle + eager count were
      strictly wasted work). Clusters stay whole automatically (every
      member row hashes the same key to the same split). Fractions are
      approximate (binomial concentration: at 10^6+ clusters per
      stratum the realized fractions are within ~0.1% of the targets);
      per-bucket stratification holds because the hash is i.i.d.
      uniform across clusters of every bucket.

    NB the "exact" strategy calls ``gated_broadcast`` on the one-row-
    per-cluster assignment, which runs one eager count job at operator-
    construction time (see ``strategies.gated_broadcast``); "hash"
    runs no job. Both drop rows with a NULL cluster key ("exact" via
    its join's null-never-equal semantics, "hash" via an explicit
    filter — kept identical so switching strategy never changes the
    row universe)."""
    t, v, _ = weights
    if strategy == "hash":
        # map the 64-bit hash to u ~ U[0,1): sign bit folds in via +0.5
        u = (
            F.xxhash64(F.col(cluster_col), F.lit(seed)).cast("double")
            / F.lit(float(1 << 64))
            + F.lit(0.5)
        )
        return members.filter(F.col(cluster_col).isNotNull()).withColumn(
            "split",
            F.when(u < t, "train").when(u < t + v, "val").otherwise("test"),
        )
    if strategy != "exact":
        raise ValueError(f"unknown stratified-split strategy: {strategy!r}")
    sizes = members.groupBy(cluster_col).agg(F.count(F.lit(1)).alias("n"))
    bucketed = sizes.withColumn(
        "bucket",
        F.when(F.col("n") > large, "large")
        .when(F.col("n") > medium, "medium")
        .otherwise("small"),
    )
    w = Window.partitionBy("bucket").orderBy(
        F.xxhash64(F.col(cluster_col), F.lit(seed)), cluster_col
    )
    cum = (
        bucketed.withColumn("rn", F.row_number().over(w))
        .withColumn("tot", F.count(F.lit(1)).over(Window.partitionBy("bucket")))
        .withColumn("frac", (F.col("rn") - 0.5) / F.col("tot"))
    )
    assigned = cum.select(
        cluster_col,
        F.when(F.col("frac") <= t, "train")
        .when(F.col("frac") <= t + v, "val")
        .otherwise("test")
        .alias("split"),
    )
    # one row per cluster -> count-gated, not blindly broadcast
    return members.join(gated_broadcast(assigned), cluster_col)


def balanced_random_pairs(
    members: DataFrame,
    id_col: str = "clip_id",
    seed: int = 4,
    n_groups: int = 64,
) -> DataFrame:
    """Random disjoint pairing (``models/Datasets.py:72-73``),
    partitioned: salt every id into ``n_groups`` hash groups, pair row
    2i with 2i+1 *within each group* (a per-group window — ``n_groups``
    concurrent sort tasks, never one global single-partition sort),
    then pair the <= ``n_groups`` leftover rows from odd-sized groups
    in a second, trivially small global pass.

    ``xxhash64(id, seed)`` rather than ``rand(seed)`` everywhere, so
    the pairing is a pure function of the data — identical under any
    partition count or task retry. The salt word PREFIXES its mix-in
    (``xxhash64('salt', id, seed)``): Spark chains multi-arg xxhash64
    by feeding each argument's running hash in as the next seed, so a
    suffix salt (``xxhash64(id, seed, 'salt')``) would be a pure
    function of the order hash ``xxhash64(id, seed)`` — group
    membership would be a deterministic scramble of the order key, not
    an independent draw (the same chaining pitfall
    ``exact_dedup_digest_keys`` documents for the digest words).
    """
    salt = F.pmod(
        F.xxhash64(F.lit("salt"), F.col(id_col), F.lit(seed)), F.lit(n_groups)
    )
    idx = members.select(id_col).withColumn("__g", salt)
    w = Window.partitionBy("__g").orderBy(
        F.xxhash64(F.col(id_col), F.lit(seed)), id_col
    )
    idx = idx.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("__g"))
    )
    paired = _pair_rows(idx, id_col, ["__g"])

    # odd-sized groups strand their max-rn row; <= n_groups rows total,
    # so a global window over the leftovers is a one-task job over a
    # provably tiny frame
    leftover = idx.filter((F.col("n") % 2 == 1) & (F.col("rn") == F.col("n")))
    w2 = Window.orderBy(F.xxhash64(F.col(id_col), F.lit(seed)), id_col)
    left2 = leftover.select(id_col).withColumn("rn", F.row_number().over(w2)).withColumn(
        "__g", F.lit(-1)
    )
    return paired.unionByName(_pair_rows(left2, id_col, ["__g"]))


def _pair_rows(idx: DataFrame, id_col: str, group_cols: list[str]) -> DataFrame:
    """(group, rn, id) -> (id_a, id_b): row 2i-1 pairs with row 2i
    within its group."""
    pair_key = [*group_cols, "pair_id"]
    left = idx.filter(F.col("rn") % 2 == 1).select(
        *group_cols,
        ((F.col("rn") + 1) / 2).cast("long").alias("pair_id"),
        F.col(id_col).alias("id_a"),
    )
    right = idx.filter(F.col("rn") % 2 == 0).select(
        *group_cols,
        (F.col("rn") / 2).cast("long").alias("pair_id"),
        F.col(id_col).alias("id_b"),
    )
    return left.join(right, pair_key).select("id_a", "id_b")


def label_quota_pairs(
    members: DataFrame,
    labeler,
    labels: list[str],
    quota: int,
    id_col: str = "clip_id",
    seed: int = 4,
    max_rounds: int = 8,
) -> DataFrame:
    """Label-quota balanced pair generation (``models/Datasets.py:57-99``).

    The reference loops "draw random pairs, label them, count per
    label" until every label reaches its quota, then samples down to
    the quota. Same control flow here, but each round is one
    distributed pairing pass (``balanced_random_pairs`` with
    seed + round), the accumulated pair set is distinct-merged, and the
    driver only ever sees the per-label counts (a bounded-iteration
    driver loop like connected components — never the pairs
    themselves). The final cap is a per-label row_number window ordered
    by a seeded hash, so the sampled-down set is deterministic under
    any partitioning.

    ``labeler``: pairs(id_a, id_b) -> pairs + ``label`` column.
    Returns at most ``quota`` pairs per label in ``labels`` (fewer only
    if ``max_rounds`` pairing passes cannot produce enough — the
    reference has the same failure mode, an infinite loop; bounding it
    is the fix).
    """
    collected: DataFrame | None = None
    for r in range(max_rounds):
        # canonicalize the orientation BEFORE labeling and merging: each
        # round orients a pair by its own per-round hash order, so the
        # same unordered pair drawn in two rounds can arrive as (x,y)
        # and (y,x) — unmerged, it would double-count toward the quota
        # and ship duplicate pairs into the training set. Canonicalizing
        # before the labeler (not after) also keeps any orientation-
        # sensitive label consistent with the ids it ships with.
        drawn = balanced_random_pairs(members, id_col, seed=seed + r).select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
        labeled = labeler(drawn).filter(F.col("label").isin(labels))
        collected = (
            labeled
            if collected is None
            else collected.unionByName(labeled)
            .groupBy("id_a", "id_b")
            .agg(F.min("label").alias("label"))
        )
        # truncate lineage: the loop would otherwise double the plan
        # per round (same device as the CC star rounds)
        collected = collected.localCheckpoint()
        counts = {
            row["label"]: row["n"]
            for row in collected.groupBy("label")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        if all(counts.get(lb, 0) >= quota for lb in labels):
            break
    w = Window.partitionBy("label").orderBy(
        F.xxhash64(F.col("id_a"), F.col("id_b"), F.lit(seed)), "id_a", "id_b"
    )
    return (
        collected.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= quota)
        .drop("__rn")
    )
