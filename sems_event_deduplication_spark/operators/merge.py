"""Second-level cluster merging (SURVEY.md G5, J3, A1/A6, J4).

Reference ``merge_cluster`` (``create_silver_label.py:319-411``):
  1. per-cluster entity Counters (``:326-345``)
  2. keep entities mentioned > 4x per cluster (``:413-422``)
  3. all cluster pairs: overlap = |A∩B| / max(|A|,|B|) (``:424-430``)
  4. gate: overlap >= 0.5 AND temporal distance <= 10 days (``:380-381``)
  5. transitive merge (order-dependent by hand, ``:384-403``)
  6. relabel rows to the canonical merged id (``:405-410``)

Here: explode -> HAVING-filtered counts -> equi-join on entity (never
an O(n²) loop) -> interval gate (temporal.py) -> connected components
(components.py) -> broadcast remap. The reference's max-denominator
formula is preserved (NOT Jaccard) for decision parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .components import connected_components
from .strategies import DEFAULT_BROADCAST_CAP_ROWS, gated_broadcast
from .temporal import interval_merge_edges


def cluster_entity_counts(
    df: DataFrame,
    cluster_col: str = "component",
    entities_col: str = "entities",
    min_count: int = 4,
) -> DataFrame:
    """(cluster, entity) pairs with per-cluster mention count > min_count."""
    return (
        df.select(cluster_col, F.explode(entities_col).alias("entity"))
        .groupBy(cluster_col, "entity")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > min_count)
    )


def entity_overlap_edges(
    entity_counts: DataFrame,
    cluster_col: str = "component",
    min_overlap: float = 0.5,
    broadcast_cap_rows: int = DEFAULT_BROADCAST_CAP_ROWS,
) -> DataFrame:
    """Cluster pairs with |A∩B| / max(|A|,|B|) >= min_overlap.

    Shape: explode-join on entity (equi-join, shuffles on entity) +
    per-cluster set sizes joined back — never materializes n². The
    size table is one row per cluster, so its broadcast is count-gated
    (``strategies.gated_broadcast``); over the cap both size joins run
    as plain equi-joins under AQE. NB the gate runs one eager count job
    (and pins one persisted aggregate) at construction time — release
    with ``strategies.release_gated_broadcasts`` after the consuming
    stage materializes.
    """
    sizes = entity_counts.groupBy(cluster_col).agg(
        F.count(F.lit(1)).alias("n_entities")
    )
    sizes = gated_broadcast(sizes, broadcast_cap_rows)
    a = entity_counts.select(F.col(cluster_col).alias("ca"), "entity")
    b = entity_counts.select(F.col(cluster_col).alias("cb"), "entity")
    inter = (
        a.join(b, "entity")
        .filter(F.col("ca") < F.col("cb"))
        .groupBy("ca", "cb")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col(cluster_col).alias("ca"), F.col("n_entities").alias("na"))
    sb = sizes.select(F.col(cluster_col).alias("cb"), F.col("n_entities").alias("nb"))
    return (
        inter.join(sa, "ca")
        .join(sb, "cb")
        .withColumn("overlap", F.col("n_inter") / F.greatest("na", "nb"))
        .filter(F.col("overlap") >= min_overlap)
        .select("ca", "cb", "overlap")
    )


def merge_clusters(
    clustered: DataFrame,
    cluster_col: str = "component",
    entities_col: str = "entities",
    date_col: str = "event_date",
    min_entity_count: int = 4,
    min_overlap: float = 0.5,
    max_gap_days: int = 10,
    cc_max_iterations: int = 25,
) -> DataFrame:
    """Returns ``clustered`` with ``merged_component`` added.

    Edge = entity-overlap edge ∩ temporal edge; transitive closure via
    large-star/small-star CC; rows relabeled through a broadcast map
    (reference's ``Series.replace`` at ``create_silver_label.py:405-410``).
    """
    ents = cluster_entity_counts(clustered, cluster_col, entities_col, min_entity_count)
    e_overlap = entity_overlap_edges(ents, cluster_col, min_overlap)
    e_temporal = interval_merge_edges(clustered, cluster_col, date_col, max_gap_days)
    edges = e_overlap.join(e_temporal, ["ca", "cb"], "left_semi")

    comp = connected_components(
        edges, src="ca", dst="cb", max_iterations=cc_max_iterations
    ).select(
        F.col("clip_id").alias(cluster_col),
        F.col("component").alias("merged_component"),
    )
    # one row per merged cluster -> count-gated remap broadcast (the
    # reference's Series.replace is a driver-side map; here the map is
    # broadcast only when it provably fits)
    return clustered.join(gated_broadcast(comp), cluster_col, "left").withColumn(
        "merged_component",
        F.coalesce(F.col("merged_component"), F.col(cluster_col)),
    )
