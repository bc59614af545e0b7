"""Count-gated broadcast hints for cluster-level aggregate joins.

Sibling of ``exact_dedup.resolve_dedup_strategy``: a blind
``F.broadcast`` on a one-row-per-cluster table is a driver bomb in a
dedup corpus, where most clusters are singletons and cluster count ~
row count. The gate materializes the (narrow) aggregate once, counts
it, and only then decides — the count and the join share the same
computation, so the gate costs one cheap job, never a second pass over
the aggregate's lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ~a few hundred MB of driver hash table at typical (key, value) widths
DEFAULT_BROADCAST_CAP_ROWS = 5_000_000


def gated_broadcast(
    df: DataFrame, cap_rows: int = DEFAULT_BROADCAST_CAP_ROWS
) -> DataFrame:
    """Return ``df`` hinted for broadcast only if it provably fits.

    The frame is ``localCheckpoint``-ed (eager) so the gate count and
    every downstream consumer read the same materialized partitions —
    at most one computation of the aggregate regardless of the verdict.
    Over the cap the un-hinted frame is returned and AQE picks the join
    strategy from actual runtime sizes (SortMergeJoin / shuffled hash).

    ``cap_rows=0`` disables the hint unconditionally (plain join).
    """
    if cap_rows <= 0:
        return df
    df = df.localCheckpoint()
    return F.broadcast(df) if df.count() <= cap_rows else df
