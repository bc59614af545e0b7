"""WarehouseIO — stage checkpoint tables with resume semantics.

The reference checkpoints every stage to CSV and skips recompute when
the file exists (``create_silver_label.py:92-93,110-111,224,268`` —
SURVEY.md §2.1 S7). Here each stage is a Parquet table directory with
Spark's atomic ``_SUCCESS`` commit marker; ``exists`` only trusts a
committed write, so a killed run re-executes the interrupted stage
(idempotent re-entry).

Iceberg: the production target is an Iceberg catalog
(``df.writeTo("cp.stage").createOrReplace()``). The sandbox image has
no Iceberg runtime jar, so the same interface falls back to Parquet —
detection is by Spark conf, not import, because Iceberg is a JVM
extension. Either backend is hidden behind this class (SURVEY.md §7
step 5 "WarehouseIO abstraction").
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _iceberg_available(spark: SparkSession) -> bool:
    try:
        exts = spark.conf.get("spark.sql.extensions") or ""
    except Exception:
        return False
    return "IcebergSparkSessionExtensions" in exts


class WarehouseIO:
    def __init__(self, spark: SparkSession, base_dir: str, catalog: str | None = None):
        self.spark = spark
        self.base_dir = base_dir
        self.use_iceberg = catalog is not None and _iceberg_available(spark)
        self.catalog = catalog
        os.makedirs(base_dir, exist_ok=True)

    def _path(self, name: str) -> str:
        return os.path.join(self.base_dir, name)

    def exists(self, name: str) -> bool:
        if self.use_iceberg:
            return self.spark.catalog.tableExists(f"{self.catalog}.{name}")
        return os.path.exists(os.path.join(self._path(name), "_SUCCESS"))

    def save(self, df: DataFrame, name: str, stage: str | None = None) -> None:
        """Write a stage table; adds per-partition lineage columns.

        Lineage: originating spark partition + stage label travel with
        every row (north-rule "per-partition lineage").
        """
        out = df.withColumn("_lineage_stage", F.lit(stage or name)).withColumn(
            "_lineage_part", F.spark_partition_id()
        )
        if self.use_iceberg:
            out.writeTo(f"{self.catalog}.{name}").createOrReplace()
        else:
            out.write.mode("overwrite").parquet(self._path(name))

    def load(self, name: str) -> DataFrame:
        if self.use_iceberg:
            return self.spark.read.table(f"{self.catalog}.{name}")
        return self.spark.read.parquet(self._path(name))

    def load_clean(self, name: str) -> DataFrame:
        """Load without the lineage columns (for stage chaining)."""
        df = self.load(name)
        drop = [c for c in ("_lineage_stage", "_lineage_part") if c in df.columns]
        return df.drop(*drop)

    def drop(self, name: str) -> None:
        if self.use_iceberg:
            self.spark.sql(f"DROP TABLE IF EXISTS {self.catalog}.{name}")
        else:
            shutil.rmtree(self._path(name), ignore_errors=True)

    def checkpoint(self, df: DataFrame, name: str, resume: bool = False) -> DataFrame:
        """Write-through checkpoint: reuse a committed table when
        ``resume``; otherwise compute, persist, and read back (which
        also truncates lineage like ``df.checkpoint()``, but durably)."""
        if resume and self.exists(name):
            return self.load_clean(name)
        self.save(df, name)
        return self.load_clean(name)
