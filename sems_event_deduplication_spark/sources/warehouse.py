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


def _needs_hadoop_fs(path: str) -> bool:
    """Any URI-schemed warehouse path (hdfs://, s3a://, even file://)
    must route marker/_SUCCESS/cleanup ops through the Hadoop
    FileSystem API — ``os.path`` on ``s3a://...`` silently reports
    nothing exists, which would degrade every resume to a full rebuild
    and skip stale-chunk invalidation. Plain local paths keep cheap
    os/shutil calls."""
    return "://" in path


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
        self.remote = _needs_hadoop_fs(base_dir)
        if self.remote:
            self._fs_mkdirs(base_dir)
        else:
            os.makedirs(base_dir, exist_ok=True)

    # ---- filesystem plumbing: marker/_SUCCESS/cleanup ops must work on
    # the warehouse's OWN filesystem (hdfs://, s3a://, ...) — the 100 TB
    # shape — not just the driver's local disk. Remote paths route
    # through the Hadoop FileSystem API via the JVM gateway; local paths
    # keep cheap os/shutil calls.

    def _hadoop_fs(self, path: str):
        jvm = self.spark._jvm
        p = jvm.org.apache.hadoop.fs.Path(path)
        return p.getFileSystem(self.spark._jsc.hadoopConfiguration()), p

    def _fs_exists(self, path: str) -> bool:
        if not self.remote:
            return os.path.exists(path)
        fs, p = self._hadoop_fs(path)
        return fs.exists(p)

    def _fs_rmtree(self, path: str) -> None:
        if not self.remote:
            shutil.rmtree(path, ignore_errors=True)
            return
        fs, p = self._hadoop_fs(path)
        if fs.exists(p):
            fs.delete(p, True)

    def _fs_mkdirs(self, path: str) -> None:
        if not self.remote:
            os.makedirs(path, exist_ok=True)
            return
        fs, p = self._hadoop_fs(path)
        fs.mkdirs(p)

    def _fs_write_text(self, path: str, text: str) -> None:
        if not self.remote:
            with open(path, "w") as fh:
                fh.write(text)
            return
        fs, p = self._hadoop_fs(path)
        out = fs.create(p, True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()

    def _fs_read_text(self, path: str) -> str | None:
        """Contents of a small text file, or None iff it does not
        exist. Any OTHER failure (remote throttle, auth refresh,
        transport) must PROPAGATE: ``checkpoint_chunked`` treats a None
        marker as "layout invalid" and deletes every committed chunk,
        so swallowing a transient remote error would silently discard
        hours of committed progress instead of failing the run."""
        if not self.remote:
            try:
                with open(path) as fh:
                    return fh.read()
            except FileNotFoundError:
                return None
        fs, p = self._hadoop_fs(path)
        try:
            # open directly and classify the failure — an exists()
            # pre-check would race a concurrent delete into a crash
            stream = fs.open(p)
        except Exception as exc:  # Py4JJavaError wrapping the java cause
            java_exc = getattr(exc, "java_exception", None)
            cls = java_exc.getClass().getName() if java_exc is not None else ""
            if "FileNotFoundException" in cls:
                return None
            raise
        try:
            return str(
                self.spark._jvm.org.apache.commons.io.IOUtils.toString(
                    stream, "UTF-8"
                )
            )
        finally:
            stream.close()

    def _path(self, name: str) -> str:
        return os.path.join(self.base_dir, name)

    def exists(self, name: str) -> bool:
        if self.use_iceberg:
            return self.spark.catalog.tableExists(f"{self.catalog}.{name}")
        return self._fs_exists(os.path.join(self._path(name), "_SUCCESS"))

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
            self._fs_rmtree(self._path(name))

    def save_bucketed(
        self,
        df: DataFrame,
        name: str,
        bucket_col: str,
        n_buckets: int = 64,
        sort: bool = True,
    ) -> DataFrame:
        """Write a hash-bucketed (and sorted) table keyed on
        ``bucket_col`` — the shuffle-free join layout for the 100 TB
        path: two tables bucketed the same way joined on the bucket key
        plan as a SortMergeJoin with NO Exchange on either side (the
        exact-dedup payload re-attach at a scale where neither id set
        broadcasts). Bucketed output requires a catalog table
        (``saveAsTable``); the data itself lives under the warehouse
        dir as ordinary parquet. The catalog name is namespaced by a
        hash of this warehouse's base dir — the catalog is session-
        global, and two WarehouseIO instances writing a same-named
        stage would otherwise silently repoint each other's tables."""
        table = self._bucketed_table_name(name)
        writer = (
            df.write.mode("overwrite")
            .format("parquet")
            .option("path", self._path(name))
            .bucketBy(n_buckets, bucket_col)
        )
        if sort:
            writer = writer.sortBy(bucket_col)
        self.spark.sql(f"DROP TABLE IF EXISTS {table}")
        writer.saveAsTable(table)
        return self.spark.table(table)

    def _bucketed_table_name(self, name: str) -> str:
        import hashlib

        suffix = hashlib.sha256(self.base_dir.encode()).hexdigest()[:12]
        return f"{name}_wh{suffix}"

    def load_bucketed(self, name: str) -> DataFrame:
        """Read a bucketed table back *as* a bucketed table (the plain
        parquet path would lose the bucket metadata and re-shuffle)."""
        return self.spark.table(self._bucketed_table_name(name))

    @staticmethod
    def _chunk_key_desc(chunk_expr) -> str:
        """Stable serialization of the chunking key for the resume
        marker. ``Column.__str__`` is not stable across Spark versions
        (its expression ids churn), so a version upgrade would
        spuriously invalidate a resumable layout; the canonical SQL of
        the expression is. Falls back to ``str`` when the SQL is
        unavailable (e.g. Spark Connect columns)."""
        if isinstance(chunk_expr, str):
            return chunk_expr
        try:
            return str(chunk_expr._jc.expr().sql())
        except Exception:
            return str(chunk_expr)

    def checkpoint_chunked(
        self,
        df: DataFrame,
        name: str,
        chunk_expr,
        n_chunks: int = 8,
        resume: bool = False,
    ) -> DataFrame:
        """Mid-stage incremental commit (SURVEY.md S8): the stage's
        output is written as ``n_chunks`` independently committed
        parquet partitions (``chunk=i/_SUCCESS`` each), so a job killed
        at chunk k resumes at chunk k — the reference's
        every-N-batches partial save (``create_silver_label.py:103-106``)
        without its atomicity hole (a chunk is either fully committed or
        recomputed).

        ``chunk_expr``: either a column name (hashed into ``n_chunks``
        chunks) or a Column already in [0, n_chunks). Pass an expression
        aligned with the *input* partitioning (e.g. a date bucket) and
        each chunk's pass prunes its scan to its own slice — that is the
        100 TB shape; a hash of the id re-scans the input per chunk and
        is only sensible when the upstream is itself a checkpoint.

        A non-resume run clears the stage directory first, and the
        read-back enumerates exactly chunks 0..n_chunks-1 — stale
        committed chunks from an earlier run with a larger ``n_chunks``
        (or a different chunking key) can neither survive a fresh run
        nor leak into the result of a resumed one. Lineage columns are
        stamped like every other stage write."""
        chunk_desc = f"{n_chunks}:{self._chunk_key_desc(chunk_expr)}"
        if isinstance(chunk_expr, str):
            chunk_expr = F.pmod(F.xxhash64(F.col(chunk_expr)), F.lit(n_chunks))
        base = self._path(name)
        marker = os.path.join(base, "_chunking")
        if resume:
            # a resumed run must use the SAME chunk count and key as the
            # interrupted one — otherwise committed chunks hold rows
            # assigned under a different modulus and the result would
            # silently lose/duplicate rows. A missing or mismatched
            # marker invalidates the whole layout.
            resume = self._fs_read_text(marker) == chunk_desc
        if not resume:
            self._fs_rmtree(base)
            self._fs_mkdirs(base)
            self._fs_write_text(marker, chunk_desc)
        stamped = df.withColumn("_lineage_stage", F.lit(name)).withColumn(
            "_lineage_part", F.spark_partition_id()
        )
        chunk_dirs = [os.path.join(base, f"chunk={i}") for i in range(n_chunks)]
        for i, sub in enumerate(chunk_dirs):
            if resume and self._fs_exists(os.path.join(sub, "_SUCCESS")):
                continue
            stamped.filter(chunk_expr == i).write.mode("overwrite").parquet(sub)
        # read back ONLY the expected chunk dirs (never `base` wholesale:
        # a resumed run must not pick up stale extra chunk=* dirs)
        out = self.spark.read.option("basePath", base).parquet(*chunk_dirs)
        return out.drop("chunk", "_lineage_stage", "_lineage_part")

    def checkpoint(self, df: DataFrame, name: str, resume: bool = False) -> DataFrame:
        """Write-through checkpoint: reuse a committed table when
        ``resume``; otherwise compute, persist, and read back (which
        also truncates lineage like ``df.checkpoint()``, but durably)."""
        if resume and self.exists(name):
            return self.load_clean(name)
        self.save(df, name)
        return self.load_clean(name)
