"""Sinks (SURVEY.md §2.1: S6 append, S7 dynamic partition overwrite,
S8 full replace, S9 JDBC append) over a filesystem Parquet warehouse.

The reference writes Iceberg v2 tables through DataFrameWriterV2
(``append`` / ``overwritePartitions`` / ``createOrReplace`` — reference
process_covid_raw.py:102-113, process_covid_ods.py:79-91,
process_covid_dds.py:41-44). This module abstracts those three snapshot
semantics over plain partitioned Parquet so the engine runs anywhere
(testdata is plain parquet, no metastore needed):

  append                → mode("append")
  overwrite_partitions  → mode("overwrite") under
                          spark.sql.sources.partitionOverwriteMode=dynamic
                          (replaces ONLY the partitions present in the
                          incoming frame — idempotent day re-runs)
  replace               → mode("overwrite") of the whole table

On a deployment with Iceberg jars the same three verbs map 1:1 onto
DataFrameWriterV2; the Warehouse API is the stable seam.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class Warehouse:
    """A directory-rooted lakehouse: one subdir per ``layer.table``.

    Layout: ``<root>/<layer>/<table>/[<part_col>=<v>/...]*.parquet`` —
    hive-style partition dirs, so reads get partition pruning for free.
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    def path(self, table: str) -> str:
        """``layer.table`` → directory path."""
        return os.path.join(self.root, *table.split("."))

    def exists(self, table: str) -> bool:
        p = self.path(table)
        return os.path.isdir(p) and any(
            not entry.startswith(("_", ".")) for entry in os.listdir(p)
        )

    def read(self, table: str) -> DataFrame:
        return self.spark.read.parquet(self.path(table))

    # File-sizing guard for every write: without it one task writing a
    # huge hive partition emits one huge file (no parallel read), and at
    # the other extreme thousands of tasks emit the small-files problem
    # compaction exists to fix. maxRecordsPerFile rolls files task-side
    # at a target row count — set it so rows x row_width ~ 128-512 MB.
    max_records_per_file: int | None = None

    def _writer(
        self,
        df: DataFrame,
        partition_by: Sequence[str] | None,
        sort_within_partitions_by: Sequence[str] | None,
    ):
        # Write-side clustering for parquet RLE/dictionary efficiency —
        # the reference sorts raw rows by country before writing
        # (process_covid_raw.py:102, SURVEY.md §2.6 O1).
        if sort_within_partitions_by:
            df = df.sortWithinPartitions(*sort_within_partitions_by)
        writer = df.write.format("parquet")
        if self.max_records_per_file:
            writer = writer.option(
                "maxRecordsPerFile", str(self.max_records_per_file)
            )
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        return writer

    def append(
        self,
        df: DataFrame,
        table: str,
        partition_by: Sequence[str] | None = None,
        sort_within_partitions_by: Sequence[str] | None = None,
    ) -> None:
        """Create-or-append (S6 — reference probe-then-append,
        process_covid_raw.py:107-113; parquet append covers both cases)."""
        self._writer(df, partition_by, sort_within_partitions_by).mode(
            "append"
        ).save(self.path(table))

    def overwrite_partitions(
        self,
        df: DataFrame,
        table: str,
        partition_by: Sequence[str],
        sort_within_partitions_by: Sequence[str] | None = None,
    ) -> None:
        """Dynamic partition overwrite (S7 — reference
        ``overwritePartitions()``): replaces only the partitions present in
        ``df``, leaving all other history untouched. Re-running the same
        day twice is a no-op difference-wise — the reference's strongest
        invariant (SURVEY.md §5), encoded as a test here."""
        if not self.exists(table):
            self.append(df, table, partition_by, sort_within_partitions_by)
            return
        # Force dynamic mode for this write regardless of session defaults —
        # a static overwrite here would silently drop all other partitions'
        # history. Restored afterwards so callers' sessions are untouched.
        conf_key = "spark.sql.sources.partitionOverwriteMode"
        previous = self.spark.conf.get(conf_key)
        self.spark.conf.set(conf_key, "dynamic")
        try:
            self._writer(df, list(partition_by), sort_within_partitions_by).mode(
                "overwrite"
            ).save(self.path(table))
        finally:
            self.spark.conf.set(conf_key, previous)

    def replace(
        self,
        df: DataFrame,
        table: str,
        partition_by: Sequence[str] | None = None,
        sort_within_partitions_by: Sequence[str] | None = None,
    ) -> None:
        """Full replace (S8 — reference ``createOrReplace()`` rebuilding
        dim_location wholesale every run, process_covid_dds.py:41-44)."""
        self._writer(df, partition_by, sort_within_partitions_by).mode(
            "overwrite"
        ).save(self.path(table))

    def compact(
        self,
        table: str,
        partition_by: Sequence[str] | None = None,
        target_file_bytes: int = 128 * 1024 * 1024,
    ) -> None:
        """Rewrite a table's data files at ~target size (the small-files
        maintenance every append-per-micro-batch/day table needs at scale:
        thousands of KB-files per partition destroy scan parallelism
        bookkeeping and NameNode/S3-listing time).

        Uses ``maxRecordsPerFile`` derived from observed bytes/row so each
        output file lands near the target regardless of row width; data is
        re-clustered by the partition columns first so each task writes
        whole files for few partitions (no tiny per-task-per-partition
        shards). Reads fully before the overwrite (parquet has no
        snapshot isolation — at warehouse scale use Iceberg's
        rewrite_data_files, which this mirrors).

        Crash-safe swap protocol: the data always exists under either
        the table path or the ``__old`` backup. On entry, recover from a
        prior crash — restore the backup if the swap died between
        renames (table path missing), otherwise discard leftovers — so a
        crashed compaction never loses data or wedges the next one."""
        final = self.path(table)
        staging = final + "__compact"
        backup = final + "__old"
        if os.path.exists(backup):
            if not os.path.exists(final):
                # Crash window between the two renames: the backup IS
                # the table. Restore it.
                os.rename(backup, final)
            else:
                # Crash after the swap but before backup cleanup.
                shutil.rmtree(backup)
        if os.path.exists(staging):
            # Half-written staging from a crashed compaction run.
            shutil.rmtree(staging)
        df = self.read(table)
        total_rows = df.count()
        if total_rows == 0:
            return
        # Estimate bytes/row from current on-disk size.
        size = 0
        for dirpath, _dirs, files in os.walk(self.path(table)):
            size += sum(
                os.path.getsize(os.path.join(dirpath, f))
                for f in files
                if not f.startswith(("_", "."))
            )
        rows_per_file = max(1, int(total_rows * target_file_bytes / max(size, 1)))
        compacted = df
        if partition_by:
            compacted = compacted.repartition(*[F.col(c) for c in partition_by])
        else:
            n_files = max(1, (size + target_file_bytes - 1) // target_file_bytes)
            compacted = compacted.repartition(int(n_files))
        # Write to a staging dir then swap — self-overwrite of a parquet
        # dir being read is undefined.
        writer = compacted.write.format("parquet").option(
            "maxRecordsPerFile", str(rows_per_file)
        )
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.mode("overwrite").save(staging)
        os.rename(final, backup)
        os.rename(staging, final)
        shutil.rmtree(backup)


def merge_upsert(
    wh: Warehouse,
    df: DataFrame,
    table: str,
    keys: Sequence[str],
    partition_by: Sequence[str] | None = None,
) -> None:
    """MERGE/upsert by key: incoming rows replace same-key rows, others
    append (the lakehouse `MERGE INTO ... WHEN MATCHED UPDATE / WHEN NOT
    MATCHED INSERT` for whole-row updates).

    Scale shape: when the table is partitioned and the incoming frame
    carries the partition column, only the touched partitions are read
    and rewritten (existing rows outside them are untouched by dynamic
    partition overwrite); the key match is a left_anti join inside those
    partitions. Unpartitioned tables fall back to a full rewrite.
    """
    keys = list(keys)
    if not wh.exists(table):
        wh.append(df, table, partition_by=partition_by)
        return
    existing = wh.read(table)
    if partition_by:
        # Restrict to touched partitions (join-based, no collect):
        # semi-join keeps existing rows in partitions the batch touches.
        parts = df.select(*partition_by).distinct()
        # bcast: delta batch partition set (bounded by the incoming batch)
        touched = existing.join(F.broadcast(parts), on=list(partition_by), how="left_semi")
        survivors = touched.join(df.select(*keys), on=keys, how="left_anti")
        out = survivors.unionByName(df)
        wh.overwrite_partitions(out, table, partition_by=list(partition_by))
    else:
        survivors = existing.join(df.select(*keys), on=keys, how="left_anti")
        wh.replace(survivors.unionByName(df), table)


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    properties: dict[str, str] | None = None,
    batch_size: int = 10_000,
) -> None:
    """JDBC append sink (S9 — replaces the reference's Trino cross-catalog
    INSERT…SELECT into Postgres, alert_case_spike.sql:1-19).

    Each partition opens one connection and writes ``batch_size`` rows per
    round trip; ``df.coalesce(n)`` first if the target can't take one
    connection per partition. Needs the JDBC driver jar; tests use a
    Warehouse table as the alert sink instead.
    """
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .mode(mode)
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime jar is on the classpath.

    The parquet Warehouse above is the default arm (testdata is plain
    parquet, no metastore in the test environment); this probe gates the
    native arm and its tests (skipped, not failed, when absent)."""
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


class IcebergWarehouse:
    """Native Iceberg arm of the Warehouse seam: the same three snapshot
    verbs, mapped 1:1 onto DataFrameWriterV2 exactly as the reference
    writes them (probe-then-append process_covid_raw.py:102-113,
    ``overwritePartitions()`` process_covid_ods.py:79-91,
    ``createOrReplace()`` process_covid_dds.py:41-44).

    Requires a session configured with an Iceberg catalog, e.g.::

        spark.sql.catalog.<name> = org.apache.iceberg.spark.SparkCatalog
        spark.sql.catalog.<name>.type = hadoop
        spark.sql.catalog.<name>.warehouse = <dir>

    Iceberg supplies natively what the parquet arm reimplements:
    snapshot isolation (vs the compact() staging swap), time travel /
    rollback (vs SnapshotWarehouse's manifests), and rewrite_data_files
    (vs compact()). Table maintenance therefore lives in Iceberg
    procedures, not here.
    """

    def __init__(self, spark: SparkSession, catalog: str):
        if not iceberg_available(spark):
            raise RuntimeError(
                "Iceberg runtime jar not on the classpath; use the parquet "
                "Warehouse or add iceberg-spark-runtime to spark.jars"
            )
        self.spark = spark
        self.catalog = catalog

    def ident(self, table: str) -> str:
        """``layer.table`` → ``catalog.layer.table``."""
        return f"{self.catalog}.{table}"

    def exists(self, table: str) -> bool:
        return self.spark.catalog.tableExists(self.ident(table))

    def read(self, table: str) -> DataFrame:
        return self.spark.table(self.ident(table))

    def append(
        self,
        df: DataFrame,
        table: str,
        partition_by: Sequence[str] | None = None,
        sort_within_partitions_by: Sequence[str] | None = None,
    ) -> None:
        """S6 create-or-append — the reference's probe-then-append."""
        if sort_within_partitions_by:
            df = df.sortWithinPartitions(*sort_within_partitions_by)
        writer = df.writeTo(self.ident(table)).using("iceberg")
        if self.exists(table):
            writer.append()
        else:
            if partition_by:
                writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
            writer.create()

    def overwrite_partitions(
        self,
        df: DataFrame,
        table: str,
        partition_by: Sequence[str],
        sort_within_partitions_by: Sequence[str] | None = None,
    ) -> None:
        """S7 dynamic partition overwrite — native
        ``overwritePartitions()`` (no session-conf toggling needed: the
        writer-v2 verb is dynamic by definition)."""
        if not self.exists(table):
            self.append(df, table, partition_by, sort_within_partitions_by)
            return
        if sort_within_partitions_by:
            df = df.sortWithinPartitions(*sort_within_partitions_by)
        df.writeTo(self.ident(table)).using("iceberg").overwritePartitions()

    def replace(
        self,
        df: DataFrame,
        table: str,
        partition_by: Sequence[str] | None = None,
        sort_within_partitions_by: Sequence[str] | None = None,
    ) -> None:
        """S8 full replace — native ``createOrReplace()``."""
        if sort_within_partitions_by:
            df = df.sortWithinPartitions(*sort_within_partitions_by)
        writer = df.writeTo(self.ident(table)).using("iceberg")
        if partition_by:
            writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
        writer.createOrReplace()


def write_audit_publish(
    wh: Warehouse,
    df: "DataFrame",
    table: str,
    rules: list,
    partition_by: Sequence[str] | None = None,
) -> None:
    """Write-Audit-Publish: stage the data, gate it with DQ rules, then
    publish atomically — readers NEVER see unvalidated rows.

    1. WRITE: materialize ``df`` to ``<table>__wap`` (full compute +
       I/O happens here, against the staging path).
    2. AUDIT: run the declarative rule set against the STAGED files —
       auditing what was actually written, not the logical plan, so
       nondeterminism or a partial write is caught too.
    3. PUBLISH: swap staging into place via the same crash-safe rename
       choreography as :meth:`Warehouse.compact` (backup kept until the
       new data is in place).

    On audit failure the staging dir is removed and the live table is
    untouched — the pattern Iceberg ships as branch-based WAP,
    reproduced on plain parquet paths. Raises the gate's ValueError.
    """
    from covid_data_pipeline_spark.operators.quality import check

    staging_table = table + "__wap"
    staging = wh.path(staging_table)
    if os.path.isdir(staging):
        shutil.rmtree(staging)  # stale staging from a prior crash
    try:
        wh.replace(df, staging_table, partition_by=partition_by)
        check(wh.read(staging_table), rules)
    except Exception:
        if os.path.isdir(staging):
            shutil.rmtree(staging)
        raise

    final = wh.path(table)
    backup = final + "__old"
    if os.path.isdir(backup):
        shutil.rmtree(backup)
    if os.path.isdir(final):
        os.replace(final, backup)
    os.replace(staging, final)
    if os.path.isdir(backup):
        shutil.rmtree(backup)


def table_report(wh: Warehouse, table: str) -> dict:
    """Operational health snapshot of a table: file count, bytes,
    row count, and derived averages — the numbers that decide when to
    run :meth:`Warehouse.compact` (many small files) or raise
    ``max_records_per_file`` (files too large for parallel reads).

    File stats come from a driver-side directory walk (metadata only,
    no data read); the row count is the one Spark job. At object-store
    scale the walk becomes a manifest listing — same shape, same
    fields.
    """
    root = wh.path(table)
    files = []
    for dirpath, _dirnames, filenames in os.walk(root):
        for fn in filenames:
            if fn.startswith(("_", ".")) or not fn.endswith(".parquet"):
                continue
            files.append(os.path.join(dirpath, fn))
    total_bytes = sum(os.path.getsize(f) for f in files)
    rows = wh.read(table).count() if files else 0
    n = len(files)
    return {
        "table": table,
        "num_files": n,
        "total_bytes": total_bytes,
        "rows": rows,
        "avg_file_bytes": total_bytes // n if n else 0,
        "avg_rows_per_file": rows // n if n else 0,
    }
