"""Sinks: parquet (partitioned), JSON, JDBC truncate-load (S6-S8).

The reference writes unpartitioned overwrite-mode Parquet for silver
(`wistia-Databricks notebool-03.py:356-370`) and copies it to Azure SQL
via an ADF Copy with ``preCopyScript: TRUNCATE TABLE``
(`wistia-Azure-Data-Factory-ETL-Pipeline.json:117-120, 180-207`).

Scale posture:

- fact tables default to ``partitionBy(date)`` so downstream date
  predicates prune partitions (the reference's biggest single missed
  optimization at scale — SURVEY.md §4.2).
- the JDBC copy is Spark-native (``format("jdbc")`` with
  ``truncate=true``), replacing the external copy tool; writes fan out
  per partition with a bounded connection count.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
    max_records_per_file: int | None = None,
    sort_within_partitions_by: Sequence[str] | None = None,
) -> None:
    """S7: columnar sink. ``partition_by`` enables partition pruning;
    ``max_records_per_file`` bounds file sizes against skewed partitions.

    ``sort_within_partitions_by``: cluster rows inside each task's
    output file by these columns (no shuffle — a per-partition sort).
    Tightens parquet row-group min/max ranges so point/range predicates
    on those columns skip row groups at read time — the poor man's
    Z-order, and the single cheapest read-amplification fix for a
    100 TB table queried by a non-partition key."""
    if sort_within_partitions_by:
        df = df.sortWithinPartitions(*sort_within_partitions_by)
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.parquet(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S6: raw-zone JSON landing (`notebool-02.py:182`). Raw payload
    fidelity over efficiency — bronze only; silver+ is always parquet."""
    df.write.mode(mode).json(path)


def compact_parquet(
    spark,
    path: str,
    target_partitions: int,
    sort_by: Sequence[str] | None = None,
) -> int:
    """Small-files compaction: rewrite a parquet directory into
    ``target_partitions`` files (optionally clustered by ``sort_by``).

    The small-files problem is THE silent killer of long-lived streaming
    /incremental tables: a micro-batch-per-minute sink produces ~500k
    files/year, and open/seek overhead starts to dominate scans.
    Rewrites into a staging dir first, then swaps via filesystem rename.
    The delete→rename window is NOT transactional — on a production
    lake this job runs under a table format (Delta/Iceberg) or a
    partition-level lock; here it is the single-writer maintenance op.
    Returns the number of data files after compaction.
    """
    df = spark.read.parquet(path)
    out = df.repartition(target_partitions)
    if sort_by:
        out = out.sortWithinPartitions(*sort_by)
    staged = path.rstrip("/") + "__compact_staged"
    out.write.mode("overwrite").parquet(staged)

    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    HPath = jvm.org.apache.hadoop.fs.Path
    fs = HPath(path).getFileSystem(hconf)
    if not fs.delete(HPath(path), True):
        raise IOError(f"compact_parquet: failed to remove {path}")
    if not fs.rename(HPath(staged), HPath(path)):
        raise IOError(
            f"compact_parquet: rename {staged} -> {path} failed; "
            f"data is intact in {staged}"
        )
    n = 0
    for status in fs.listStatus(HPath(path)):
        name = status.getPath().getName()
        if name.startswith("part-"):
            n += 1
    return n


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    header: bool = True,
    delimiter: str = ",",
) -> None:
    """CSV sink — interchange/export only (no column pruning, no
    predicate pushdown, no types on re-read without a declared schema);
    silver+ storage stays parquet."""
    (
        df.write.mode(mode)
        .option("header", "true" if header else "false")
        .option("delimiter", delimiter)
        .csv(path)
    )


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
) -> None:
    """ORC sink — interop with Hive/Trino estates; same partitioned
    layout contract as :func:`write_parquet`."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def jdbc_truncate_load(
    df: DataFrame,
    url: str,
    table: str,
    options: dict[str, str] | None = None,
    num_partitions: int = 8,
) -> None:
    """S8: gold load with TRUNCATE-then-insert semantics (idempotent
    reruns, like the reference's preCopyScript). ``truncate=true`` keeps
    the table's DDL (PK/indexes) instead of drop+recreate.
    ``num_partitions`` caps concurrent DB connections — a 1000-executor
    write must not open 1000 connections against one database.

    Type boundary: pass the DataFrame through
    ``operators.gold.to_gold_fact`` first so the JDBC writer sends true
    ``DECIMAL(5,2)`` / ``INT`` columns matching the gold DDL (PDF p.26)
    instead of doubles — the explicit replacement for ADF's silent
    ``allowDataTruncation`` copy conversion
    (`wistia-Azure-Data-Factory-ETL-Pipeline.json:437-450, 204`).
    """
    w = (
        df.coalesce(num_partitions)
        .write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("truncate", "true")
        .option("batchsize", "10000")
        .mode("overwrite")
    )
    for k, v in (options or {}).items():
        w = w.option(k, v)
    w.save()
