"""Materialization writers: the storage layouts that buy back shuffles.

``tests/test_bucketing.py`` proves the claim (orders<->lineitem join drops
from 2 exchanges to 0 when both sides are bucketed on the join key); this
module is the production API for creating those layouts. At 100 TB the
one-time bucketed write is amortized across every subsequent co-located
join and aggregation on the bucket key — the standard warehouse-side
answer to "this query always shuffles on the same key".
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialize_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    key: str,
    buckets: int = 64,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (and optionally sorted) parquet table.

    Joins and groupBys on ``key`` between tables bucketed with the SAME
    bucket count read co-located: no exchange, and with ``sort=True`` no
    sort either (SortMergeJoin runs directly on the sorted buckets).
    Bucket count rule of thumb: data_size / bucket_count ~ 100-200 MB per
    bucket file at the largest consumer's scale; use the same count across
    the tables that join.
    """
    w = df.write.mode(mode).bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.option("path", path).saveAsTable(table)


def materialize_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    dynamic: bool = True,
) -> None:
    """Write ``df`` partitioned by low-cardinality columns (date/hour/...).

    The layout behind partition pruning: a reader filtering on
    ``partition_cols`` scans only matching directories (the archive writer
    in streaming/pipelines.py emits the same layout for the event stream).
    Keep partition cardinality in the thousands, not millions — tiny
    partitions turn the listing itself into the bottleneck.

    ``dynamic=True`` (dynamic partition overwrite) makes backfills
    idempotent at the partition grain: re-running one day's job replaces
    ONLY the partitions present in ``df`` — static overwrite would wipe
    the whole table first, the classic backfill data-loss trap.
    """
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    if dynamic:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.mode(mode).partitionBy(*partition_cols).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def materialize_clustered(
    df: DataFrame,
    path: str,
    cluster_col: str,
    n_files: int = 32,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` range-clustered on ``cluster_col`` for data skipping.

    ``repartitionByRange`` gives each output file a disjoint value range and
    ``sortWithinPartitions`` orders rows inside it, so every parquet
    row-group's min/max stats cover a narrow slice. A reader filtering on
    ``cluster_col`` then skips whole files/row-groups at the scan — the
    poor man's Z-order, and the right layout for the one column most
    queries filter by (event time, usually). Unlike ``partitionBy`` this
    works for high-cardinality columns: the file count is fixed at
    ``n_files``, not one directory per value.
    """
    (
        df.repartitionByRange(n_files, cluster_col)
        .sortWithinPartitions(cluster_col)
        .write.mode(mode)
        .parquet(path)
    )


def compact_parquet(
    spark,
    src: str,
    dst: str,
    target_mb: int = 256,
    partition_by: tuple[str, ...] = (),
) -> dict:
    """Small-file compaction: rewrite ``src`` into ~``target_mb`` files.

    Streaming appends and per-batch writers accumulate kilobyte-scale
    files; at 100 TB the scan then pays per-file open/footer overhead and
    the driver holds millions of file statuses. Target file count =
    ceil(total_bytes / target_mb); round-robin ``repartition`` balances
    bytes across output files regardless of input skew. Sizes come from
    the Hadoop FileSystem API, so the same code runs on HDFS/S3/local.
    Writes to ``dst`` (atomic swap is the caller's rename) and returns the
    audit counts a compaction ledger records.
    """
    import math

    jpath = spark._jvm.org.apache.hadoop.fs.Path(src)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    total = fs.getContentSummary(jpath).getLength()
    df = spark.read.parquet(src)
    files_before = len(df.inputFiles())
    n = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    writer = df.repartition(n).write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(dst)
    return {
        "files_before": files_before,
        "files_after": len(spark.read.parquet(dst).inputFiles()),
        "bytes": int(total),
        "target_files": n,
    }
