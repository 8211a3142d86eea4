"""Write-side operators: partitioned and bucketed parquet sinks.

The reference is read-only (its only sink is the reverse pivot, reference
ds.py:229-234); a production training-data pipeline also needs to land
results. Two layouts matter at 100 TB:

- **Hive-partitioned parquet** (``write_partitioned``): coarse, low-
  cardinality keys (date, language, media_type) become directories, so
  downstream readers partition-prune at the listing level. File count is
  controlled explicitly — the classic failure is 1000 executors x 1000
  partition values = 1M tiny files.
- **Bucketed tables** (``write_bucketed``): high-cardinality join/dedup keys
  (user_id, doc_id) are hash-bucketed and sorted at write time; two tables
  bucketed the same way join with ZERO shuffle — the big win for repeated
  joins/dedup over the same keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = (),
    files_per_partition: int = 1,
) -> None:
    """Land a DataFrame as hive-partitioned parquet with a bounded file
    count: rows are pre-shuffled onto their partition value (plus a bounded
    spread factor), so each partition directory gets at most
    ``files_per_partition`` files instead of one per upstream task."""
    out = df
    if partition_cols:
        # repartition by the partition values -> each output dir is written
        # by few tasks; the multiplier keeps huge partitions parallel.
        n = max(df.sparkSession.sparkContext.defaultParallelism, 1)
        out = df.repartition(
            min(n, files_per_partition * 32), *partition_cols
        )
    writer = out.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table. Joins
    and aggregations on ``bucket_col`` between tables bucketed with the same
    ``n_buckets`` skip the shuffle entirely (Catalyst recognizes the
    co-partitioning from catalog metadata)."""
    writer = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two same-bucketed catalog tables on the bucket key — a
    shuffle-free sort-merge join when both sides were written with
    ``write_bucketed`` using the same bucket count."""
    return spark.table(left_table).join(spark.table(right_table), on=on)
