"""SparkSession construction + parquet table registration helpers.

The engine-level registration/catalog layer for N-D datasets lives in
``xarray_sql_spark.xr_session`` (reference sql.py); this module holds the
plain-Spark plumbing shared by the query registry, tests and bench.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.1"


def get_spark(app_name: str = "xarray-sql-spark", cpus: int | None = None) -> SparkSession:
    """Build a local SparkSession tuned for this container.

    Scale notes: everything configured here is also what we'd set on a real
    cluster — AQE for runtime re-planning (broadcast conversion, skew splits,
    partition coalescing), UTC session time, Arrow transfers for the Python
    boundary. Only ``master`` / memory are local-mode specific.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
        # events.parquet stores TIMESTAMP(NANOS); Spark has no nanos type —
        # read as epoch-nanos long, converted to a µs timestamp in table().
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one of the driver-provided parquet tables.

    ``events.ts`` is nanosecond-precision; with ``nanosAsLong`` it arrives as
    epoch nanos, converted here to a µs timestamp by floor division — exactly
    DuckDB's TIMESTAMP_NS -> TIMESTAMP truncation, so oracles agree.
    """
    if name == "events":
        # Runtime conf (not builder-only) so this works on ANY caller-supplied
        # SparkSession — the driver constructs its own plain session.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register the parquet tables as temp views so SQL-form queries run."""
    for name in names:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
