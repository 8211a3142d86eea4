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
        # Shuffle/spill codec, parameterised: lz4 (Spark's default) stays the
        # local default — an r15 ABAB at the 10x replica was split (dd15's
        # array-heavy shuffle 1.7x faster under zstd, ts19 ~15% slower, the
        # rest neutral), so no blanket local win. On a network-bound cluster
        # zstd's ratio usually pays (guide §2.3); flip via env there.
        .config(
            "spark.io.compression.codec",
            os.environ.get("SPARK_GRAFT_IO_CODEC", "lz4"),
        )
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


# Parquet's split unit is the row group: N row groups can never feed more
# than N scan tasks, whatever maxPartitionBytes says. The driver's testdata
# files are each ONE row group, so without compensation every scan (and its
# map-side partial aggregation / per-row expression work) runs serially on
# one of 32 cores. Cache: (path, mtime, size) -> row-group count — the
# stat in the key makes an in-process rewrite of the same path (the scale
# probe rebuilding its replica) invalidate naturally instead of serving a
# stale layout decision.
_ROW_GROUPS: dict[tuple, int] = {}


def _parquet_parts(path: str) -> list[str]:
    """Data files of a parquet dataset: the file itself, or a recursive
    walk collecting *.parquet / part-* FILES (hive-partitioned layouts
    keep parts under key=value subdirectories)."""
    if not os.path.isdir(path):
        return [path]
    parts: list[str] = []
    for root, _dirs, files in os.walk(path):
        for n in files:
            if n.endswith(".parquet") or n.startswith("part-"):
                parts.append(os.path.join(root, n))
    return parts


def _file_sig(path: str) -> tuple:
    """(path, mtime_ns, size) identity of a dataset's current contents.
    For a directory the signature aggregates over the PART FILES
    (count, total size, max mtime): the directory's own stat does not
    change when a part is rewritten in place (review finding)."""
    try:
        if os.path.isdir(path):
            parts = _parquet_parts(path)
            sizes = mt = 0
            for f in parts:
                st = os.stat(f)
                sizes += st.st_size
                mt = max(mt, st.st_mtime_ns)
            return (path, mt, sizes, len(parts))
        st = os.stat(path)
        return (path, st.st_mtime_ns, st.st_size)
    except OSError:
        return (path, 0, 0)

# session -> {(path, spread): reader DataFrame}; see table() docstring.
# Weak-keyed on the SparkSession so a stopped/collected session releases its
# DataFrames and a recycled object address can never serve stale plans.
import weakref

_TABLE_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


# Spark's FilePartition packing defaults (SQLConf): a file contributes
# size + openCostInBytes, and splits bin-pack up to maxPartitionBytes per
# scan task. Estimating the REAL task count needs both terms — a directory
# of ten 10 MB part-files has ten row groups but packs into ~5 tasks, and
# a 10 MB file with 50 row groups is still ONE task (byte ranges, not row
# groups, are the split unit; row groups only CAP the achievable split).
_MAX_PARTITION_BYTES = 128 * 1024 * 1024
_OPEN_COST_BYTES = 4 * 1024 * 1024


def _scan_tasks_available(path: str, cores: int = 1) -> int:
    """Estimate the scan tasks Spark's FilePartition packing will create,
    mirroring its maxSplitBytes rule: splits target
    min(maxPartitionBytes, max(openCost, totalEffective/cores)) bytes —
    the DYNAMIC term means small datasets on many-core sessions split
    finer than 128 MB (review finding: the static target alone
    undercounts multi-file layouts and would add a gratuitous
    repartition). Row groups CAP the achievable split per file (byte
    ranges cannot cut inside one). Unknown/empty layouts report
    'splittable' so spread never adds a shuffle on a layout it cannot
    read."""
    sig = (_file_sig(path), cores)
    if sig not in _ROW_GROUPS:
        try:
            import pyarrow.parquet as pq

            parts = _parquet_parts(path)
            total_effective = sum(
                os.path.getsize(f) + _OPEN_COST_BYTES for f in parts
            )
            max_split = min(
                _MAX_PARTITION_BYTES,
                max(_OPEN_COST_BYTES, total_effective // max(cores, 1)),
            )
            tasks = 0
            for f in parts:
                rg = pq.ParquetFile(f).num_row_groups
                # byte-range splits come from the RAW size (openCost only
                # affects packing), and row groups cap them per file
                splits = max(1, -(-os.path.getsize(f) // max_split))
                tasks += min(rg, splits) if rg else 1
            # bin-packing merges small splits across files up to
            # max_split effective bytes — a second cap on the total
            pack_bound = max(1, -(-total_effective // max_split))
            _ROW_GROUPS[sig] = min(tasks, pack_bound) if parts else 1 << 30
        except Exception:
            _ROW_GROUPS[sig] = 1 << 30  # unknown layout: assume splittable
    return _ROW_GROUPS[sig]


def table(
    spark: SparkSession, sf_dir: str, name: str, spread: bool = False
) -> DataFrame:
    """Read one of the driver-provided parquet tables.

    ``events.ts`` is nanosecond-precision; with ``nanosAsLong`` it arrives as
    epoch nanos, converted here to a µs timestamp by floor division — exactly
    DuckDB's TIMESTAMP_NS -> TIMESTAMP truncation, so oracles agree.

    ``spread=True`` declares the downstream per-row/aggregation work heavy
    enough to be worth distributing: if (and only if) the file's row-group
    count can't feed the session's cores, a round-robin ``repartition``
    follows the scan. On real multi-row-group / multi-file data this is a
    no-op — the check is on the physical layout, not the environment — so
    at 100 TB no gratuitous shuffle is added. Catalyst still pushes filters
    below the repartition into the scan (PushPredicateThroughNonJoin), so
    pushdown is preserved.

    The returned DataFrame is cached per (session, path, spread): a
    ``spark.read.parquet`` costs a driver round trip + footer/schema read
    every call, which multiplied across a six-table join's builder was the
    dominant share of its latency. DataFrames are immutable, so reuse is
    side-effect-free.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    per_session = _TABLE_CACHE.setdefault(spark, {})
    cache_key = (_file_sig(path), spread)
    cached = per_session.get(cache_key)
    if cached is not None:
        return cached
    if name == "events":
        # Runtime conf (not builder-only) so this works on ANY caller-supplied
        # SparkSession — the driver constructs its own plain session.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # UTC must hold for EVERY timestamp flavor, not just the NTZ branch
    # below: on a caller-supplied session with a non-UTC JVM default,
    # hour()/date_trunc() on LTZ columns would shift by the local offset
    # while the DuckDB oracles use UTC wall clock.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(path)
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # The driver's parquet has been observed with three timestamp physical
    # encodings across regenerations: TIMESTAMP(NANOS) (handled above),
    # µs-with-UTC-flag (read as TIMESTAMP_LTZ), and µs-without-flag (read as
    # TIMESTAMP_NTZ under inferTimestampNTZ). NTZ breaks unix_micros()/
    # numeric casts, so normalize every flavor to one type — µs LTZ under a
    # UTC session — which makes wall-clock values, epoch math and DuckDB's
    # epoch_us() agree exactly.
    from pyspark.sql.types import TimestampNTZType

    ntz_cols = [f.name for f in df.schema.fields if isinstance(f.dataType, TimestampNTZType)]
    if ntz_cols:
        from pyspark.sql import functions as F

        df = df.withColumns({c: F.col(c).cast("timestamp_ltz") for c in ntz_cols})
    if spread:
        cores = spark.sparkContext.defaultParallelism
        if _scan_tasks_available(path, cores) < max(cores // 4, 2):
            df = df.repartition(cores)
    per_session[cache_key] = df
    return df


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register the parquet tables as temp views so SQL-form queries run."""
    for name in names:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
