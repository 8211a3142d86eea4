"""Relational operator coverage (SURVEY.md §2B) over the driver's TPC-H-ish
tables, each with a DuckDB oracle.

Each query maps to surface the reference exercises through DataFusion
(reference evidence cited per query); here they run through stock Spark
SQL/Catalyst — projections, filters, aggregates, joins (equi / range /
interval-arithmetic / cross), CTEs, windows, subqueries, rollups, UDFs.

Scale notes (100 TB design intent, applies to every query here):
- All predicates/projections are expressed declaratively so Catalyst pushes
  them into the parquet scan (PushedFilters / ReadSchema pruning).
- Small dimension sides (region/nation/derived band tables) are explicitly
  ``F.broadcast``-hinted so the plan never shuffles the fact table for them.
- Aggregations are plain hash-agg (map-side partial -> shuffle on group keys
  -> final); group-key cardinality is bounded, so the shuffle is tiny
  regardless of fact size.
- Range/theta joins always put the tiny side in a broadcast nested-loop, the
  fact side streams.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from xarray_sql_spark.registry import query
from xarray_sql_spark.session import table


# --- q01: TPC-H Q1 shape: filter -> wide hash aggregate -------------------
# Reference evidence: aggregates AVG/SUM/MIN/MAX/COUNT (tests/test_sql.py:23-50),
# filter on a dim column (tests/test_sql.py:72-77), ORDER BY (211-230).
@query(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 0)                                   AS sum_qty,
           round(sum(l_extendedprice * (1 - l_discount)), 0)           AS sum_disc_price,
           round(avg(l_quantity), 6)                                   AS avg_qty,
           round(avg(l_extendedprice), 6)                              AS avg_price,
           round(avg(l_discount), 6)                                   AS avg_disc,
           CAST(count(*) AS BIGINT)                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("agg", "filter", "orderby"),
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide hash aggregate with partial map-side combine; 6-value group key
    space so the shuffle is O(partitions), independent of fact size."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 0).alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 0).alias(
                "sum_disc_price"
            ),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --- q02: projection + compound filter + per-row arithmetic ----------------
# Reference: scalar arithmetic in projection (01_ndvi.py:117-121), BETWEEN/IN/
# AND/OR filters (tests/test_reader.py:948-1271).
@query(
    "q02_filter_scan",
    oracle="""
    SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
           CAST(l_linenumber AS INT)  AS l_linenumber,
           l_quantity,
           round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS charged
    FROM lineitem
    WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
      AND l_returnflag IN ('A', 'R')
      AND (l_discount < 0.02 OR l_tax > 0.06)
    """,
    tags=("projection", "filter"),
)
def q02_filter_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure scan-side query: filter + projection both push to parquet
    (PushedFilters / ReadSchema show only the 7 referenced columns)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            F.col("l_shipdate").between(
                F.lit("1996-01-01").cast("timestamp_ntz"),
                F.lit("1996-12-31").cast("timestamp_ntz"),
            )
            & F.col("l_returnflag").isin("A", "R")
            & ((F.col("l_discount") < 0.02) | (F.col("l_tax") > 0.06))
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")), 6
            ).alias("charged"),
        )
    )


# --- q03: multi-way equi-join + agg + deterministic top-k ------------------
# Reference: INNER equi-JOIN multi-key (04_anomaly.py:89-111), LIMIT
# (tests/test_sql.py:12-21).
@query(
    "q03_top_revenue",
    oracle="""
    SELECT CAST(o.o_orderkey AS BIGINT) AS o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1996-03-15'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    tags=("join", "agg", "limit"),
)
def q03_top_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-fact join shuffles on the join key; customer filter applied
    before the join so the build side shrinks first. Deterministic LIMIT via
    unique orderkey tiebreak. Per-order revenue is a bounded-magnitude sum
    (few lineitems per order), so round(4) — the term grid scale — is cross-engine exact."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp_ntz")
    )
    l = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15").cast("timestamp_ntz")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
        .select(
            F.col("o_orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "revenue",
        )
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


# --- q04: EXISTS semi-join -------------------------------------------------
@query(
    "q04_exists_semijoin",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45
    )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("join", "semijoin", "subquery"),
)
def q04_exists_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as left-semi join: no row duplication, the probe side streams."""
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --- q05: snowflake join chain (TPC-H Q5 shape) ----------------------------
@query(
    "q05_region_volume",
    oracle="""
    SELECT n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 0) AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name IN ('ASIA', 'EUROPE')
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
    tags=("join", "agg", "broadcast"),
)
def q05_region_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-way join: nation/region/supplier are broadcast (tiny dims), so the
    only shuffles are the two fact-side equi-joins; Catalyst/AQE picks
    broadcast automatically but we hint to make the plan deterministic."""
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz")
    )
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name").isin("ASIA", "EUROPE"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 0).alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy("n_name")
    )


# --- q06: single-row scalar aggregate (TPC-H Q6 shape) ---------------------
@query(
    "q06_forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 0) AS promo_revenue,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    tags=("agg", "filter"),
)
def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All predicates push to the scan; single global aggregate — partials
    combine map-side so only one row per partition reaches the driver stage."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        & F.col("l_discount").between(0.03, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 0).alias("promo_revenue"),
        F.count("*").alias("n_rows"),
    )


# --- q07: CROSS JOIN (reference tests/test_sql.py:126-134) -----------------
@query(
    "q07_cross_join",
    oracle="""
    SELECT r.r_name, n.n_name
    FROM region r CROSS JOIN nation n
    """,
    tags=("join", "cross"),
)
def q07_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tiny×tiny cartesian product; at scale a cross join is only ever sane
    when one side is broadcastable — which this is."""
    r = table(spark, sf_dir, "region").select("r_name")
    n = table(spark, sf_dir, "nation").select("n_name")
    return r.crossJoin(n)


# --- q08: FILTER-clause aggregates + null semantics ------------------------
# Reference: COUNT(*) FILTER (WHERE ...) + NaN->null (tests/test_sql.py:155-195).
@query(
    "q08_agg_filter",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT)                                    AS n_events,
           CAST(count(*) FILTER (WHERE value > 50) AS BIGINT)          AS n_high,
           CAST(count(nullif(value, 0)) AS BIGINT)                     AS n_nonzero,
           round(avg(value), 6)                                        AS avg_value,
           round(min(value), 6)                                        AS min_value,
           round(max(value), 6)                                        AS max_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("agg", "null"),
)
def q08_agg_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregates; COUNT skips nulls (the reference maps NaN->null
    at ingest so engine aggregates agree — same convention here)."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.count(F.when(F.col("value") > 50, 1)).alias("n_high"),
            F.count(F.nullif(F.col("value"), F.lit(0.0))).alias("n_nonzero"),
            F.round(F.avg("value"), 6).alias("avg_value"),
            F.round(F.min("value"), 6).alias("min_value"),
            F.round(F.max("value"), 6).alias("max_value"),
        )
        .orderBy("event_type")
    )


# --- q09: climatology GROUP BY date_part (geospatial case 02 shape) --------
# Reference: GROUP BY date_part('hour', time) (02_climatology.py:96-106).
@query(
    "q09_climatology_hour",
    oracle="""
    SELECT event_type,
           CAST(extract(hour FROM ts) AS BIGINT) AS hour,
           round(avg(value), 6)      AS clim_value,
           CAST(count(*) AS BIGINT)  AS n
    FROM events
    GROUP BY event_type, extract(hour FROM ts)
    ORDER BY event_type, hour
    """,
    tags=("agg", "datetime", "geospatial-shape"),
)
def q09_climatology_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day climatology — the reference's ERA5 case 02 re-expressed on
    the events table. Group-key space is 5 types × 24 hours regardless of
    input size, so this aggregates 100 TB into 120 rows with one shuffle."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type", F.hour("ts").cast("long").alias("hour"))
        .agg(F.round(F.avg("value"), 6).alias("clim_value"), F.count("*").alias("n"))
        .orderBy("event_type", "hour")
    )


# --- q10: anomaly = CTE climatology self-join (geospatial case 04 shape) ---
# Reference: WITH clim AS (...) self-join (04_anomaly.py:89-111).
@query(
    "q10_anomaly_cte",
    oracle="""
    WITH clim AS (
        SELECT event_type, CAST(extract(hour FROM ts) AS BIGINT) AS hour,
               avg(value) AS clim_value
        FROM events GROUP BY 1, 2
    )
    SELECT e.event_type,
           strftime(e.ts, '%Y-%m-%d') AS day,
           round(avg(e.value - c.clim_value), 6) AS anomaly,
           CAST(count(*) AS BIGINT)  AS n
    FROM events e
    JOIN clim c
      ON e.event_type = c.event_type
     AND CAST(extract(hour FROM e.ts) AS BIGINT) = c.hour
    GROUP BY e.event_type, strftime(e.ts, '%Y-%m-%d')
    ORDER BY e.event_type, day
    """,
    tags=("join", "cte", "agg", "geospatial-shape"),
)
def q10_anomaly_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anomaly vs hourly climatology. The climatology side is a 120-row
    aggregate — broadcast it, so the fact table is scanned twice but never
    shuffled for the join."""
    e = table(spark, sf_dir, "events")
    clim = (
        e.groupBy("event_type", F.hour("ts").cast("long").alias("hour"))
        .agg(F.avg("value").alias("clim_value"))
    )
    return (
        e.withColumn("hour", F.hour("ts").cast("long"))
        .join(F.broadcast(clim), ["event_type", "hour"])
        .groupBy("event_type", F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(
            F.round(F.avg(F.col("value") - F.col("clim_value")), 6).alias("anomaly"),
            F.count("*").alias("n"),
        )
        .orderBy("event_type", "day")
    )


# --- q11: window top-k per group ------------------------------------------
@query(
    "q11_window_topk",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn
    FROM (
        SELECT c.c_custkey, o.o_orderkey, o.o_totalprice,
               row_number() OVER (PARTITION BY c.c_custkey
                                  ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn
        FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    )
    WHERE rn <= 3
    """,
    tags=("window", "join"),
)
def q11_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer via row_number; one shuffle on the partition
    key. At 100 TB you'd pre-aggregate or use a bounded heap per key
    (AQE handles the skewed-customer case by splitting partitions)."""
    from pyspark.sql import Window as W

    c = table(spark, sf_dir, "customer").select("c_custkey")
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
    w = W.partitionBy("c_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .select("c_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )


# --- q12: interval-arithmetic join (geospatial case 05 forecast-skill shape)
# Reference: e.time = f.time + f.prediction_timedelta (05_forecast_skill.py:158-171).
@query(
    "q12_interval_join",
    oracle="""
    SELECT strftime(o1.o_orderdate, '%Y-%m-%d') AS day,
           CAST(count(*) AS BIGINT)     AS n_pairs,
           round(avg(o2.o_totalprice - o1.o_totalprice), 6) AS drift
    FROM orders o1
    JOIN orders o2 ON o2.o_orderdate = o1.o_orderdate + INTERVAL 1 DAY
    GROUP BY strftime(o1.o_orderdate, '%Y-%m-%d')
    ORDER BY day
    """,
    tags=("join", "datetime", "geospatial-shape"),
)
def q12_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp+interval equi-join — forecast-skill's valid_time=init+lead
    re-expressed. Scale design: the naive row-level self-join (the oracle's
    form) multiplies out to n_day² pairs per day; since the pair statistics
    decompose algebraically (avg over the cross product of (p2-p1) is
    avg2-avg1; pair count is n1*n2), we pre-aggregate per day and join the
    tiny per-day aggregates on the interval-shifted key — identical results,
    O(days) join instead of O(rows²/days) — the plan that survives 100 TB."""
    o = table(spark, sf_dir, "orders")
    per_day = o.groupBy("o_orderdate").agg(
        F.count("*").alias("n"), F.avg("o_totalprice").alias("avg_price")
    )
    d1 = per_day.select(
        F.col("o_orderdate").alias("d1"), F.col("n").alias("n1"), F.col("avg_price").alias("a1")
    )
    d2 = per_day.select(
        F.col("o_orderdate").alias("d2"), F.col("n").alias("n2"), F.col("avg_price").alias("a2")
    )
    return (
        d1.join(d2, F.col("d2") == F.col("d1") + F.expr("INTERVAL 1 DAY"))
        .select(
            F.date_format("d1", "yyyy-MM-dd").alias("day"),
            (F.col("n1") * F.col("n2")).alias("n_pairs"),
            F.round(F.col("a2") - F.col("a1"), 6).alias("drift"),
        )
        .orderBy("day")
    )


# --- q13: range/theta join (geospatial case 06 zonal-stats shape) ----------
# Reference: BETWEEN join predicate raster×vector (06_zonal_vector.py:119-130).
@query(
    "q13_range_join",
    oracle="""
    WITH bands AS (
        SELECT r_regionkey AS band,
               CAST(r_regionkey * 10 AS DOUBLE) AS lo,
               CAST((r_regionkey + 1) * 10 AS DOUBLE) AS hi
        FROM region
    )
    SELECT b.band,
           CAST(count(*) AS BIGINT)       AS n_items,
           round(avg(l.l_extendedprice), 6) AS avg_price
    FROM lineitem l
    JOIN bands b ON l.l_quantity > b.lo AND l.l_quantity <= b.hi
    GROUP BY b.band
    ORDER BY b.band
    """,
    tags=("join", "range", "broadcast", "geospatial-shape"),
)
def q13_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zonal statistics: fact rows land in value bands via a BETWEEN-style
    predicate against a 5-row broadcast table (BroadcastNestedLoopJoin — the
    only sane physical plan for theta joins: tiny side broadcast, fact side
    streams with zero shuffle)."""
    li = table(spark, sf_dir, "lineitem")
    bands = (
        table(spark, sf_dir, "region")
        .select(
            F.col("r_regionkey").alias("band"),
            (F.col("r_regionkey") * 10).cast("double").alias("lo"),
            ((F.col("r_regionkey") + 1) * 10).cast("double").alias("hi"),
        )
    )
    return (
        li.join(
            F.broadcast(bands),
            (li.l_quantity > F.col("lo")) & (li.l_quantity <= F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
        )
        .orderBy("band")
    )


# --- q14: SQRT/POWER math (forecast-skill RMSE arithmetic) -----------------
# Reference: SQRT, POWER (05_forecast_skill.py:161-163).
@query(
    "q14_math_rmse",
    oracle="""
    SELECT l_returnflag,
           round(sqrt(avg(power(l_extendedprice * l_discount, 2))), 4) AS rms_discount_value,
           round(avg(sqrt(l_quantity)), 6) AS avg_sqrt_qty
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("agg", "math"),
)
def q14_math_rmse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar math stays JVM-side (whole-stage codegen) — no UDF needed."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.sqrt(F.avg(F.pow(F.col("l_extendedprice") * F.col("l_discount"), 2))), 4).alias(
                "rms_discount_value"
            ),
            F.round(F.avg(F.sqrt("l_quantity")), 6).alias("avg_sqrt_qty"),
        )
        .orderBy("l_returnflag")
    )


# --- q15: CASE + HAVING + UNION ALL ---------------------------------------
@query(
    "q15_case_having_union",
    oracle="""
    SELECT 'high' AS bucket, l_returnflag,
           CAST(count(*) AS BIGINT) AS n, round(avg(l_extendedprice), 6) AS avg_price
    FROM lineitem WHERE l_quantity > 25
    GROUP BY l_returnflag HAVING count(*) > 100
    UNION ALL
    SELECT CASE WHEN l_linestatus = 'O' THEN 'open' ELSE 'final' END AS bucket,
           l_returnflag,
           CAST(count(*) AS BIGINT) AS n, round(avg(l_extendedprice), 6) AS avg_price
    FROM lineitem WHERE l_quantity <= 25
    GROUP BY 1, 2
    ORDER BY bucket, l_returnflag
    """,
    tags=("union", "case", "having"),
)
def q15_case_having_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE-derived group keys, HAVING post-filter, UNION ALL of two branches."""
    li = table(spark, sf_dir, "lineitem")
    high = (
        li.filter(F.col("l_quantity") > 25)
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n"), F.round(F.avg("l_extendedprice"), 6).alias("avg_price"))
        .filter(F.col("n") > 100)
        .select(F.lit("high").alias("bucket"), "l_returnflag", "n", "avg_price")
    )
    low = (
        li.filter(F.col("l_quantity") <= 25)
        .groupBy(
            F.when(F.col("l_linestatus") == "O", "open").otherwise("final").alias("bucket"),
            "l_returnflag",
        )
        .agg(F.count("*").alias("n"), F.round(F.avg("l_extendedprice"), 6).alias("avg_price"))
    )
    return high.unionAll(low).orderBy("bucket", "l_returnflag")


# --- q16: DISTINCT + multi-key ORDER BY DESC -------------------------------
# Reference: DISTINCT (tests/test_sql.py:216), ORDER BY direction (211-230).
@query(
    "q16_distinct_sort",
    oracle="""
    SELECT DISTINCT c_mktsegment, c_nationkey
    FROM customer
    ORDER BY c_mktsegment DESC, c_nationkey
    """,
    tags=("distinct", "orderby"),
)
def q16_distinct_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return (
        c.select("c_mktsegment", "c_nationkey")
        .distinct()
        .orderBy(F.desc("c_mktsegment"), F.asc("c_nationkey"))
    )


# --- q17: scalar + IN subqueries ------------------------------------------
@query(
    "q17_subqueries",
    oracle="""
    SELECT p_brand,
           CAST(count(*) AS BIGINT) AS n_above,
           round(avg(p_retailprice), 6) AS avg_price
    FROM part
    WHERE p_retailprice > (SELECT avg(p_retailprice) FROM part)
      AND p_size IN (SELECT DISTINCT p_size FROM part WHERE p_size < 25)
    GROUP BY p_brand
    ORDER BY p_brand
    """,
    tags=("subquery", "agg"),
)
def q17_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery + IN-list subquery; Catalyst rewrites IN to a left-semi
    join and the scalar subquery to a broadcast single-row cross join."""
    p = table(spark, sf_dir, "part")
    p.createOrReplaceTempView("part")
    return spark.sql(
        """
        SELECT p_brand,
               CAST(count(*) AS BIGINT) AS n_above,
               round(avg(p_retailprice), 6) AS avg_price
        FROM part
        WHERE p_retailprice > (SELECT avg(p_retailprice) FROM part)
          AND p_size IN (SELECT DISTINCT p_size FROM part WHERE p_size < 25)
        GROUP BY p_brand
        ORDER BY p_brand
        """
    )


# --- q18: ROLLUP grouping sets --------------------------------------------
@query(
    "q18_rollup",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           CAST(count(*) AS BIGINT)      AS n,
           round(sum(l_quantity), 0)     AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY returnflag, linestatus
    """,
    tags=("rollup", "agg"),
)
def q18_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical totals in one pass (Expand operator feeds one hash-agg)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 0).alias("sum_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "sum_qty",
        )
        .orderBy("returnflag", "linestatus")
    )


# --- q19: COUNT(*) --------------------------------------------------------
# Reference: metadata-only COUNT(*) shortcut (src/lib.rs:607-614, test_stats.py:78-91).
@query(
    "q19_count_star",
    oracle="SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem",
    tags=("agg", "count"),
)
def q19_count_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet footer row counts answer this without reading data pages —
    Spark's LocalLimit/statistics path mirrors the reference's exact-stats
    COUNT(*) shortcut."""
    return table(spark, sf_dir, "lineitem").agg(F.count("*").alias("n"))


# --- q20: sparse-weight join + weighted aggregate (geospatial case 08) -----
# Reference: SUM(s.value*w.weight) GROUP BY dst (08_regrid_weights.py:195-203).
@query(
    "q20_weighted_regrid",
    oracle="""
    WITH weights AS (
        SELECT n_nationkey, n_regionkey,
               round(0.5 + (n_nationkey % 7) * 0.1, 1) AS w
        FROM nation
    )
    SELECT r.r_name,
           round(sum(s.s_acctbal * wt.w) / sum(wt.w), 6) AS weighted_acctbal,
           CAST(count(*) AS BIGINT) AS n_suppliers
    FROM supplier s
    JOIN weights wt ON s.s_nationkey = wt.n_nationkey
    JOIN region r   ON wt.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    ORDER BY r.r_name
    """,
    tags=("join", "agg", "broadcast", "geospatial-shape"),
)
def q20_weighted_regrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regridding's weight-table join: source values × precomputed weights,
    grouped by destination cell. Weight table broadcast; at ERA5 scale the
    weight table is ~4 rows per destination cell — still broadcastable or
    bucketed on the join key."""
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").select(
        "n_nationkey",
        "n_regionkey",
        F.round(0.5 + (F.col("n_nationkey") % 7) * 0.1, 1).alias("w"),
    )
    r = table(spark, sf_dir, "region")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.round(F.sum(F.col("s_acctbal") * F.col("w")) / F.sum("w"), 6).alias(
                "weighted_acctbal"
            ),
            F.count("*").alias("n_suppliers"),
        )
        .orderBy("r_name")
    )


# --- q21: scalar pandas UDF with struct return (geospatial cases 07/09) ----
# Reference: reproject(x,y) -> struct{lon,lat} UDF (07_reproject_udf.py:76-113),
# struct field access (07_reproject_udf.py:163-169).
@query(
    "q21_udf_reproject",
    oracle="""
    SELECT CAST(p_partkey AS BIGINT) AS p_partkey,
           round(-180.0 + 0.01 * (p_partkey % 36000), 6)  AS lon,
           round(-90.0 + 0.005 * (p_partkey % 36000), 6)  AS lat
    FROM part
    WHERE p_size <= 10
    """,
    tags=("udf", "struct", "geospatial-shape"),
)
def q21_udf_reproject(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coordinate reprojection as an Arrow-vectorized pandas UDF returning a
    struct{lon,lat}, fields then projected out — the affine stand-in for the
    reference's PROJ transform (the real CRS math drops into the same UDF
    shape). Unlike the reference, which must serialize UDF execution because
    PROJ is thread-unsafe, Spark runs one python worker per core."""
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    @F.pandas_udf(StructType([
        StructField("lon", DoubleType()),
        StructField("lat", DoubleType()),
    ]))
    def reproject(x: pd.Series) -> pd.DataFrame:
        m = x % 36000
        return pd.DataFrame({"lon": -180.0 + 0.01 * m, "lat": -90.0 + 0.005 * m})

    p = table(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    return p.select(
        "p_partkey", reproject(F.col("p_partkey").cast("double")).alias("pt")
    ).select(
        "p_partkey",
        F.round(F.col("pt").getField("lon"), 6).alias("lon"),
        F.round(F.col("pt").getField("lat"), 6).alias("lat"),
    )


# --- q22: parameterized query (reference 02_climatology.py:113) ------------
@query(
    "q22_parameterized",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           round(avg(o_totalprice), 6) AS avg_price
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("params", "agg"),
)
def q22_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-parameter SQL (Spark >= 3.4) — the reference's $start/$end
    parameterized climatology queries."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n,
               round(avg(o_totalprice), 6) AS avg_price
        FROM orders
        WHERE o_orderdate >= :start AND o_orderdate < :end
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """,
        args={
            "start": pd.Timestamp("1997-01-01"),
            "end": pd.Timestamp("1998-01-01"),
        },
    )


_Q23_SQL = """
WITH p_hist AS (             -- marginal histograms: two narrow 2-column scans whose
                             -- subtrees schedule concurrently (a shared-CTE form gets
                             -- inlined per consumer by Spark, costing a WIDER scan each)
  SELECT l_returnflag AS flag, floor(l_extendedprice * 0.01) AS bucket, count(*) AS c
  FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1, 2
),
d_hist AS (
  SELECT l_returnflag AS flag, l_discount AS bucket, count(*) AS c
  FROM lineitem WHERE l_discount IS NOT NULL GROUP BY 1, 2
),
p_spec AS (SELECT * FROM VALUES ('med', CAST(0.5 AS DOUBLE), 'lo'), ('med', CAST(0.5 AS DOUBLE), 'hi'),
                                ('p90', CAST(0.9 AS DOUBLE), 'lo'), ('p90', CAST(0.9 AS DOUBLE), 'hi')
           AS s(qname, q, bound)),
d_spec AS (SELECT * FROM VALUES ('p25', CAST(0.25 AS DOUBLE), 'lo'), ('p25', CAST(0.25 AS DOUBLE), 'hi')
           AS s(qname, q, bound)),
p_cum AS (
  SELECT flag, bucket, c,
         sum(c) OVER (PARTITION BY flag ORDER BY bucket
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c AS cum_before,
         sum(c) OVER (PARTITION BY flag) AS n
  FROM p_hist
),
d_cum AS (
  SELECT flag, bucket, c,
         sum(c) OVER (PARTITION BY flag ORDER BY bucket
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c AS cum_before,
         sum(c) OVER (PARTITION BY flag) AS n
  FROM d_hist
),
-- which bucket holds rank k = floor/ceil((n-1)*q)+1, and the offset inside it
p_tgt AS (
  SELECT flag, qname, bound, bucket, k - cum_before AS local_k, frac FROM (
    SELECT h.flag, s.qname, s.bound, h.bucket, h.cum_before, h.c,
           CASE WHEN s.bound = 'lo' THEN floor((h.n - 1) * s.q) + 1
                ELSE ceil((h.n - 1) * s.q) + 1 END AS k,
           (h.n - 1) * s.q - floor((h.n - 1) * s.q) AS frac
    FROM p_cum h CROSS JOIN p_spec s)
  WHERE cum_before < k AND k <= cum_before + c
),
d_tgt AS (
  SELECT flag, qname, bound, bucket, frac FROM (
    SELECT h.flag, s.qname, s.bound, h.bucket, h.cum_before, h.c,
           CASE WHEN s.bound = 'lo' THEN floor((h.n - 1) * s.q) + 1
                ELSE ceil((h.n - 1) * s.q) + 1 END AS k,
           (h.n - 1) * s.q - floor((h.n - 1) * s.q) AS frac
    FROM d_cum h CROSS JOIN d_spec s)
  WHERE cum_before < k AND k <= cum_before + c
),
-- second fact scan: only straddling-bucket rows survive the broadcast join
p_pick AS (
  SELECT /*+ BROADCAST(t) */ p.flag, t.qname, t.bound, p.v, t.frac, t.local_k,
         row_number() OVER (PARTITION BY p.flag, t.qname, t.bound ORDER BY p.v) AS rn
  FROM (SELECT l_returnflag AS flag, l_extendedprice AS v,
               floor(l_extendedprice * 0.01) AS bucket
        FROM lineitem WHERE l_extendedprice IS NOT NULL) p
  JOIN p_tgt t ON p.flag = t.flag AND p.bucket = t.bucket
),
p_vals AS (
  SELECT flag,
         max(CASE WHEN qname = 'med' AND bound = 'lo' THEN v END) AS v_m_lo,
         max(CASE WHEN qname = 'med' AND bound = 'hi' THEN v END) AS v_m_hi,
         max(CASE WHEN qname = 'p90' AND bound = 'lo' THEN v END) AS v_p_lo,
         max(CASE WHEN qname = 'p90' AND bound = 'hi' THEN v END) AS v_p_hi,
         max(CASE WHEN qname = 'med' THEN frac END) AS m_fr,
         max(CASE WHEN qname = 'p90' THEN frac END) AS p_fr
  FROM p_pick WHERE rn = local_k GROUP BY flag
),
-- discount histogram is exact (bucket == value): no second pass
d_vals AS (
  SELECT flag,
         max(CASE WHEN bound = 'lo' THEN bucket END) AS v_d_lo,
         max(CASE WHEN bound = 'hi' THEN bucket END) AS v_d_hi,
         max(frac) AS d_fr
  FROM d_tgt GROUP BY flag
)
SELECT p.flag AS l_returnflag,
       round(v_m_lo + m_fr * (v_m_hi - v_m_lo), 6) AS median_price,
       round(v_p_lo + p_fr * (v_p_hi - v_p_lo), 6) AS p90_price,
       round(v_d_lo + d_fr * (v_d_hi - v_d_lo), 6) AS p25_discount
FROM p_vals p JOIN d_vals d ON p.flag = d.flag
"""


@query(
    "q23_percentiles",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 6) AS median_price,
           round(quantile_cont(l_extendedprice, 0.9), 6) AS p90_price,
           round(quantile_cont(l_discount, 0.25), 6) AS p25_discount
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("agg", "percentile"),
)
def q23_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (== DuckDB ``quantile_cont``) via
    fully-declarative distributed histogram selection — the two-pass
    rank-selection algorithm MPP engines use, with no driver collect and no
    per-group value buffering.

    Two rejected shapes: Spark's ``percentile`` aggregate buffers every
    value of a group (ObjectHashAggregate, unbounded per-group state —
    round-2 perf-weak), and a global ``row_number() OVER (PARTITION BY
    group)`` window serializes each group onto one sort task (a petabyte
    group at 100 TB would sort on one task). Here parallelism is
    independent of group cardinality:

    - **Pass 1** builds per-measure marginal histograms with map-side
      combine (output bounded by bucket count), as two independent
      2-column scans whose subtrees schedule concurrently. (A shared
      joint-histogram CTE was tried and rejected: Spark inlines a CTE
      into each consumer, so it re-scanned anyway — wider.)
    - A cumulative window + literal quantile spec resolve each target
      rank k = floor/ceil((n-1)*q) + 1 to (straddling bucket, in-bucket
      offset) — all histogram-sized work.
    - **Pass 2** re-scans the fact and broadcast-joins the resolved
      price targets, so only straddling-bucket rows (~1/1000th) survive;
      a ``row_number`` over bucket-sized partitions picks the offset-th
      value. The discount histogram is exact (bucket == value, 11
      distinct), so its quantile comes straight from the rank walk.

    Interpolation ``v[lo] + frac * (v[hi] - v[lo])`` is DuckDB's algebraic
    form, so rounded values hash-match. The whole thing is ONE ``spark.sql``
    statement: a single parse/analyze round trip instead of hundreds of
    driver DSL calls (the DSL build alone cost ~0.9 s of the round-2
    bench time). ``approx_percentile`` (t-digest, one pass, mergeable)
    remains the documented sketch alternative when a second scan is
    unaffordable."""
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return (
        spark.sql(_Q23_SQL)
        .coalesce(1)
        .sortWithinPartitions("l_returnflag")
    )


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@query(
    "q24_pivot",
    oracle=f"""
    SELECT CAST(user_id % 10 AS BIGINT) AS user_bucket,
           {", ".join(
               f"CAST(sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{t}"
               for t in _EVENT_TYPES
           )}
    FROM events
    GROUP BY user_id % 10
    ORDER BY user_bucket
    """,
    tags=("pivot", "reshape"),
)
def q24_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT (long->wide reshape): event-type counts per user bucket. The
    value list is supplied explicitly, so Spark skips the extra distinct-
    values job and the plan is a single partial+final aggregation."""
    e = table(spark, sf_dir, "events")
    out = (
        e.groupBy((F.col("user_id") % 10).alias("user_bucket"))
        .pivot("event_type", list(_EVENT_TYPES))
        .count()
    )
    return out.select(
        "user_bucket",
        *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in _EVENT_TYPES],
    ).orderBy("user_bucket")


@query(
    "q25_set_ops",
    oracle="""
    SELECT 'both_years' AS segment, CAST(c AS BIGINT) AS custkey FROM (
        SELECT o_custkey AS c FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        INTERSECT
        SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
    )
    UNION ALL
    SELECT 'only_1996' AS segment, CAST(c AS BIGINT) AS custkey FROM (
        SELECT o_custkey AS c FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        EXCEPT
        SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
    )
    """,
    tags=("setops",),
)
def q25_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT customer segmentation across order years. Both
    set ops hash-aggregate on the key after pushing the year filters into
    the scans; UNION ALL is a no-shuffle concatenation of the two plans."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT 'both_years' AS segment, c AS custkey FROM (
            SELECT o_custkey AS c FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
            INTERSECT
            SELECT o_custkey FROM orders
            WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        )
        UNION ALL
        SELECT 'only_1996' AS segment, c AS custkey FROM (
            SELECT o_custkey AS c FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
            EXCEPT
            SELECT o_custkey FROM orders
            WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        )
        """
    )


@query(
    "q26_anti_join",
    oracle="""
    SELECT CAST(c.c_custkey AS BIGINT) AS c_custkey, c.c_name
    FROM customer c
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '1997-06-01'
    )
    """,
    tags=("join", "anti"),
)
def q26_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS anti-join: customers with no recent orders. Catalyst
    plans a broadcast/shuffled hash anti-join — one pass over orders, no
    correlated re-execution; completes the semi/anti join pair with q04."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "1997-06-01"
    )
    return c.join(
        o, c.c_custkey == o.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


# --- q27: as-of join (time-series point-in-time lookup) --------------------
# Beyond-reference custom operator (SURVEY.md §7 milestone 5): Spark has no
# ASOF JOIN; composed here from a union + ordered window (last_value with
# ignoreNulls), which is one shuffle on (user_id) and scales linearly —
# the per-key sort is bounded by events-per-user, never a cross product.
@query(
    "q27_asof_join",
    oracle="""
    WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
                      event_type
               FROM events),
    p AS (SELECT event_id, user_id, ts FROM e WHERE event_type = 'purchase'),
    c AS (SELECT user_id, ts FROM e WHERE event_type = 'click')
    SELECT CAST(p.event_id AS BIGINT) AS purchase_id,
           CAST(p.user_id AS BIGINT) AS user_id,
           CAST(epoch_us(p.ts) AS BIGINT) AS purchase_us,
           CAST(epoch_us(c.ts) AS BIGINT) AS last_click_us,
           CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) AS gap_us
    FROM p ASOF LEFT JOIN c
      ON p.user_id = c.user_id AND c.ts <= p.ts
    """,
    tags=("join", "asof", "datetime", "beyond-reference"),
)
def q27_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every purchase, the user's most recent click at or
    before the purchase time (point-in-time-correct feature lookup — the
    trades-vs-quotes staple).

    Implementation: union both sides tagged by kind, sort per user by
    (ts, kind) with clicks first so a same-microsecond click is visible to
    the purchase, then carry the running ``last_value(click_ts,
    ignoreNulls)`` forward and keep only purchase rows. One shuffle on
    user_id; no range join, no per-row subquery — the 100 TB plan.
    DuckDB's native ASOF LEFT JOIN is the oracle (both engines compare
    µs-truncated timestamps so the ns feed can't straddle the boundary).
    """
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("ets"),
        F.lit(1).alias("kind"),
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.lit(None).cast("long").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("ets"),
        F.lit(0).alias("kind"),
    )
    u = p.unionByName(c).withColumn(
        "click_ts", F.when(F.col("kind") == 0, F.col("ets"))
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ets", "kind")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        u.withColumn("last_click", F.last("click_ts", ignorenulls=True).over(w))
        .filter(F.col("kind") == 1)
        .select(
            "purchase_id",
            "user_id",
            F.unix_micros("ets").alias("purchase_us"),
            F.unix_micros("last_click").alias("last_click_us"),
            (F.unix_micros("ets") - F.unix_micros("last_click")).alias("gap_us"),
        )
    )


# --- q28: GROUPING SETS / multi-level aggregate ----------------------------
# DataFusion claims grouping sets; the reference never exercises them
# (SURVEY.md §2B tail) — free Spark parity, pinned here for the oracle gate.
@query(
    "q28_grouping_sets",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS flag,
           coalesce(l_linestatus, 'ALL') AS status,
           CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
           CAST(count(*) AS BIGINT) AS n_rows,
           round(sum(l_extendedprice), 0) AS revenue
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
    tags=("aggregate", "grouping-sets"),
)
def q28_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three aggregation levels in one pass (detail, per-flag, grand total).
    Catalyst expands grouping sets map-side and shares the single shuffle —
    at 100 TB this halves the cost versus three separate scans+aggs. The
    grouping_id bitmask disambiguates real NULL keys from rollup rows."""
    li = table(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus", "l_extendedprice")
    li.createOrReplaceTempView("q28_lineitem")
    return spark.sql(
        """
        SELECT coalesce(l_returnflag, 'ALL') AS flag,
               coalesce(l_linestatus, 'ALL') AS status,
               CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
               CAST(count(*) AS BIGINT) AS n_rows,
               round(sum(l_extendedprice), 0) AS revenue
        FROM q28_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


# --- q29: window-function breadth (lead/lag/ntile/percent_rank/first/last) --
# DataFusion claims window functions; the reference never exercises them
# (SURVEY.md §2B tail). Full Spark parity, pinned under the oracle gate.
@query(
    "q29_window_suite",
    oracle="""
    SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
           CAST(o_custkey AS BIGINT) AS o_custkey,
           round(o_totalprice, 2) AS price,
           round(lag(o_totalprice) OVER w, 2) AS prev_price,
           round(lead(o_totalprice) OVER w, 2) AS next_price,
           CAST(ntile(4) OVER w AS INT) AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume,
           round(first_value(o_totalprice) OVER w, 2) AS first_price,
           round(last_value(o_totalprice) OVER
               (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2)
               AS last_price
    FROM orders
    WHERE o_custkey < 200
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
    tags=("window",),
)
def q29_window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full analytic-window surface in one pass: ranking (ntile,
    percent_rank, cume_dist), offsets (lag/lead), and frame-bounded
    first/last_value, all sharing ONE shuffle on the partition key — the
    WINDOW clause reuse is literal in the plan (a single Window operator
    chain, no re-sort per function). Unique (price, orderkey) ordering keeps
    every engine's frame identical."""
    from pyspark.sql import Window as W

    o = table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    w = W.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round("o_totalprice", 2).alias("price"),
        F.round(F.lag("o_totalprice").over(w), 2).alias("prev_price"),
        F.round(F.lead("o_totalprice").over(w), 2).alias("next_price"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.round(F.first("o_totalprice").over(w), 2).alias("first_price"),
        F.round(F.last("o_totalprice").over(wfull), 2).alias("last_price"),
    )


# --- q30: string-function surface ------------------------------------------
@query(
    "q30_string_funcs",
    oracle="""
    SELECT CAST(p_partkey AS BIGINT) AS p_partkey,
           upper(p_name) AS name_upper,
           lower(p_brand) AS brand_lower,
           CAST(strlen(p_name) AS INT) AS name_len,
           substring(p_name, 1, 8) AS name_prefix,
           replace(p_type, ' ', '_') AS type_snake,
           regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           reverse(p_brand) AS brand_rev,
           concat_ws('|', p_brand, p_type) AS brand_type,
           CAST(len(string_split(p_name, ' ')) AS INT) AS name_words,
           CASE WHEN p_name LIKE '%green%' THEN 1 ELSE 0 END AS has_green
    FROM part
    WHERE p_partkey <= 500
    """,
    tags=("strings", "projection"),
)
def q30_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string surface in one projection — all JVM-side codegen'd
    expressions (upper/lower/length/substring/replace/regexp_extract/lpad/
    reverse/concat_ws/split/LIKE), zero Python. At 100 TB this is the
    no-shuffle text-normalization stage; every function here stays inside
    WholeStageCodegen."""
    p = table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 500)
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.length("p_name").cast("int").alias("name_len"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.reverse("p_brand").alias("brand_rev"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.size(F.split("p_name", " ")).cast("int").alias("name_words"),
        F.when(F.col("p_name").like("%green%"), 1).otherwise(0).alias("has_green"),
    )


# --- q31: null-handling operator surface ------------------------------------
@query(
    "q31_null_ops",
    oracle="""
    WITH c AS (
        SELECT c_custkey,
               nullif(c_acctbal, 0.0) AS bal_nz,
               CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal_pos
        FROM customer
    )
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(bal_pos) AS BIGINT) AS n_pos,
           CAST(sum(CASE WHEN bal_pos IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_neg_nulled,
           round(sum(coalesce(bal_pos, 0.0)), 2) AS sum_pos,
           round(avg(bal_pos), 6) AS avg_pos_skipna,
           CAST(sum(CASE WHEN bal_nz IS NOT DISTINCT FROM bal_pos
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_nullsafe_eq
    FROM c
    """,
    tags=("null-semantics",),
)
def q31_null_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL operator surface: nullif, coalesce, CASE-to-NULL, aggregate
    null-skipping, and null-safe equality (Spark's <=> ≡ SQL IS NOT
    DISTINCT FROM) — the semantics every downstream mean/count depends on
    (companion to gq04's NaN→null ingest rule)."""
    c = table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.nullif(F.col("c_acctbal"), F.lit(0.0)).alias("bal_nz"),
        F.when(F.col("c_acctbal") < 0, None)
        .otherwise(F.col("c_acctbal"))
        .alias("bal_pos"),
    )
    return c.agg(
        F.count("*").alias("n_rows"),
        F.count("bal_pos").alias("n_pos"),
        F.sum(F.when(F.col("bal_pos").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_neg_nulled"),
        F.round(F.sum(F.coalesce("bal_pos", F.lit(0.0))), 2).alias("sum_pos"),
        F.round(F.avg("bal_pos"), 6).alias("avg_pos_skipna"),
        F.sum(F.when(F.col("bal_nz").eqNullSafe(F.col("bal_pos")), 1).otherwise(0))
        .cast("bigint")
        .alias("n_nullsafe_eq"),
    )


# --- q32: JSON extraction surface ------------------------------------------
@query(
    "q32_json_extract",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(avg(CAST(props->>'k' AS INT)), 6) AS avg_k,
           CAST(max(CAST(props->>'k' AS INT)) AS INT) AS max_k,
           CAST(sum(CASE WHEN CAST(props->>'k' AS INT) > 50 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_big
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("json", "semi-structured"),
)
def q32_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured payloads: extract a JSON field from the props column
    JVM-side (get_json_object — codegen'd, no Python) and aggregate on it.
    At 100 TB the extraction is scan-local; only the tiny per-type aggregate
    shuffles. A hot field would be promoted to a typed column at ingest —
    this query is the probe path that decides that."""
    e = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.max("k").alias("max_k"),
            F.sum(F.when(F.col("k") > 50, 1).otherwise(0)).cast("bigint").alias("n_big"),
        )
        .orderBy("event_type")
    )


# --- q33: higher-order array-function surface ------------------------------
@query(
    "q33_array_funcs",
    oracle="""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
               FROM embeddings WHERE vec_id < 100)
    SELECT CAST(vec_id AS BIGINT) AS vec_id,
           CAST(len(emb) AS INT) AS dim,
           round(list_aggregate(emb, 'max'), 6) AS max_v,
           CAST(len(list_filter(emb, x -> x > 0)) AS INT) AS n_pos,
           round(list_aggregate(list_sort(emb)[1:3], 'sum'), 6) AS sum_min3,
           CAST(CASE WHEN len(list_filter(emb, x -> abs(x) > 3)) > 0
                THEN 1 ELSE 0 END AS INT) AS has_extreme
    FROM v
    """,
    tags=("arrays", "higher-order"),
)
def q33_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions, all JVM-side: transform-free max via
    array_max, lambda filter, sort+slice+aggregate, existence predicate.
    These are the primitives the similarity/dedup operators compose; at
    100 TB they run inside WholeStageCodegen on the scan with zero Python
    and zero shuffle. The sorted-slice sum fixes the addition order, so both
    engines round identically."""
    e = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    emb = F.col("embedding").cast("array<double>")
    sum3 = F.aggregate(
        F.slice(F.array_sort(emb), 1, 3), F.lit(0.0), lambda a, x: a + x
    )
    return e.select(
        "vec_id",
        F.size(emb).alias("dim"),
        F.round(F.array_max(emb), 6).alias("max_v"),
        F.size(F.filter(emb, lambda x: x > 0)).alias("n_pos"),
        F.round(sum3, 6).alias("sum_min3"),
        F.exists(emb, lambda x: F.abs(x) > 3).cast("int").alias("has_extreme"),
    )


# --- q34: correlated scalar subquery (Catalyst decorrelation) ---------------
@query(
    "q34_correlated_subquery",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_above_avg,
           round(avg(o_totalprice), 6) AS avg_above
    FROM orders o
    WHERE o_totalprice > (
        SELECT 1.5 * avg(o2.o_totalprice) FROM orders o2
        WHERE o2.o_custkey = o.o_custkey
    )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("subquery", "correlated", "optimizer"),
)
def q34_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — orders 50% above their customer's own
    average. Written as literal correlated SQL so Catalyst's decorrelation
    rewrites it into aggregate + join (never per-row re-execution): the plan
    is one per-customer aggregate and one equi-join, both sharing the
    o_custkey shuffle — the only shape that survives 100 TB."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("q34_orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_above_avg,
               round(avg(o_totalprice), 6) AS avg_above
        FROM q34_orders o
        WHERE o_totalprice > (
            SELECT 1.5 * avg(o2.o_totalprice) FROM q34_orders o2
            WHERE o2.o_custkey = o.o_custkey
        )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


# --- q35: UNPIVOT / stack (wide metrics -> long) ----------------------------
@query(
    "q35_unpivot",
    oracle="""
    WITH wide AS (
        SELECT l_returnflag,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_discount), 2) AS sum_disc,
               round(sum(l_tax), 2) AS sum_tax
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, metric, value
    FROM wide
    UNPIVOT (value FOR metric IN (sum_qty, sum_disc, sum_tax))
    """,
    tags=("unpivot", "reshape"),
)
def q35_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT: the wide-to-long reshape dual of q24's pivot, via stack() —
    a zero-shuffle projection that triples rows. The long form is what the
    reverse pivot's scatter consumes; bounded-magnitude sums rounded on the
    wide side so both engines unpivot identical values."""
    li = table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_discount"), 2).alias("sum_disc"),
        F.round(F.sum("l_tax"), 2).alias("sum_tax"),
    )
    return wide.select(
        "l_returnflag",
        F.expr(
            "stack(3, 'sum_qty', sum_qty, 'sum_disc', sum_disc, 'sum_tax', sum_tax)"
        ).alias("metric", "value"),
    )


# --- q36: event-time RANGE window frame ------------------------------------
@query(
    "q36_interval_range_frame",
    oracle="""
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(epoch_us(ts) AS BIGINT) AS t_us,
           CAST(count(*) OVER w AS BIGINT) AS n_7d,
           round(sum(value) OVER w, 6) AS sum_7d
    FROM events WHERE event_type = 'purchase'
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "range-frame", "datetime", "beyond-reference"),
)
def q36_interval_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time RANGE frame: every purchase annotated with the user's
    trailing-7-day purchase count and spend — the sliding-window feature
    the ROWS-frame suite (q29) can't express, because the frame boundary
    is a time interval over an uneven event sequence, not a row offset.
    One shuffle on user_id; the frame is evaluated in a single sort pass
    per partition (no self-join, no explode of candidate windows — the
    naive equivalent is an O(events x window) range join). Peers with
    identical timestamps enter the frame together in both engines, so the
    result is deterministic without a tiebreak."""
    e = table(spark, sf_dir, "events")
    e.createOrReplaceTempView("q36_events")
    return spark.sql(
        """
        SELECT user_id, unix_micros(ts) AS t_us,
               COUNT(*) OVER w AS n_7d,
               ROUND(SUM(value) OVER w, 6) AS sum_7d
        FROM q36_events WHERE event_type = 'purchase'
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)
        """
    )
