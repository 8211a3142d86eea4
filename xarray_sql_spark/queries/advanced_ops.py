"""Round-5 additions: cohort retention, LATERAL top-n, semantic dedup,
int8 scalar-quantized similarity scoring.

Same conventions as :mod:`pipeline_ops`: Spark implementations stay
JVM-side, every pairwise operation is bucketed (cluster id here plays the
LSH-bucket role), and the DuckDB oracle re-expresses the identical
deterministic math so the driver can hash-compare values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from xarray_sql_spark.queries.registry import query
from xarray_sql_spark.session import table


# --- ev08: weekly cohort retention matrix -----------------------------------
@query(
    "ev08_cohort_retention",
    oracle="""
    WITH f AS (
        SELECT user_id, ts, min(ts) OVER (PARTITION BY user_id) AS first_ts
        FROM events
    )
    SELECT strftime(date_trunc('week', first_ts), '%Y-%m-%d') AS cohort_week,
           CAST(date_diff('day', date_trunc('week', first_ts),
                          date_trunc('week', ts)) // 7 AS INT) AS week_offset,
           CAST(count(DISTINCT user_id) AS BIGINT) AS active_users
    FROM f
    GROUP BY cohort_week, week_offset
    ORDER BY cohort_week, week_offset
    """,
    tags=("events", "window", "cohort", "pipeline"),
)
def ev08_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: cohort = ISO week of each user's first
    event; one cell per (cohort_week, week_offset) counting distinct active
    users. The classic growth-analytics matrix.

    Scale: one shuffle on user_id for the per-user first-event window, then
    a partial-aggregated count-distinct on the tiny (cohort, offset) key
    space — no join back to the fact table."""
    e = table(spark, sf_dir, "events")
    first_ts = F.min("ts").over(W.partitionBy("user_id"))
    cohort = F.date_trunc("week", first_ts)
    week = F.date_trunc("week", F.col("ts"))
    offset = F.floor(F.datediff(week.cast("date"), cohort.cast("date")) / 7).cast("int")
    return (
        e.select(
            F.date_format(cohort, "yyyy-MM-dd").alias("cohort_week"),
            offset.alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("active_users"))
        .orderBy("cohort_week", "week_offset")
    )


# --- q37: correlated LATERAL top-n per group --------------------------------
# comma-LATERAL: the one lateral spelling both Spark (3.2+) and DuckDB parse
_Q37_SQL = """
    SELECT n.n_name, t.c_name, t.c_acctbal
    FROM {nation} n, LATERAL (
        SELECT c_name, c_acctbal, c_custkey
        FROM {customer}
        WHERE c_nationkey = n.n_nationkey
        ORDER BY c_acctbal DESC, c_custkey
        LIMIT 3
    ) t
    ORDER BY n.n_name, t.c_acctbal DESC, t.c_custkey
"""


@query(
    "q37_lateral_topn",
    oracle=_Q37_SQL.format(nation="nation", customer="customer"),
    tags=("relational", "lateral", "subquery"),
)
def q37_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated derived table: top-3 customers by balance per
    nation, written as a lateral subquery with ORDER BY ... LIMIT — the
    SQL:2016 surface DataFusion exposes via LATERAL and Spark supports
    since 3.2. Catalyst decorrelates the per-row subquery into a join +
    window rather than a nested loop (checked in tests/test_plans.py)."""
    table(spark, sf_dir, "nation").createOrReplaceTempView("q37_nation")
    table(spark, sf_dir, "customer").createOrReplaceTempView("q37_customer")
    return spark.sql(_Q37_SQL.format(nation="q37_nation", customer="q37_customer"))


# --- dd07: semantic (embedding-cluster) dedup -------------------------------
@query(
    "dd07_semantic_dedup",
    oracle="""
    WITH d AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), seeds AS (
        SELECT vec_id AS seed_id, v AS sv FROM d WHERE vec_id < 16
    ), assigned AS (
        SELECT d.vec_id, d.v, s.seed_id,
               row_number() OVER (
                   PARTITION BY d.vec_id
                   ORDER BY list_distance(d.v, s.sv), s.seed_id
               ) AS rn
        FROM d CROSS JOIN seeds s
    ), clustered AS (
        SELECT vec_id, v, seed_id FROM assigned WHERE rn = 1
    )
    SELECT CAST(a.seed_id AS BIGINT) AS cluster,
           CAST(a.vec_id AS BIGINT) AS vec_a,
           CAST(b.vec_id AS BIGINT) AS vec_b,
           round(list_cosine_similarity(a.v, b.v), 6) AS cosine
    FROM clustered a
    JOIN clustered b ON a.seed_id = b.seed_id AND a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.v, b.v) >= 0.4
    """,
    tags=("dedup", "similarity", "pipeline"),
)
def dd07_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup (SemDeDup-style): assign every embedding to its
    nearest of k=16 fixed seed centroids (deterministic: the first 16
    vectors), then run the pairwise cosine check WITHIN clusters only —
    vectorized per cluster.

    Scale: the centroid table broadcasts (k rows), assignment is a
    narrow map over the corpus, and candidate generation is grouped on
    the cluster id — the same sublinear shape as the LSH dedups. The
    within-cluster check is an Arrow-batched ``applyInPandas`` doing ONE
    numpy gram-matrix per cluster instead of |pairs| x dim interpreted
    lambda evaluations; per-task memory is O(cluster_size x dim), which
    stays bounded because k scales with the corpus (constant target
    cluster size). np.einsum with optimize=False sums sequentially like
    the oracle's list_cosine_similarity, keeping the 6-dp rounding
    deterministic cross-engine."""
    import numpy as np
    import pandas as pd

    e = table(spark, sf_dir, "embeddings", spread=True)
    vec = F.col("embedding").cast("array<double>")
    base = e.select("vec_id", vec.alias("v"))
    seeds = base.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("seed_id"), F.col("v").alias("sv")
    )
    d2 = F.aggregate(
        F.zip_with(F.col("v"), F.col("sv"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    assigned = base.join(F.broadcast(seeds)).select("vec_id", "v", "seed_id", d2.alias("d2"))
    # Rank by sqrt(d2), not d2: the oracle's list_distance IS
    # sqrt(sum-of-squares), and sqrt can collapse adjacent doubles —
    # ranking the identical IEEE value on both sides means any such
    # collapse falls through to the seed_id tie-break identically.
    rn = F.row_number().over(W.partitionBy("vec_id").orderBy(F.sqrt("d2"), "seed_id"))
    clustered = (
        assigned.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select("vec_id", "v", F.col("seed_id").alias("cluster"))
    )

    def _pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        X = np.stack(pdf["v"].to_numpy())  # (n, dim) float64
        # sequential-sum dots (optimize=False): same accumulation order as
        # the oracle's list arithmetic -> identical doubles
        norms = np.sqrt(np.einsum("ij,ij->i", X, X, optimize=False))
        gram = np.einsum("ij,kj->ik", X, X, optimize=False)
        cos = gram / np.outer(norms, norms)
        ia, ib = np.triu_indices(len(pdf), k=1)
        keep = cos[ia, ib] >= 0.4
        ia, ib = ia[keep], ib[keep]
        return pd.DataFrame(
            {
                "cluster": np.full(len(ia), pdf["cluster"].iloc[0], dtype=np.int64),
                "vec_a": pdf["vec_id"].to_numpy()[ia],
                "vec_b": pdf["vec_id"].to_numpy()[ib],
                "cosine": np.round(cos[ia, ib], 6),
            }
        )

    return (
        clustered.groupBy("cluster")
        .applyInPandas(_pairs, "cluster long, vec_a long, vec_b long, cosine double")
        .orderBy("cluster", "vec_a", "vec_b")
    )


# --- ss06: int8 scalar-quantized similarity scoring -------------------------
@query(
    "ss06_sq_topk",
    oracle="""
    WITH d AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), m AS (
        SELECT vec_id, v,
               greatest(list_max(list_transform(v, x -> abs(x))), 1e-30) AS maxabs
        FROM d
    ), quant AS (
        SELECT vec_id, maxabs / 127.0 AS scale,
               list_transform(v, x -> CAST(floor(x * 127.0 / maxabs) AS BIGINT)) AS qv
        FROM m
    ), scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               q.scale * c.scale * list_inner_product(q.qv, c.qv) AS s
        FROM (SELECT * FROM quant WHERE vec_id < 5) q
        JOIN quant c ON c.vec_id <> q.vec_id
    )
    SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(neighbor_id AS BIGINT) AS neighbor_id,
           round(s, 6) AS approx_dot
    FROM (
        SELECT query_id, neighbor_id, s,
               row_number() OVER (
                   PARTITION BY query_id ORDER BY s DESC, neighbor_id
               ) AS rk
        FROM scored
    )
    WHERE rk <= 5
    ORDER BY query_id, approx_dot DESC, neighbor_id
    """,
    tags=("similarity", "quantization", "pipeline"),
)
def ss06_sq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar-quantized similarity: per-vector symmetric quantization
    (scale = max|x|/127, q = floor(x/scale)), approximate dot product =
    scale_q * scale_c * <q_q, q_c> over int64-exact integer dots; top-5
    per query vector.

    Scale: this is the compressed-domain scoring path — 4x less memory
    bandwidth than float32 and integer SIMD dots; the corpus side stays
    partitioned, the 5-query side broadcasts, and only (query x k) rows
    shuffle for the final rank. The integer dot is exact in both engines,
    so ranking (and the driver hash) is deterministic cross-engine."""
    e = table(spark, sf_dir, "embeddings", spread=True)
    vec = F.col("embedding").cast("array<double>")
    m = e.select(
        "vec_id",
        vec.alias("v"),
        F.greatest(F.array_max(F.transform(vec, lambda x: F.abs(x))), F.lit(1e-30)).alias(
            "maxabs"
        ),
    )
    quant = m.select(
        "vec_id",
        (F.col("maxabs") / F.lit(127.0)).alias("scale"),
        F.expr("transform(v, x -> CAST(floor(x * 127.0 / maxabs) AS BIGINT))").alias("qv"),
    )
    q = quant.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("scale").alias("qscale"),
        F.col("qv").alias("qqv"),
    )
    idot = F.aggregate(
        F.zip_with(F.col("qqv"), F.col("qv"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    scored = (
        quant.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (F.col("qscale") * F.col("scale") * idot.cast("double")).alias("s"),
        )
    )
    rk = F.row_number().over(W.partitionBy("query_id").orderBy(F.desc("s"), F.asc("neighbor_id")))
    return (
        scored.withColumn("rk", rk)
        .filter(F.col("rk") <= 5)
        .select("query_id", "neighbor_id", F.round("s", 6).alias("approx_dot"))
        .orderBy("query_id", F.desc("approx_dot"), "neighbor_id")
    )
