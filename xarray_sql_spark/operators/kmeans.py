"""Distributed k-means (Lloyd's) with driver-controlled convergence.

The registry's ``ss05_kmeans_train`` is the fixed-iteration flavor fused
into one lazy plan (hash-checked against a DuckDB oracle that unrolls both
iterations). This operator is the production flavor: iterate until the
centroid shift drops under ``tol`` or ``max_iter`` is hit, with the loop on
the driver — the same control pattern as the connected-components fixpoint
(``operators/components.py``).

Scale shape per iteration (unchanged at 100 TB):
- assignment: broadcast the k x dim centroid matrix, argmin over a
  per-vector window — the data never shuffles for assignment;
- update: one shuffle keyed by (cell, dim) with map-side partial
  aggregation; the k x dim result collects to the driver (model state).

Determinism: distances fold sequentially over the vector; ties break by
cell id; centroid averages round to ``round_decimals`` so the trajectory
is reproducible across partitionings (summation-order noise is ~1e-14,
eleven orders under the rounding boundary).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def kmeans_fit(
    vectors: DataFrame,
    k: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "emb",
    max_iter: int = 20,
    tol: float = 1e-4,
    round_decimals: int = 6,
) -> tuple[np.ndarray, int]:
    """Fit k centroids over ``vectors`` (id_col, vec_col: array<double>).

    Returns (centroids [k x dim float64], n_iterations_run). Seeds with the
    k lowest-id vectors (deterministic; swap for k-means|| sampling on a
    real corpus). Empty cells keep their previous centroid.
    """
    v = vectors.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_emb"))
    seed_rows = v.orderBy("_id").limit(k).collect()
    if len(seed_rows) < k:
        raise ValueError(f"k={k} but only {len(seed_rows)} vectors")
    cent = np.array([list(r["_emb"]) for r in seed_rows], dtype=np.float64)
    n_dim = cent.shape[1]

    dist = F.sqrt(
        F.aggregate(
            F.zip_with("_emb", "_cemb", lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda a, x: a + x,
        )
    )
    wv = W.partitionBy("_id").orderBy("d", "_cell")

    it = 0
    for it in range(1, max_iter + 1):
        cdf = vectors.sparkSession.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(cent)],
            "_cell int, _cemb array<double>",
        )
        assign = (
            v.join(F.broadcast(cdf))
            .select("_id", "_cell", "_emb", dist.alias("d"))
            .withColumn("rn", F.row_number().over(wv))
            .filter(F.col("rn") == 1)
        )
        upd = (
            assign.select("_cell", F.posexplode("_emb").alias("_dim", "_val"))
            .groupBy("_cell", "_dim")
            .agg(F.round(F.avg("_val"), round_decimals).alias("_val"))
            .collect()
        )
        new_cent = cent.copy()
        byc: dict[int, dict[int, float]] = {}
        for r in upd:
            byc.setdefault(r["_cell"], {})[r["_dim"]] = r["_val"]
        for i, dims in byc.items():
            new_cent[i] = [dims[d] for d in range(n_dim)]
        shift = float(np.max(np.abs(new_cent - cent)))
        cent = new_cent
        if shift <= tol:
            break
    return cent, it


def kmeans_assign(
    vectors: DataFrame,
    centroids: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "emb",
) -> DataFrame:
    """Assign every vector to its nearest centroid: (id_col, cell, dist)."""
    v = vectors.select(F.col(id_col).alias(id_col), F.col(vec_col).alias("_emb"))
    cdf = vectors.sparkSession.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "cell int, _cemb array<double>",
    )
    dist = F.sqrt(
        F.aggregate(
            F.zip_with("_emb", "_cemb", lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda a, x: a + x,
        )
    )
    wv = W.partitionBy(id_col).orderBy("dist", "cell")
    return (
        v.join(F.broadcast(cdf))
        .select(id_col, "cell", dist.alias("dist"))
        .withColumn("rn", F.row_number().over(wv))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
