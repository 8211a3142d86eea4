#!/usr/bin/env python
"""Interleaved same-window A/B: mm05 r15 shape (4 fingerprint subtree
consumers: candidate a/b + verify pa/pb joins) vs the r16 match-count
shape (2 consumers, exchange-reused to 1 executed scan)."""

from __future__ import annotations

import os
import statistics
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from xarray_sql_spark.operators.multimodal import (  # noqa: E402
    PHASH_BANDS,
    PHASH_BLOCK,
    media_table,
    mm05_phash_neardup,
)
from xarray_sql_spark.session import get_spark  # noqa: E402


def mm05_old(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The r15 shape, verbatim (git f63ba07)."""
    m = media_table(spark, sf_dir).filter(F.col("media_type") == "image")
    s = F.col("content").cast("string")
    base = m.select("doc_id", s.alias("s")).select(
        "doc_id", "s", F.length("s").alias("n")
    )
    bands = F.array(
        *[
            F.expr(
                f"CASE WHEN {k * PHASH_BLOCK} < n THEN "
                f"substr(md5(substring(s, {k * PHASH_BLOCK} + 1, {PHASH_BLOCK})), 1, 4) "
                f"ELSE '-' END"
            )
            for k in range(PHASH_BANDS)
        ]
    )
    ph = base.select("doc_id", "n", bands.alias("bands"))
    ex = ph.select("doc_id", "n", F.posexplode("bands").alias("k", "bv")).filter(
        F.col("k") * PHASH_BLOCK < F.col("n")
    )
    a, b = ex.alias("a"), ex.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.k") == F.col("b.k"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    pa_, pb_ = ph.alias("pa"), ph.alias("pb")
    ham = F.aggregate(
        F.zip_with(
            F.col("pa.bands"),
            F.col("pb.bands"),
            lambda x, y: F.when(x == y, F.lit(0)).otherwise(F.lit(1)),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return (
        cand.join(pa_, cand["doc_a"] == F.col("pa.doc_id"))
        .join(pb_, cand["doc_b"] == F.col("pb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            ham.cast("int").alias("hamming"),
            F.greatest(F.col("pa.n"), F.col("pb.n")).alias("maxn"),
        )
        .filter((F.col("hamming") <= 1) & (F.col("maxn") > PHASH_BLOCK))
        .select("doc_a", "doc_b", "hamming")
        .orderBy("doc_a", "doc_b")
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = int(os.environ.get("AB_ROUNDS", "6"))
    spark = get_spark("ab-mm05")

    def run(fn) -> float:
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    a_rows = sorted(map(tuple, mm05_old(spark, sf_dir).collect()))
    b_rows = sorted(map(tuple, mm05_phash_neardup(spark, sf_dir).collect()))
    assert a_rows == b_rows, f"OUTPUT DIVERGES: {len(a_rows)} vs {len(b_rows)} rows"
    print(f"outputs identical: {len(a_rows)} rows", flush=True)

    run(mm05_old)
    run(mm05_phash_neardup)
    olds, news = [], []
    for i in range(rounds):
        spark.sparkContext._jvm.System.gc()
        olds.append(run(mm05_old))
        news.append(run(mm05_phash_neardup))
        print(f"round {i}: old={olds[-1]:.3f} new={news[-1]:.3f}", flush=True)
    print(
        f"median old={statistics.median(olds):.3f} "
        f"new={statistics.median(news):.3f} "
        f"speedup={statistics.median(olds) / statistics.median(news):.2f}x"
    )


if __name__ == "__main__":
    main()
