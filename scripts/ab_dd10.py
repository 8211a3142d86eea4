#!/usr/bin/env python
"""Interleaved same-window A/B: dd10 r15 shape (3 scans + 2 SMJ) vs the
r16 packed-key single-scan shape. ABAB within one session — the only
decision-grade protocol on this box (10-12x wall-clock swings on
identical code make sequential comparisons meaningless)."""

from __future__ import annotations

import os
import statistics
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from xarray_sql_spark.queries.pipeline_ops import (  # noqa: E402
    _word_ngrams,
    dd10_shared_span_pairs,
)
from xarray_sql_spark.session import get_spark, table  # noqa: E402


def dd10_old(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The r15 shape, verbatim (git f63ba07)."""
    d = table(spark, sf_dir, "documents", spread=True).select(
        "doc_id", F.split("text", " ").alias("w")
    )
    shingles = F.array_distinct(_word_ngrams(8))
    sh = d.select(
        "doc_id",
        F.explode(
            F.transform(
                shingles,
                lambda g: F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast(
                    "bigint"
                ),
            )
        ).alias("gh"),
    )
    ng = d.select("doc_id", F.size(shingles).alias("n_g"))
    grams = (
        sh.groupBy("gh")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ds"))
        .filter(F.size("ds").between(2, 8))
    )
    combos = F.flatten(
        F.transform(
            "ds",
            lambda a, i: F.transform(
                F.slice(F.col("ds"), i + 2, F.size("ds")),
                lambda b: F.struct(a.alias("doc_a"), b.alias("doc_b")),
            ),
        )
    )
    pairs = (
        grams.select(F.explode(combos).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
    )
    na, nb = ng.alias("na"), ng.alias("nb")
    return (
        pairs.hint("merge").join(na, F.col("doc_a") == F.col("na.doc_id"))
        .hint("merge").join(nb, F.col("doc_b") == F.col("nb.doc_id"))
        .select(
            "doc_a", "doc_b", "n_shared",
            F.round(
                F.col("n_shared")
                / F.least(F.col("na.n_g"), F.col("nb.n_g")).cast("double"),
                6,
            ).alias("containment"),
        )
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = int(os.environ.get("AB_ROUNDS", "6"))
    spark = get_spark("ab-dd10")

    def run(fn) -> float:
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # equality check first (sorted rows)
    a_rows = sorted(map(tuple, dd10_old(spark, sf_dir).collect()))
    b_rows = sorted(map(tuple, dd10_shared_span_pairs(spark, sf_dir).collect()))
    assert a_rows == b_rows, f"OUTPUT DIVERGES: {len(a_rows)} vs {len(b_rows)} rows"
    print(f"outputs identical: {len(a_rows)} rows", flush=True)

    run(dd10_old)  # warm both shapes
    run(dd10_shared_span_pairs)
    olds, news = [], []
    for i in range(rounds):
        spark.sparkContext._jvm.System.gc()
        olds.append(run(dd10_old))
        news.append(run(dd10_shared_span_pairs))
        print(f"round {i}: old={olds[-1]:.3f} new={news[-1]:.3f}", flush=True)
    print(
        f"median old={statistics.median(olds):.3f} "
        f"new={statistics.median(news):.3f} "
        f"speedup={statistics.median(olds) / statistics.median(news):.2f}x"
    )


if __name__ == "__main__":
    main()
