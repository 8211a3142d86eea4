#!/usr/bin/env python
"""Interleaved same-window A/B: ts06 r15 shape (bigram explode + two
corpus-proportional exchanges) vs the r16 per-row run-length fold (zero
data exchanges). Also writes the before-plan dump (the old shape no
longer exists in the registry)."""

from __future__ import annotations

import io
import os
import statistics
import sys
import time
from contextlib import redirect_stdout

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from xarray_sql_spark.queries.advanced_ops import ts06_char_entropy  # noqa: E402
from xarray_sql_spark.session import get_spark, table  # noqa: E402


def ts06_old(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The r15 shape, verbatim (git f51f38e^ lineage)."""
    d = table(spark, sf_dir, "documents", spread=True).filter(F.length("text") >= 2)
    bigrams = F.expr(
        "transform(sequence(1, length(text) - 1), i -> substring(text, i, 2))"
    )
    counts = (
        d.select("doc_id", F.explode(bigrams).alias("b"))
        .groupBy("doc_id", "b")
        .agg(F.count("*").alias("c"))
    )
    c = F.col("c").cast("double")
    return (
        counts.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_bigrams"),
            F.round(
                F.log(F.sum(c)) - F.sum(c * F.log(c)) / F.sum(c), 6
            ).alias("entropy"),
        )
        .orderBy("doc_id")
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = int(os.environ.get("AB_ROUNDS", "6"))
    spark = get_spark("ab-ts06")

    if os.environ.get("AB_TS06_DUMP_BEFORE"):
        buf = io.StringIO()
        with redirect_stdout(buf):
            ts06_old(spark, sf_dir).explain("formatted")
        with open(os.path.join(ROOT, "plans/r16/ts06_char_entropy_before.txt"), "w") as f:
            f.write(buf.getvalue())
        print("wrote before plan", flush=True)

    a = sorted(map(tuple, ts06_old(spark, sf_dir).collect()))
    b = sorted(map(tuple, ts06_char_entropy(spark, sf_dir).collect()))
    assert a == b, f"OUTPUT DIVERGES ({len(a)} vs {len(b)})"
    print(f"outputs identical ({len(a)} rows)", flush=True)

    def run(fn) -> float:
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    run(ts06_old)
    run(ts06_char_entropy)
    olds, news = [], []
    for i in range(rounds):
        spark.sparkContext._jvm.System.gc()
        olds.append(run(ts06_old))
        news.append(run(ts06_char_entropy))
        print(f"round {i}: old={olds[-1]:.3f} new={news[-1]:.3f}", flush=True)
    mo, mn = statistics.median(olds), statistics.median(news)
    print(f"MEDIAN old={mo:.3f} new={mn:.3f} speedup={mo/mn:.2f}x")


if __name__ == "__main__":
    main()
