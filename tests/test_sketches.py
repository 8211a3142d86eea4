"""Distributed-cardinality sketches: the 100 TB path for COUNT(DISTINCT).

No oracle entry: DataSketches HLL binaries aren't portable across engines.
The properties pinned here are the ones that matter at scale instead —
mergeability (sketch of the union == union of the sketches, which is what
lets per-partition partials combine without a global shuffle of raw keys)
and bounded relative error versus the exact count.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_MED
from xarray_sql_spark.session import table


def test_hll_union_of_parts_equals_whole(spark):
    e = table(spark, SF_MED, "events").select("user_id", "event_type")
    whole = e.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("n")
    ).collect()[0]["n"]
    # per-group sketches merged with hll_union_agg == one global sketch:
    # exactly the partial->final combine a cluster runs per partition.
    merged = (
        e.groupBy("event_type")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("n"))
        .collect()[0]["n"]
    )
    assert whole == merged


def test_hll_and_approx_distinct_error_bounds(spark):
    e = table(spark, SF_MED, "events")
    exact, hll, approx = e.agg(
        F.countDistinct("user_id").alias("exact"),
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("hll"),
        F.approx_count_distinct("user_id", 0.02).alias("approx"),
    ).collect()[0]
    assert abs(hll - exact) / exact < 0.05
    assert abs(approx - exact) / exact < 0.05


def test_word_ngrams_short_docs_yield_empty(spark):
    """Docs shorter than the shingle width yield ZERO shingles (ADVICE r1:
    a descending sequence() would fabricate shingles from null elements and
    silently diverge from the DuckDB oracle's empty range())."""
    from xarray_sql_spark.queries.pipeline_ops import _word_ngrams

    df = spark.createDataFrame(
        [("a b c d",), ("a b",), ("a",), ("",)], ["text"]
    ).select(F.split("text", " ").alias("w"))
    rows = df.select(_word_ngrams(3).alias("sh")).collect()
    assert [r["sh"] for r in rows] == [["a b c", "b c d"], [], [], []]
