"""Connected components vs a driver-side union-find differential oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_MED
from xarray_sql_spark.operators import components as cc
from xarray_sql_spark.queries.dedup_lsh import dd04_minhash_lsh


class UnionFind:
    def __init__(self):
        self.p = {}

    def find(self, x):
        self.p.setdefault(x, x)
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)


def _min_labels(edges):
    uf = UnionFind()
    for a, b in edges:
        uf.union(a, b)
    # canonical min-id per component
    members = {}
    for x in uf.p:
        members.setdefault(uf.find(x), []).append(x)
    out = {}
    for _root, xs in members.items():
        m = min(xs)
        for x in xs:
            out[x] = m
    return out


def test_components_on_synthetic_graph(spark):
    # two chains, one triangle, one isolated edge; chain forces >1 round
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (12, 10), (20, 21)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: r["comp"] for r in cc.connected_components(df).collect()}
    assert got == _min_labels(edges)


def test_components_on_long_chain(spark):
    # diameter 63: log-rounds pointer jumping must still converge within cap
    edges = [(i, i + 1) for i in range(64)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: r["comp"] for r in cc.connected_components(df).collect()}
    assert set(got.values()) == {0}


def _mega_star_edges(n=5000):
    # one viral cluster: hub 0 with n spokes, a chain grafted onto spoke 1
    # (forces multi-round convergence THROUGH the hot cluster), plus a
    # separate small component that must not be absorbed
    return (
        [(0, i) for i in range(1, n)]
        + [(1, n + i) for i in range(1, 2)]
        + [(n + 1, n + 2), (n + 2, n + 3)]
        + [(70000, 70001)]
    )


def test_components_mega_cluster_hot_path_correct(spark):
    edges = _mega_star_edges()
    df = spark.createDataFrame(edges, "src long, dst long")
    # hot_threshold 500 << hub degree 5000: hub and the viral component
    # label both route through the broadcast hot path
    got = {
        r["id"]: r["comp"]
        for r in cc.connected_components(df, hot_threshold=500).collect()
    }
    assert got == _min_labels(edges)


def test_components_hot_and_cold_paths_agree(spark):
    edges = _mega_star_edges(1200)
    df = spark.createDataFrame(edges, "src long, dst long")
    hot = {
        r["id"]: r["comp"]
        for r in cc.connected_components(df, hot_threshold=100).collect()
    }
    cold = {
        r["id"]: r["comp"]
        for r in cc.connected_components(df, hot_threshold=1 << 40).collect()
    }
    assert hot == cold == _min_labels(edges)


def test_hot_key_routing_bounds_cold_side(spark):
    # The scale property under test: after hot keys are routed to the
    # broadcast path, NO remaining join key exceeds the threshold — i.e.
    # the shuffle join's densest reducer is bounded by hot_threshold, so
    # the densest stage stays multi-task at any cluster size.
    edges = _mega_star_edges()
    df = spark.createDataFrame(edges, "src long, dst long")
    sym = df.selectExpr("src", "dst").union(df.selectExpr("dst AS src", "src AS dst"))
    hot = cc._hot_keys(sym.groupBy("dst").count(), "dst", 500)
    assert 0 in hot  # the hub was detected
    cold_max = (
        sym.filter(~F.col("dst").isin(hot))
        .groupBy("dst")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert cold_max < 500


def test_hot_lookup_plan_broadcasts(spark):
    # hot keys must resolve via BroadcastHashJoin (rows stay put), never a
    # shuffle keyed on the hot value
    edges = [(0, i) for i in range(1, 2000)]
    df = spark.createDataFrame(edges, "src long, dst long")
    sym = df.selectExpr("src", "dst").union(df.selectExpr("dst AS src", "src AS dst"))
    labels = sym.select(F.col("src").alias("id")).distinct().select(
        "id", F.col("id").alias("comp")
    )
    out = cc._lookup_min(sym, "dst", labels, "src", [0])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_purge_assignment_matches_union_find(spark):
    pairs = dd04_minhash_lsh(spark, SF_MED).select("doc_a", "doc_b").collect()
    edges = [(r["doc_a"], r["doc_b"]) for r in pairs]
    want = _min_labels(edges)
    out = cc.cc01_neardup_purge(spark, SF_MED).collect()
    got = {r["doc_id"]: r["keeper_doc_id"] for r in out}
    n_docs = len(got)
    assert n_docs == 500
    for doc, keeper in want.items():
        assert got[doc] == keeper
    # docs not in any pair keep themselves
    loners = set(got) - set(want)
    assert all(got[d] == d for d in loners)
    # purge invariant: keepers are never marked duplicates
    dups = {r["doc_id"] for r in out if r["is_duplicate"]}
    keepers = set(got.values())
    assert dups.isdisjoint(keepers)


def test_mega_cluster_reducer_rows_bounded_empirically(spark):
    """Empirical per-partition proof of the skew fix: on a 20k-spoke star,
    the plain lookup join lands every hub row in ONE post-shuffle
    partition (the hot reducer), while the hot/cold split keeps every
    partition's row count bounded — measured with spark_partition_id on
    the actual joined rows, not inferred from the plan."""
    n = 20000
    # Real distributed input (a LocalTableScan would execute single-task
    # and make both measurements vacuous) and no AQE partition coalescing
    # (at test-scale byte counts AQE folds everything to one partition,
    # masking exactly the concentration under test).
    coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    old = spark.conf.get(coalesce_key, "true")
    spark.conf.set(coalesce_key, "false")
    try:
        df = spark.createDataFrame(
            [(0, i) for i in range(1, n)], "src long, dst long"
        ).repartition(32)
        sym = df.selectExpr("src", "dst").union(
            df.selectExpr("dst AS src", "src AS dst")
        )
        labels = sym.select(F.col("src").alias("id")).distinct().select(
            "id", F.col("id").alias("comp")
        )

        def max_partition_rows(joined):
            sizes = joined.groupBy(F.spark_partition_id().alias("p")).count().collect()
            return max(r["count"] for r in sizes)

        # plain shuffle join: the hub key concentrates on one reducer
        plain = sym.join(labels.hint("merge"), sym.dst == labels.id).select(
            "src", "comp"
        )
        assert max_partition_rows(plain) >= n - 1

        # hot/cold split (threshold 1000 << hub degree): bounded everywhere
        hot = cc._hot_keys(sym.groupBy("dst").count(), "dst", 1000)
        hot_labels = labels.filter(F.col("id").isin(hot)).select(
            F.col("id").alias("__hk"), F.col("comp")
        )
        split = (
            sym.filter(F.col("dst").isin(hot))
            .join(F.broadcast(hot_labels), F.col("dst") == F.col("__hk"))
            .select("src", "comp")
            .union(
                sym.filter(~F.col("dst").isin(hot))
                .join(labels.hint("merge"), sym.dst == labels.id)
                .select("src", "comp")
            )
        )
        # hot rows keep their (uniform) scan partitioning; cold keys are
        # below threshold by construction — so no partition concentrates
        assert max_partition_rows(split) < n // 4
    finally:
        spark.conf.set(coalesce_key, old)
