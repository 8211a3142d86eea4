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
