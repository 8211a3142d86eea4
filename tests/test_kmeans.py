"""Differential test: the distributed Lloyd's loop equals a numpy
implementation with identical seeding/rounding/tie rules (the iterative
twin of the components union-find differential in test_components.py;
ss05's oracle covers the fixed-iteration flavor value-for-value)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from xarray_sql_spark.operators.kmeans import kmeans_assign, kmeans_fit
from xarray_sql_spark.session import table


def _numpy_lloyd(X: np.ndarray, k: int, max_iter: int, tol: float, nd: int):
    cent = X[:k].astype(np.float64).copy()
    it = 0
    for it in range(1, max_iter + 1):
        d = np.sqrt(((X[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2))
        assign = d.argmin(axis=1)  # ties -> lowest cell, matching the window
        new = cent.copy()
        for c in range(k):
            members = X[assign == c]
            if len(members):
                new[c] = np.round(members.mean(axis=0), nd)
        shift = float(np.max(np.abs(new - cent)))
        cent = new
        if shift <= tol:
            break
    return cent, it


@pytest.fixture(scope="module")
def emb(spark):
    e = table(spark, SF_SMALL, "embeddings")
    df = e.select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
    X = np.array(
        [r["emb"] for r in df.orderBy("vec_id").collect()], dtype=np.float64
    )
    return df, X


def test_kmeans_fit_matches_numpy(spark, emb):
    df, X = emb
    got, got_it = kmeans_fit(df, k=6, max_iter=10, tol=1e-3)
    want, want_it = _numpy_lloyd(X, k=6, max_iter=10, tol=1e-3, nd=6)
    assert got_it == want_it
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-9)


def test_kmeans_converges_and_assignment_is_total(spark, emb):
    df, X = emb
    cent, n_it = kmeans_fit(df, k=4, max_iter=25, tol=1e-2)
    assert 1 <= n_it <= 25
    out = kmeans_assign(df, cent)
    rows = out.collect()
    assert len(rows) == len(X)  # every vector assigned exactly once
    assert {r["cell"] for r in rows} <= set(range(4))
    # assignment agrees with numpy argmin against the SAME centroids
    d = np.sqrt(((X[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2))
    want = d.argmin(axis=1)
    got = {r["vec_id"]: r["cell"] for r in rows}
    ids = [r["vec_id"] for r in df.orderBy("vec_id").collect()]
    mismatch = sum(got[i] != want[j] for j, i in enumerate(ids))
    assert mismatch == 0
