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


# --- hh02/qs01: the oracled expression-level sketches -------------------------


def _py_hll_regs(values):
    """Independent pure-Python mirror of hh02's register math: md5-60bit
    hash, low-10-bit register index, rho = leading-zero rank of the top
    50 bits."""
    import hashlib

    regs = [0] * 1024
    for v in values:
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
        reg, w = h % 1024, h // 1024
        regs[reg] = max(regs[reg], 51 - w.bit_length())
    return regs


def _py_hll_state(values):
    """hh02's integer register fold S = sum(2^(51-rho))."""
    return sum(1 << (51 - r) for r in _py_hll_regs(values))


def test_hll_registers_merge_by_max():
    """The property that makes the sketch distributed: per-partition
    register tables merge by elementwise max into EXACTLY the whole-data
    table (what hh02's groupBy(reg).max(rho) computes when partitions'
    partial aggregates combine) — so only register rows ever shuffle."""
    a = [f"a{i}" for i in range(4000)]
    b = [f"b{i}" for i in range(3000)] + a[:500]  # overlapping halves
    merged = [max(x, y) for x, y in zip(_py_hll_regs(a), _py_hll_regs(b))]
    assert merged == _py_hll_regs(a + b)


def test_qs_sketch_merges_by_count_addition():
    """qs01's rollup path: per-partition/day bucket histograms merge by
    ADDING counts per bucket — the union's sketch exactly."""
    from collections import Counter

    a = [(i * 37) % 10_000 + 1 for i in range(5000)]
    b = [(i * 101) % 70_000 + 1 for i in range(3000)]
    ca = Counter(_py_qs_bucket(v) for v in a)
    cb = Counter(_py_qs_bucket(v) for v in b)
    assert ca + cb == Counter(_py_qs_bucket(v) for v in a + b)


def test_hh02_spark_matches_python_differential(spark):
    """The Spark expression pipeline (conv/md5/bin/shiftleft) computes the
    IDENTICAL register fold as an independent Python int implementation —
    on the real events table, not a toy."""
    import pyarrow.parquet as pq

    from xarray_sql_spark.queries import REGISTRY
    from xarray_sql_spark.queries.advanced_ops import _HLL_ALPHA_NUM

    ids = pq.read_table(f"{SF_MED}/events.parquet", columns=["event_id"])[
        "event_id"
    ].to_pylist()
    s_py = _py_hll_state(ids)
    row = REGISTRY["hh02_hll_distinct"].fn(spark, SF_MED).collect()[0]
    assert row["s_sum"] == s_py
    assert row["est_hll"] == round(_HLL_ALPHA_NUM / s_py, 3)
    # and the estimate actually estimates: the sf0.01 events table is in
    # the HLL estimate regime (n >> 2.5m), where the bound is ~3*1.04/32
    assert abs(row["est_hll"] - row["n_exact"]) / row["n_exact"] < 0.10


def _py_qs_bucket(v: int, sig: int = 5) -> int:
    shift = max(v.bit_length() - sig, 0)
    return (v >> shift) << shift


def test_qs01_sketch_answers_match_rank_values(spark):
    """qs01's sketch answer for each q must be the BUCKET of the true
    rank-ceil(q*n) element (monotone bucketing makes histogram rank ==
    value rank), hence within the 2^-(sig-1) relative bound of the exact
    percentile it stands in for."""
    import math

    import pyarrow.parquet as pq

    from xarray_sql_spark.queries import REGISTRY

    prices = pq.read_table(
        f"{SF_MED}/lineitem.parquet", columns=["l_extendedprice"]
    )["l_extendedprice"].to_pylist()
    vals = sorted(int(math.floor(p * 100 + 0.5)) for p in prices)
    for row in REGISTRY["qs01_quantile_sketch"].fn(spark, SF_MED).collect():
        x_r = vals[math.ceil(row["q"] * len(vals)) - 1]
        assert row["n_rows"] == len(vals)
        assert row["est_lb"] == _py_qs_bucket(x_r)
        assert 0 <= (x_r - row["est_lb"]) / x_r < 2 ** -4
        assert abs(row["rel_err"]) < 2 ** -4 + 0.01  # vs interpolated exact


def _py_cms(values, d=4, w=512):
    """Independent mirror of hh03's salted-md5 count-min placement."""
    import hashlib
    from collections import Counter

    sketch = Counter()
    for v in values:
        for r in range(d):
            h = int(hashlib.md5(f"{r}|{v}".encode()).hexdigest()[:15], 16)
            sketch[(r, h % w)] += 1
    return sketch


def test_hh03_spark_matches_python_and_is_one_sided(spark):
    """hh03's engine-expression sketch equals the independent Python
    placement on the real events table, and every probed estimate obeys
    the CMS one-sided bound: true <= est <= true + total/w (the
    per-row expected-collision bound, loose but a hard invariant with
    d independent rows would be probabilistic — the >= side is the
    hard one)."""
    import pyarrow.parquet as pq
    from collections import Counter

    from xarray_sql_spark.queries import REGISTRY
    from xarray_sql_spark.queries.advanced_ops import _CMS_D, _CMS_W

    ids = pq.read_table(f"{SF_MED}/events.parquet", columns=["user_id"])[
        "user_id"
    ].to_pylist()
    sketch = _py_cms(ids, _CMS_D, _CMS_W)
    truth = Counter(ids)
    rows = REGISTRY["hh03_countmin"].fn(spark, SF_MED).collect()
    assert len(rows) > 0
    for r in rows:
        est_py = min(
            sketch[(d, int(__import__("hashlib").md5(
                f"{d}|{r['user_id']}".encode()
            ).hexdigest()[:15], 16) % _CMS_W)]
            for d in range(_CMS_D)
        )
        assert r["est_cnt"] == est_py
        assert r["true_cnt"] == truth[r["user_id"]]
        assert r["overestimate"] >= 0  # CMS never undercounts


def _py_bm25(docs, queries, k1=1.25, b=0.75):
    """Independent BM25 (Robertson) over whitespace tokens — the formula
    transcription check for ts18 (both engines share ts18's expression,
    so the oracle gate alone can't catch a both-sides-wrong formula)."""
    import math

    toks = {i: t.split(" ") for i, t in docs.items()}
    n = len(docs)
    avgdl = sum(len(w) for w in toks.values()) / n
    out = {}
    for qid, terms in queries.items():
        df = {t: sum(1 for w in toks.values() if t in w) for t in terms}
        for i, w in toks.items():
            s = 0.0
            for t in terms:
                tf = w.count(t)
                idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
                s = s + idf * (tf * (k1 + 1)) / (
                    tf + k1 * (1 - b + b * len(w) / avgdl)
                )
            if round(s, 6) > 0:
                out[(qid, i)] = round(s, 6)
    return out


def test_ts18_matches_python_bm25(spark):
    """Every (query, doc) ts18 ranks must carry exactly the score an
    independent Python BM25 computes, and the per-query ordering must be
    the rounded-score-then-doc_id order."""
    import pyarrow.parquet as pq

    from xarray_sql_spark.queries import REGISTRY
    from xarray_sql_spark.queries.pipeline_ops import _BM25_QUERIES

    t = pq.read_table(f"{SF_MED}/documents.parquet", columns=["doc_id", "text"])
    docs = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    py = _py_bm25(docs, _BM25_QUERIES)
    rows = REGISTRY["ts18_bm25_retrieval"].fn(spark, SF_MED).collect()
    assert len(rows) == 3 * 10
    for qid in _BM25_QUERIES:
        got = [(r["doc_id"], r["score"]) for r in rows if r["query_id"] == qid]
        want = sorted(
            ((i, s) for (q, i), s in py.items() if q == qid),
            key=lambda t: (-t[1], t[0]),
        )[:10]
        assert got == want, qid
