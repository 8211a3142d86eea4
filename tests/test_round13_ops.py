"""Round-13 hardening: dd03/dd17 posting-list caps (planted mega-shingle),
plus regression anchors for this round's plan/bench changes.

The cap claim ("posting lists are capped at 100 TB") is now enforced in
code: a shingle shared by more than _DD_POSTING_CAP documents must be
dropped BEFORE the inverted-index self-join, so a boilerplate line shared
corpus-wide cannot create a quadratic join bucket. These tests plant
exactly that corpus shape and pin (a) the mega-shingle generates ZERO
pairs, (b) a legitimate shared span still pairs, with set sizes recomputed
over the capped shingle universe.
"""

from __future__ import annotations

import pytest

from xarray_sql_spark.queries import REGISTRY
from xarray_sql_spark.queries.pipeline_ops import _DD_POSTING_CAP
from tests.test_pipeline_semantics import _write_documents


def _mega_corpus(tmp_path):
    """70 docs (> cap=64) sharing exactly ONE 3-gram ('mega0 mega1 mega2')
    amid per-doc-unique filler, plus one legitimate near-dup pair sharing a
    6-word span (= 4 word-3-grams)."""
    assert _DD_POSTING_CAP < 70  # fixture must actually exceed the cap
    texts = [
        f"u{i}a u{i}b mega0 mega1 mega2 u{i}c u{i}d" for i in range(70)
    ]
    span = "s0 s1 s2 s3 s4 s5"
    doc_a = f"pa0 pa1 pa2 pa3 {span} pa4 pa5 pa6 pa7"  # 14 words, 12 shingles
    doc_b = f"pb0 pb1 {span} pb2 pb3"  # 10 words, 8 shingles
    texts += [doc_a, doc_b]
    return _write_documents(tmp_path, texts), len(texts) - 2, len(texts) - 1


def test_dd03_mega_shingle_capped(spark, tmp_path):
    sf, ida, idb = _mega_corpus(tmp_path)
    rows = REGISTRY["dd03_ngram_jaccard"].fn(spark, sf).collect()
    # Without the cap: 70*69/2 = 2415 pairs, each jaccard 1/9 >= 0.05.
    # With the cap the mega bucket never reaches the join: one real pair.
    assert len(rows) == 1
    (r,) = rows
    assert (r.doc_a, r.doc_b) == (ida, idb)
    # 4 shared shingles; sizes 12 and 8 (no shingle besides the mega one is
    # shared with the filler docs, so post-cap sizes equal raw sizes here).
    assert r.jaccard == pytest.approx(4 / (12 + 8 - 4), abs=1e-6)


def test_dd17_mega_shingle_capped_and_direction(spark, tmp_path):
    sf, ida, idb = _mega_corpus(tmp_path)
    rows = REGISTRY["dd17_containment_neardup"].fn(spark, sf).collect()
    assert len(rows) == 1
    (r,) = rows
    assert (r.doc_a, r.doc_b) == (ida, idb)
    assert r.cont_a_in_b == pytest.approx(4 / 12, abs=1e-6)
    assert r.cont_b_in_a == pytest.approx(4 / 8, abs=1e-6)
    assert r.direction == "b_in_a"


def test_dd03_sizes_recomputed_post_cap(spark, tmp_path):
    """When a capped-out shingle ALSO appears in a paired doc, the Jaccard
    denominator must use the post-cap set size (capped universe), not the
    raw shingle count — otherwise Spark and the oracle could pin different
    denominators at scale."""
    # 70 filler docs own the mega shingle; doc A and doc B each ALSO
    # contain it (postings = 72 > cap), plus share a 6-word span.
    texts = [
        f"u{i}a u{i}b mega0 mega1 mega2 u{i}c u{i}d" for i in range(70)
    ]
    span = "s0 s1 s2 s3 s4 s5"
    # A: 3 unique + mega(3) + 1 unique + span(6) + 1 unique = 14 words,
    # 12 raw shingles of which exactly 1 (the pure mega gram) is capped out
    # => post-cap size 11.
    doc_a = f"pa0 pa1 pa2 mega0 mega1 mega2 pa3 {span} pa4"
    # B: 1 unique + mega(3) + 1 unique + span(6) + 1 unique = 12 words,
    # 10 raw shingles, 1 capped => post-cap size 9.
    doc_b = f"pb0 mega0 mega1 mega2 pb1 {span} pb2"
    texts += [doc_a, doc_b]
    sf = _write_documents(tmp_path, texts)
    rows = REGISTRY["dd03_ngram_jaccard"].fn(spark, sf).collect()
    assert len(rows) == 1
    (r,) = rows
    assert (r.doc_a, r.doc_b) == (70, 71)
    # Shared post-cap: the 4 span-internal shingles (mega gram dropped).
    assert r.jaccard == pytest.approx(4 / (11 + 9 - 4), abs=1e-6)


# --- pl17 exchange-count plan golden ------------------------------------------


def test_pl17_windowed_counts_no_joinback(spark):
    """r12 verdict item 4: the dup flags must be window counts over the
    curl/tmd5 hash partitionings, not groupBy + join-back pairs. Pin the
    plan: no shuffle join anywhere (the only join is the 1-row broadcast
    total), and exactly four data-bearing hash exchanges — curl window,
    tmd5 window, the countDistinct partial pair (domain, curl), and the
    final domain rollup."""
    from tests.conftest import SF_MED

    df = REGISTRY["pl17_url_provenance"].fn(spark, SF_MED)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    n_hash = plan.count("Exchange hashpartitioning")
    assert n_hash == 4, f"expected 4 hash exchanges, got {n_hash}:\n{plan}"
    assert plan.count("Window") == 2  # curl count + tmd5 count


# --- ts20 single-pass training ------------------------------------------------


def test_ts20_single_pass_priors_count_empty_docs(spark, tmp_path):
    """Training now recovers class priors from the SAME exploded pass as
    the bucket counts (first-word marker rows; empty docs surface as a
    null-word row). Priors must equal a direct doc-level recount — with
    an empty document planted to exercise the posexplode_outer path."""
    from xarray_sql_spark.queries.pipeline_ops import (
        _TS20_CACHE,
        _ts20_base,
        ts20_train,
    )

    texts = [
        "fast merge join hash sort group",   # good-heavy
        "slow scan row batch line part",     # bad-heavy
        "",                                   # empty: null-word marker row
        "fast slow alpha beta gamma",
        "merge join slow scan delta",
    ]
    sf = _write_documents(tmp_path, texts)
    _TS20_CACHE.clear()
    try:
        iw, bias = ts20_train(spark, sf)
        train = _ts20_base(spark, sf).filter("split = 'train'")
        import math

        rows = train.select("y").collect()
        n_pos = sum(r.y for r in rows)
        n_neg = len(rows) - n_pos
        expect_bias = round(math.log((n_pos + 1) / float(n_neg + 1)) * 1e6)
        assert bias == expect_bias
        assert len(iw) == 64
    finally:
        _TS20_CACHE.clear()  # don't leak tmp-fixture weights to other tests
