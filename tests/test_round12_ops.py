"""Round-12 operators: ts20 quality classifier, dd15 line dedup,
pl17 URL canonicalization, mm12 signal statistics.

The oracle sweep (test_oracle_queries) proves Spark == DuckDB on the real
fixture; these tests prove the operators compute the RIGHT thing — the
classifier learns, planted duplicates/variants are found, decoded stats
are byte-exact against an independent Python computation."""

from __future__ import annotations

import hashlib
import struct

import pytest

from tests.conftest import SF_MED
from tests.test_pipeline_semantics import _write_documents
from xarray_sql_spark.queries import REGISTRY


# --- ts20 ---------------------------------------------------------------------


def test_ts20_learns_past_majority_baseline(spark):
    """The scorer must actually LEARN the lexicon rule from hashed
    bag-of-words: held-out accuracy must clear the majority-class
    baseline by a real margin, else the 'trained classifier' is a
    constant."""
    pdf = REGISTRY["ts20_quality_classifier"].fn(spark, SF_MED).toPandas()
    hel = pdf[pdf.split == "heldout"]
    assert len(hel) > 50
    acc = hel.correct.mean()
    base = max(hel.label.mean(), 1 - hel.label.mean())
    assert acc >= base + 0.10, (acc, base)


def test_ts20_training_is_memoized_and_deterministic(spark):
    from xarray_sql_spark.queries.pipeline_ops import ts20_train

    w1 = ts20_train(spark, SF_MED)
    w2 = ts20_train(spark, SF_MED)
    assert w1 is w2  # same cache entry: no retraining per call
    iw, bias = w1
    assert len(iw) == 64 and all(isinstance(v, int) for v in iw)
    assert isinstance(bias, int)


def test_ts20_good_words_score_above_bad_words(spark):
    """Weight signal check: the buckets the GOOD lexicon hashes into must
    carry higher trained weight than the BAD lexicon's buckets."""
    from xarray_sql_spark.queries.pipeline_ops import (
        _TS20_BAD,
        _TS20_GOOD,
        _TS20_V,
        ts20_train,
    )

    iw, _ = ts20_train(spark, SF_MED)

    def bucket(word: str) -> int:
        return int(hashlib.md5(word.encode()).hexdigest()[:15], 16) % _TS20_V

    good = sum(iw[bucket(w)] for w in _TS20_GOOD) / len(_TS20_GOOD)
    bad = sum(iw[bucket(w)] for w in _TS20_BAD) / len(_TS20_BAD)
    assert good > bad


def test_ts20_half_away_rounding_matches_duckdb():
    import duckdb

    from xarray_sql_spark.queries.pipeline_ops import _half_away

    con = duckdb.connect()
    for v in (0.5, -0.5, 1.5, -1.5, 2.4999, -2.4999, 123.5, 0.0):
        got = con.execute("SELECT CAST(round(?) AS BIGINT)", [v]).fetchone()[0]
        assert _half_away(v) == got, v


# --- dd15 ---------------------------------------------------------------------


def test_dd15_removes_planted_duplicate_lines(spark, tmp_path):
    """Three docs: doc0 owns line A; doc1 repeats A then owns B; doc2
    repeats A and B. First-occurrence wins corpus-wide."""
    A = "a0 a1 a2 a3 a4 a5 a6 a7"
    B = "b0 b1 b2 b3 b4 b5 b6 b7"
    C = "c0 c1 c2 c3 c4 c5 c6 c7"
    sf = _write_documents(tmp_path, [A, f"{A} {B}", f"{A} {B} {C}"])
    rows = {
        r.doc_id: r
        for r in REGISTRY["dd15_line_dedup"].fn(spark, sf).collect()
    }
    assert (rows[0].n_lines, rows[0].n_removed) == (1, 0)
    assert (rows[1].n_lines, rows[1].n_removed) == (2, 1)  # A removed
    assert (rows[2].n_lines, rows[2].n_removed) == (3, 2)  # A and B removed
    assert rows[1].kept_fp == hashlib.md5(B.encode()).hexdigest()
    assert rows[2].kept_fp == hashlib.md5(C.encode()).hexdigest()
    assert rows[2].n_kept_tokens == 8


def test_dd15_partial_final_segment_and_empty_doc(spark, tmp_path):
    sf = _write_documents(tmp_path, ["w0 w1 w2 w3 w4 w5 w6 w7 w8 w9", ""])
    rows = {
        r.doc_id: r
        for r in REGISTRY["dd15_line_dedup"].fn(spark, sf).collect()
    }
    assert rows[0].n_lines == 2  # 8-word line + 2-word partial
    assert rows[0].n_kept_tokens == 10
    assert rows[1].n_lines == 0
    assert rows[1].kept_fp == hashlib.md5(b"").hexdigest()


def test_dd15_intra_document_repeat_is_removed(spark, tmp_path):
    A = "x0 x1 x2 x3 x4 x5 x6 x7"
    sf = _write_documents(tmp_path, [f"{A} {A}"])
    (row,) = REGISTRY["dd15_line_dedup"].fn(spark, sf).collect()
    assert (row.n_lines, row.n_removed) == (2, 1)
    assert row.kept_fp == hashlib.md5(A.encode()).hexdigest()


# --- pl17 ---------------------------------------------------------------------


@pytest.mark.parametrize(
    "raw,canon",
    [
        ("https://example.com/d/1", "https://example.com/d/1"),
        ("HTTPS://WWW.EXAMPLE.COM/d/1", "https://example.com/d/1"),
        ("https://example.com:443/d/1/", "https://example.com/d/1"),
        (
            "https://example.com/d/1?utm_source=rss&utm_medium=email",
            "https://example.com/d/1",
        ),
        (
            "https://example.com/d/1?z=1&a=2&utm_campaign=x#frag",
            "https://example.com/d/1?a=2&z=1",
        ),
        ("https://news.example.com/d/1#top", "https://news.example.com/d/1"),
        ("http://example.com:80/p", "http://example.com/p"),
    ],
)
def test_pl17_canonicalizer_on_both_engines(spark, raw, canon):
    import duckdb

    from xarray_sql_spark.queries.pipeline_ops import _pl17_canon_expr

    got_spark = spark.sql(
        f"SELECT {_pl17_canon_expr('spark', 'u')} AS c FROM (SELECT '{raw}' AS u)"
    ).collect()[0].c
    got_duck = duckdb.connect().execute(
        f"SELECT {_pl17_canon_expr('duck', 'u')} FROM (SELECT '{raw}' AS u)"
    ).fetchone()[0]
    assert got_spark == canon
    assert got_duck == canon


@pytest.mark.parametrize(
    "host,domain",
    [
        ("example.com", "example.com"),
        ("news.example.com", "example.com"),
        ("a.b.example.co.uk", "example.co.uk"),
        ("example.co.uk", "example.co.uk"),
        ("news.example.com.au", "example.com.au"),
    ],
)
def test_pl17_registered_domain_on_both_engines(spark, host, domain):
    import duckdb

    from xarray_sql_spark.queries.pipeline_ops import _pl17_domain_expr

    got_spark = spark.sql(
        f"SELECT {_pl17_domain_expr('spark', 'h')} AS d FROM (SELECT '{host}' AS h)"
    ).collect()[0].d
    got_duck = duckdb.connect().execute(
        f"SELECT {_pl17_domain_expr('duck', 'h')} FROM (SELECT '{host}' AS h)"
    ).fetchone()[0]
    assert got_spark == domain
    assert got_duck == domain


def test_pl17_planted_variants_collide(spark):
    """The fixture plants case/port/slash/utm variants of shared paths —
    the rollup must report nonzero canonical-URL collisions, and every
    canonical URL must be in canonical form (lowercase scheme+host, no
    default port, no utm_, no trailing slash, no fragment)."""
    import re

    pdf = REGISTRY["pl17_url_provenance"].fn(spark, SF_MED).toPandas()
    assert pdf.n_dup_url_docs.sum() > 0
    assert (pdf.n_docs >= pdf.n_canon_urls).all()
    for u in pdf.min_canon_url:
        assert re.match(r"^https://[a-z0-9.-]+/", u), u
        assert "utm_" not in u and "#" not in u and ":443" not in u
        assert not u.split("?")[0].endswith("/")


# --- mm12 ---------------------------------------------------------------------


def test_mm12_stats_are_byte_exact_against_python(spark, tmp_path):
    """Independent re-computation: build the same payloads the fixture
    builds, decode them with plain struct/bytes Python (no numpy, no
    Spark), and require the pooled integers to match exactly."""
    texts = ["ab cd ef", "hello world spark", "x", "", "odd byte count here"]
    sf = _write_documents(
        tmp_path, texts, sources=["s0", "s1", "s0", "s1", "s0"]
    )
    pdf = REGISTRY["mm12_signal_stats"].fn(spark, sf).toPandas()

    exp: dict[tuple, list[int]] = {}
    for doc_id, text in enumerate(texts):
        src = ["s0", "s1", "s0", "s1", "s0"][doc_id]
        body = text.encode()
        if doc_id % 3 == 0 and (doc_id // 3) % 4 == 2:
            vals = list(body) + [0] * (doc_id % 4) + [255] * (doc_id % 3)
            clip = sum(1 for v in vals if v in (0, 255))
            key = ("bmp_rgb24", src)
        elif doc_id % 3 == 1:
            if len(body) % 2:
                body += b" "
            body += b"\xff\x7f" * (doc_id % 4) + b"\x00\x80" * (doc_id % 3)
            vals = [
                struct.unpack("<h", body[i : i + 2])[0]
                for i in range(0, len(body), 2)
            ]
            clip = sum(1 for v in vals if v in (32767, -32768))
            key = ("wav_pcm16", src)
        else:
            continue
        agg = exp.setdefault(key, [0, 0, 0, 0, 0])
        agg[0] += 1
        agg[1] += len(vals)
        agg[2] += sum(vals)
        agg[3] += sum(v * v for v in vals)
        agg[4] += clip
    got = {
        (r.kind, r.origin): [
            r.n_assets, r.n_units, r.sum_v, r.sumsq_v, r.n_clip
        ]
        for r in pdf.itertuples()
    }
    assert got == exp


def test_mm12_clip_counters_are_load_bearing(spark):
    pdf = REGISTRY["mm12_signal_stats"].fn(spark, SF_MED).toPandas()
    assert pdf.n_clip.sum() > 0
    assert (pdf[pdf.kind == "wav_pcm16"].n_clip.sum()) > 0
    assert (pdf[pdf.kind == "bmp_rgb24"].n_clip.sum()) > 0


# --- dd16 ---------------------------------------------------------------------


def test_dd16_keeps_the_highest_scored_doc_per_cluster(spark):
    """Cross-check against ts20's own per-doc output: for every reported
    cluster, the kept doc must carry the cluster's max score (lowest
    doc_id on ties) among ALL docs sharing that canonical URL."""
    scores = {
        r.doc_id: r.score_micro
        for r in REGISTRY["ts20_quality_classifier"].fn(spark, SF_MED).collect()
    }
    from xarray_sql_spark.queries.pipeline_ops import (
        _pl17_canon_expr,
        _pl17_url_expr,
    )
    from xarray_sql_spark.session import table

    curls = {
        r.doc_id: r.curl
        for r in table(spark, SF_MED, "documents")
        .selectExpr("doc_id", f"{_pl17_url_expr('spark')} AS url")
        .selectExpr("doc_id", f"{_pl17_canon_expr('spark')} AS curl")
        .collect()
    }
    clusters: dict[str, list[int]] = {}
    for doc_id, cu in curls.items():
        clusters.setdefault(cu, []).append(doc_id)

    rows = REGISTRY["dd16_url_dedup"].fn(spark, SF_MED).collect()
    expected_multi = {cu for cu, ds in clusters.items() if len(ds) > 1}
    assert {r.curl for r in rows} == expected_multi
    for r in rows:
        members = clusters[r.curl]
        best = min(members, key=lambda d: (-scores[d], d))
        assert r.kept_doc == best, (r.curl, r.kept_doc, best)
        assert r.kept_score_micro == scores[best]
        assert r.n_docs == len(members)
        assert r.dropped_score_sum == sum(scores[d] for d in members) - scores[best]


# --- io11 ---------------------------------------------------------------------


def test_io11_content_length_framing_is_load_bearing(spark, tmp_path):
    """Payloads of doc_id % 5 == 0 embed the record separator + WARC
    magic mid-payload; the parser must recover them byte-exact (a
    regex/split parser would truncate at the embedded separator)."""
    from xarray_sql_spark.queries.io_formats import _WARC_DECOY

    texts = ["decoy bearing doc", "plain one", "plain two",
             "plain three", "plain four", "another decoy doc"]
    sf = _write_documents(tmp_path, texts)
    rows = {r.doc_id: r for r in
            REGISTRY["io11_warc_ingest"].fn(spark, sf).collect()}
    assert len(rows) == len(texts)
    for did, text in enumerate(texts):
        payload = text.encode()
        if did % 5 == 0:
            payload += _WARC_DECOY.encode()
        assert rows[did].content_length == len(payload), did
        assert rows[did].payload_md5 == hashlib.md5(payload).hexdigest(), did
        assert rows[did].shard == did % 8


def test_io11_warcinfo_records_are_skipped(spark, tmp_path):
    """Each shard file leads with a warcinfo record: exactly one response
    row per document must come back, nothing for the file headers."""
    sf = _write_documents(tmp_path, [f"doc {i} body" for i in range(20)])
    pdf = REGISTRY["io11_warc_ingest"].fn(spark, sf).toPandas()
    assert len(pdf) == 20
    assert sorted(pdf.doc_id) == list(range(20))
    assert pdf.uri.str.match(r"(?i)^https://").all()


# --- pl18 ---------------------------------------------------------------------


def test_pl18_tertiles_and_sampling_rates(spark):
    pdf = (
        REGISTRY["pl18_perplexity_buckets"].fn(spark, SF_MED).toPandas()
        .set_index("bucket")
    )
    assert set(pdf.index) == {"head", "middle", "tail"}
    n = pdf.n_docs.sum()
    # corpus-relative tertiles: buckets within one doc of n/3
    assert all(abs(v - n / 3) <= 1 for v in pdf.n_docs)
    # CCNet keep profile: all of head, ~1/2 of middle, ~1/10 of tail
    assert pdf.loc["head"].n_kept == pdf.loc["head"].n_docs
    mid_rate = pdf.loc["middle"].n_kept / pdf.loc["middle"].n_docs
    tail_rate = pdf.loc["tail"].n_kept / pdf.loc["tail"].n_docs
    assert 0.3 < mid_rate < 0.7
    assert tail_rate < mid_rate
    # buckets are ordered by surprisal by construction
    assert (
        pdf.loc["head"].mean_surprisal
        <= pdf.loc["middle"].mean_surprisal
        <= pdf.loc["tail"].mean_surprisal
    )
