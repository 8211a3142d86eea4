"""Round-12 late additions: ts21 unicode normalization, io12 Arrow IPC
ingest, gr04 label-propagation communities.

The oracle sweep (test_oracle_queries) proves Spark == DuckDB on the real
fixture; these tests prove the operators compute the RIGHT thing — the
planted unicode defects are counted where (and only where) they were
planted, the cleaned text matches an independent Python normalization,
the IPC reader really walks multiple record batches, and LPA communities
never leak across connected components."""

from __future__ import annotations

import math
import re
import unicodedata

from tests.conftest import SF_MED
from xarray_sql_spark.queries import REGISTRY

# --- ts21 ---------------------------------------------------------------------

_CTRL = re.compile("[\x00-\x08\x0b\x0c\x0e-\x1f\x7f\u200b\ufeff]")


def _dirty(doc_id: int, text: str) -> str:
    s = ("\u00c3\u00a9 " if doc_id % 4 == 0 else "") + text
    if doc_id % 3 == 0:
        s += " cafe\u0301 nai\u0308ve"
    if doc_id % 5 == 0:
        s += "\u0007\u200b"
    return s


def test_ts21_defects_are_counted_exactly_where_planted(spark):
    pdf = REGISTRY["ts21_unicode_normalize"].fn(spark, SF_MED).toPandas()
    assert len(pdf) == 500
    for row in pdf.itertuples():
        did = int(row.doc_id)
        assert row.nfc_delta == (2 if did % 3 == 0 else 0), did
        assert row.is_nfc == (0 if did % 3 == 0 else 1), did
        assert row.n_moji == (1 if did % 4 == 0 else 0), did
        assert row.n_stripped == (2 if did % 5 == 0 else 0), did


def test_ts21_clean_md5_matches_independent_python(spark):
    """Recompute the full clean pipeline (plant -> NFC -> strip) in plain
    Python over the raw parquet and require byte-identical md5s — this
    pins the Spark pandas-UDF path against a THIRD implementation, not
    just against DuckDB's utf8proc."""
    import hashlib

    import duckdb

    raw = dict(
        duckdb.connect()
        .execute(f"SELECT doc_id, text FROM '{SF_MED}/documents.parquet'")
        .fetchall()
    )
    pdf = REGISTRY["ts21_unicode_normalize"].fn(spark, SF_MED).toPandas()
    for row in pdf.itertuples():
        did = int(row.doc_id)
        cleaned = _CTRL.sub("", unicodedata.normalize("NFC", _dirty(did, raw[did])))
        assert row.clean_md5 == hashlib.md5(cleaned.encode()).hexdigest(), did


# --- io12 ---------------------------------------------------------------------


def test_io12_multi_batch_framing_is_exercised_and_exact(spark):
    from xarray_sql_spark.queries.io_formats import _IPC_BATCH, _IPC_SHARDS

    pdf = REGISTRY["io12_arrow_ipc_ingest"].fn(spark, SF_MED).toPandas()
    assert len(pdf) == _IPC_SHARDS
    # at sf0.01 every shard holds ~62 docs: more than one 32-row batch
    assert int(pdf.n_batches.max()) >= 2
    for row in pdf.itertuples():
        assert row.n_batches == math.ceil(row.n_docs / _IPC_BATCH), row


# --- gr04 ---------------------------------------------------------------------


def test_gr04_communities_never_cross_connected_components(spark):
    """LPA labels propagate along edges only, so every community must sit
    entirely inside one cc01 connected component (communities REFINE
    components, never merge them)."""
    from xarray_sql_spark.operators.components import dedup_assignment
    from xarray_sql_spark.queries.dedup_lsh import dd04_minhash_lsh

    lpa = REGISTRY["gr04_label_propagation"].fn(spark, SF_MED).toPandas()
    pairs = dd04_minhash_lsh(spark, SF_MED).select("doc_a", "doc_b")
    comp = {
        int(r.doc_id): int(r.keeper_doc_id)
        for r in dedup_assignment(pairs).collect()
    }
    for row in lpa.itertuples():
        assert comp[int(row.doc_id)] == comp[int(row.community)], row
    # and the size column is consistent with the labeling itself
    sizes = lpa.groupby("community").size()
    for row in lpa.itertuples():
        assert row.community_size == sizes[row.community]


def test_gr04_is_deterministic_across_runs(spark):
    a = REGISTRY["gr04_label_propagation"].fn(spark, SF_MED).toPandas()
    b = REGISTRY["gr04_label_propagation"].fn(spark, SF_MED).toPandas()
    assert a.equals(b)


# --- hh04 ---------------------------------------------------------------------


def test_hh04_estimates_track_exact_within_kmv_error(spark):
    """KMV standard error is ~1/sqrt(k) ~= 8.8% at k=128; require every
    per-source and per-union estimate within 4 sigma of its exact twin
    (the sketch is deterministic, so this is a fixed property of the
    fixture, not a flaky statistical bound)."""
    pdf = REGISTRY["hh04_kmv_set_ops"].fn(spark, SF_MED).toPandas()
    assert len(pdf) == 190  # C(20,2) source pairs
    for row in pdf.itertuples():
        assert abs(row.est_a - row.exact_a) / row.exact_a < 0.35, row
        assert abs(row.est_b - row.exact_b) / row.exact_b < 0.35, row
        assert abs(row.est_union - row.exact_union) / row.exact_union < 0.35, row
    # inclusion-exclusion algebra holds on the emitted (rounded) numbers
    for row in pdf.itertuples():
        assert row.est_intersect == max(0, row.est_a + row.est_b - row.est_union)


def test_hh04_planted_containment(spark, tmp_path):
    """If source B's documents are a subset of source A's, the exact
    intersection must equal B's vocabulary and the union must equal
    A's — and the sketch estimates must agree exactly here because both
    vocabularies are far below k (sketch == set)."""
    from tests.test_pipeline_semantics import _write_documents

    a_docs = [" ".join(f"w{i}a w{i}b w{i}c" for i in range(j, j + 6)) for j in range(8)]
    b_docs = a_docs[:3]
    sf = _write_documents(
        tmp_path,
        a_docs + b_docs,
        sources=["A"] * len(a_docs) + ["B"] * len(b_docs),
    )
    pdf = REGISTRY["hh04_kmv_set_ops"].fn(spark, sf).toPandas()
    assert len(pdf) == 1
    r = pdf.iloc[0]
    assert r.source_a == "A" and r.source_b == "B"
    assert r.exact_intersect == r.exact_b  # containment
    assert r.exact_union == r.exact_a
    # unsaturated sketches are exact
    assert r.est_a == r.exact_a and r.est_b == r.exact_b
    assert r.est_union == r.exact_union and r.est_intersect == r.exact_intersect


# --- pl19 ---------------------------------------------------------------------


def test_pl19_temperature_flattens_toward_low_resource(spark):
    pdf = REGISTRY["pl19_temperature_sampling"].fn(spark, SF_MED).toPandas()
    assert abs(pdf.p_natural.sum() - 1.0) < 1e-4
    assert abs(pdf.q_target.sum() - 1.0) < 1e-4
    # alpha < 1 compresses shares: rarest lang gains, richest loses
    lo = pdf.loc[pdf.p_natural.idxmin()]
    hi = pdf.loc[pdf.p_natural.idxmax()]
    assert lo.q_target > lo.p_natural and hi.q_target < hi.p_natural
    # keep rates anti-monotone in natural share; argmax lang keeps all
    srt = pdf.sort_values("p_natural")
    assert list(srt.keep_micro) == sorted(srt.keep_micro, reverse=True)
    assert srt.keep_micro.iloc[0] == 1000000
    # realized keep fraction tracks the threshold (md5 residue is uniform)
    for row in pdf.itertuples():
        assert abs(row.kept_docs / row.n_docs - row.keep_micro / 1e6) < 0.15, row


# --- pl20 ---------------------------------------------------------------------


def test_pl20_epochs_are_distinct_permutations_of_the_same_set(spark):
    pdf = REGISTRY["pl20_epoch_shuffle"].fn(spark, SF_MED).toPandas()
    from xarray_sql_spark.queries.pipeline_ops import _PL20_EPOCHS, _PL20_SHARDS

    assert len(pdf) == len(_PL20_EPOCHS) * _PL20_SHARDS
    by_epoch = {e: g for e, g in pdf.groupby("epoch")}
    e1, e2 = (by_epoch[e] for e in _PL20_EPOCHS)
    # same multiset each epoch: doc counts and the epoch-level xor agree
    assert e1.n_docs.sum() == e2.n_docs.sum() == 500
    xor1 = 0
    for v in e1.set_fp:
        xor1 ^= int(v)
    xor2 = 0
    for v in e2.set_fp:
        xor2 ^= int(v)
    assert xor1 == xor2  # union over shards is the same doc_id set
    # but the ORDER differs between epochs (different seed -> new perm)
    assert set(e1.order_fp) != set(e2.order_fp)
    # reshuffle balance: no shard more than 40% off the uniform share
    for g in (e1, e2):
        mean = g.n_docs.mean()
        assert (abs(g.n_docs - mean) / mean).max() < 0.4


def test_pl20_is_reproducible(spark):
    a = REGISTRY["pl20_epoch_shuffle"].fn(spark, SF_MED).toPandas()
    b = REGISTRY["pl20_epoch_shuffle"].fn(spark, SF_MED).toPandas()
    assert a.equals(b)


# --- ts21 property differential (engine-pair pin, no Spark needed) -----------
# The query's cross-engine claim reduces to: Python unicodedata (what the
# pandas UDF executes) and DuckDB's utf8proc (what the oracle executes)
# produce byte-identical NFC over the text domain the pipeline feeds them.
# Fuzz that pair directly over a hostile alphabet -- ASCII, Latin-1
# letters, standalone and COMBINING diacritics (the NFD compositions NFC
# must fold), controls, zero-width chars -- far beyond the fixture's
# planted defects.

import hypothesis.strategies as st
from hypothesis import given, settings

_TS21_ALPHABET = (
    "abcdefghijklmnopqrstuvwxyz 0123456789"
    "\u00e9\u00ef\u00c3\u00a9\u00fc\u00f1"  # composed accents + mojibake pair
    "\u0301\u0308\u0327\u0300"  # combining marks (NFD material)
    "\u0007\u0001\u001f\u200b\ufeff"  # controls + zero-width
)


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=_TS21_ALPHABET, max_size=60))
def test_ts21_python_and_duckdb_normalizers_agree(text):
    import duckdb
    import hashlib

    from xarray_sql_spark.queries.pipeline_ops import _TS21_CTRL_DUCK

    py_clean = _CTRL.sub("", unicodedata.normalize("NFC", text))
    got = duckdb.connect().execute(
        "SELECT md5(regexp_replace(nfc_normalize(?), ?, '', 'g'))",
        [text, _TS21_CTRL_DUCK],
    ).fetchone()[0]
    assert got == hashlib.md5(py_clean.encode()).hexdigest(), repr(text)


# --- degenerate / hostile fixtures -------------------------------------------


def _compare_docs_only(spark_df, oracle_sql, sf_dir):
    """compare(), but binding only the documents view — tmp fixtures
    written by _write_documents carry no other tables."""
    import duckdb

    from tests.oracle_harness import _canon_frame

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    want = con.execute(oracle_sql).df()
    got = spark_df.toPandas()
    assert sorted(got.columns) == sorted(want.columns)
    assert _canon_frame(got) == _canon_frame(want)



def test_io12_ipc_roundtrip_survives_hostile_strings(spark, tmp_path):
    """Quotes, newlines, tabs, unicode, and empty text must ride the
    Arrow IPC cycle untouched — the digest compares against the DuckDB
    oracle over the ORIGINAL parquet, so any writer/reader mangling
    hash-mismatches."""
    from tests.test_pipeline_semantics import _write_documents

    texts = [
        'he said "hi,"\nthen left',
        "tab\there",
        "café naïve ​",
        "",
        "plain words",
        "a,b,c|d;e",
    ]
    sf = _write_documents(tmp_path, texts)
    spec = REGISTRY["io12_arrow_ipc_ingest"]
    _compare_docs_only(spec.fn(spark, sf), spec.oracle, sf)


def test_pl19_single_language_corpus_keeps_everything(spark, tmp_path):
    """Degenerate mixture: with one language, p == q == 1, the keep rate
    is exactly 1.0, and every document survives — no NULL/div-by-zero
    from the normalizing ratios (the pl16-divisor class of bug)."""
    from tests.test_pipeline_semantics import _write_documents

    sf = _write_documents(tmp_path, [f"word{i} filler text" for i in range(20)])
    pdf = REGISTRY["pl19_temperature_sampling"].fn(spark, sf).toPandas()
    assert len(pdf) == 1
    r = pdf.iloc[0]
    assert r.keep_micro == 1000000
    assert r.kept_docs == r.n_docs == 20
    assert r.kept_tokens == r.sum_tokens


def test_gr04_empty_graph_yields_empty_communities(spark, tmp_path):
    """A corpus with no near-duplicate candidate pairs has no LPA
    universe: the operator must return zero rows (and agree with the
    oracle) rather than erroring on the empty edge set."""
    from tests.test_pipeline_semantics import _write_documents

    texts = [
        " ".join(f"u{d}w{i}" for i in range(40)) for d in range(6)
    ]  # fully disjoint vocabularies: no shared shingles, no pairs
    sf = _write_documents(tmp_path, texts)
    spec = REGISTRY["gr04_label_propagation"]
    df = spec.fn(spark, sf)
    assert df.count() == 0
    _compare_docs_only(df, spec.oracle, sf)


# --- ss16 ---------------------------------------------------------------------


def test_ss16_rrf_arithmetic_and_membership_invariants(spark):
    from xarray_sql_spark.queries.pipeline_ops import _RRF_K, _RRF_TOPK

    pdf = REGISTRY["ss16_hybrid_rrf"].fn(spark, SF_MED).toPandas()
    assert set(pdf.query_id) == {1, 2, 3}
    for row in pdf.itertuples():
        # fused score is exactly the integer RRF of the leg ranks
        want = 0
        if row.lex_rank == row.lex_rank and row.lex_rank is not None:  # not NaN
            want += 1000000 // (_RRF_K + int(row.lex_rank))
        if row.vec_rank == row.vec_rank and row.vec_rank is not None:
            want += 1000000 // (_RRF_K + int(row.vec_rank))
        assert row.rrf_micro == want, row
        # every fused row came from at least one leg's top list
        assert want > 0
    for _, g in pdf.groupby("query_id"):
        assert list(g.fused_rank) == list(range(1, len(g) + 1))
        assert len(g) <= _RRF_TOPK
        # fused order is non-increasing in rrf_micro
        assert list(g.rrf_micro) == sorted(g.rrf_micro, reverse=True)


def test_ss16_both_leg_docs_beat_single_leg_docs_at_equal_rank(spark):
    """A doc holding rank r in BOTH legs must out-score any doc holding
    rank r in only one leg — the defining property RRF is used for."""
    pdf = REGISTRY["ss16_hybrid_rrf"].fn(spark, SF_MED).toPandas()
    both = pdf[(pdf.lex_rank.notna()) & (pdf.vec_rank.notna())]
    single = pdf[pdf.lex_rank.isna() | pdf.vec_rank.isna()]
    for b in both.itertuples():
        r = max(int(b.lex_rank), int(b.vec_rank))
        for s_ in single.itertuples():
            sr = int(s_.lex_rank if s_.lex_rank == s_.lex_rank else s_.vec_rank)
            if sr >= r:
                assert b.rrf_micro > s_.rrf_micro, (b, s_)


# --- dd17 / ts22 ---------------------------------------------------------------


def test_dd17_flags_planted_absorbed_document(spark, tmp_path):
    """A short doc whose text is a verbatim slice of a long doc must
    surface with containment 1.0 in the short->long direction while
    Jaccard stays well below 1 — the exact case Jaccard-only dedup
    misses."""
    from tests.test_pipeline_semantics import _write_documents

    long_doc = " ".join(f"w{i}" for i in range(60))
    short_doc = " ".join(f"w{i}" for i in range(20, 32))  # verbatim slice
    other = " ".join(f"z{i}" for i in range(40))
    sf = _write_documents(tmp_path, [long_doc, short_doc, other])
    pdf = REGISTRY["dd17_containment_neardup"].fn(spark, sf).toPandas()
    assert len(pdf) == 1
    r = pdf.iloc[0]
    assert (r.doc_a, r.doc_b) == (0, 1)
    assert r.cont_b_in_a == 1.0  # the short doc is fully contained
    assert r.jaccard < 0.25  # which Jaccard alone would have missed
    assert r.direction == "b_in_a"


def test_dd17_containment_dominates_jaccard_everywhere(spark):
    pdf = REGISTRY["dd17_containment_neardup"].fn(spark, SF_MED).toPandas()
    assert len(pdf) > 0  # non-vacuous on the driver fixture
    for row in pdf.itertuples():
        assert max(row.cont_a_in_b, row.cont_b_in_a) >= row.jaccard - 1e-9


def test_ts22_planted_collocation_tops_the_ranking(spark, tmp_path):
    """Two invented words that ONLY ever appear together (6 docs) must
    out-PMI every organic pair, with the exact analytic score
    ln(cab * N / (ca * cb)) = ln(N / 6)."""
    import math

    from tests.test_pipeline_semantics import _write_documents

    filler = [
        " ".join(f"f{d}w{i}" for i in range(12)) + " common core words here"
        for d in range(24)
    ]
    planted = [f"zuzu qixi doc{d} common core" for d in range(6)]
    sf = _write_documents(tmp_path, filler + planted)
    pdf = REGISTRY["ts22_pmi_collocations"].fn(spark, sf).toPandas()
    top = pdf.iloc[0]
    assert {top.word_a, top.word_b} == {"zuzu", "qixi"}
    assert top.n_docs_both == top.n_docs_a == top.n_docs_b == 6
    want = round(math.log(6 * 30 / (6 * 6)), 6)
    assert abs(top.pmi - want) < 1e-9


# --- ev23 ---------------------------------------------------------------------


def test_ev23_late_counts_are_monotone_and_actionable(spark):
    """More watermark slack can only drop fewer events; the fixture's
    planted 32-position jitter must be fully absorbed by the 4 h delay
    (the audit's actionable answer), while 10 min must drop a
    substantial share — the audit is non-vacuous in both directions."""
    pdf = REGISTRY["ev23_watermark_audit"].fn(spark, SF_MED).toPandas()
    r = pdf.iloc[0]
    assert r.n_total == 10000
    assert r.late_600s >= r.late_3600s >= r.late_14400s
    assert r.late_600s > 1000  # short delay visibly lossy
    assert r.late_14400s == 0  # 4 h absorbs the planted reorder
    for d in (600, 3600, 14400):
        assert r[f"pct_{d}s"] == round(r[f"late_{d}s"] / r.n_total, 6)


# --- sk05 / hh05 ---------------------------------------------------------------


def test_sk05_report_is_internally_consistent(spark):
    pdf = REGISTRY["sk05_skew_report"].fn(spark, SF_MED).toPandas()
    r = pdf.iloc[0]
    assert r.p50_rows <= r.p90_rows <= r.p99_rows <= r.top1_rows
    assert r.n_rows == 10000
    assert abs(r.skew_ratio - r.top1_rows * r.n_keys / r.n_rows) < 1e-6
    assert r.recommended_salt == -(-r.top1_rows // r.p50_rows)  # ceil div
    assert r.recommended_salt >= 1


def test_sk05_detects_a_planted_hot_key(spark):
    """Recompute the hottest key independently from the raw parquet and
    require the report to name exactly it (min key on ties)."""
    import duckdb

    truth = duckdb.connect().execute(
        f"""SELECT user_id, count(*) c FROM '{SF_MED}/events.parquet'
            GROUP BY user_id ORDER BY c DESC, user_id LIMIT 1"""
    ).fetchone()
    r = REGISTRY["sk05_skew_report"].fn(spark, SF_MED).toPandas().iloc[0]
    assert (r.top1_key, r.top1_rows) == truth


def test_hh05_decay_reweights_against_raw_counts(spark):
    """The decayed ranking must differ from the raw-count ranking in a
    principled way: every decayed score is <= the user's raw count
    (weights <= 1) and > 0, and a user whose events are all in the most
    recent half-life scores exactly their count."""
    pdf = REGISTRY["hh05_decayed_heavy_hitters"].fn(spark, SF_MED).toPandas()
    assert len(pdf) == 20
    assert list(pdf["rank"]) == list(range(1, 21))
    for row in pdf.itertuples():
        assert 0 < row.decayed <= row.n_events + 1e-9
    # ordering is by decayed mass, not raw counts
    assert list(pdf.decayed) == sorted(pdf.decayed, reverse=True)


def test_hh05_survives_events_older_than_64_halflives(spark, tmp_path):
    """A 500-day-old event is > 64 half-lives back: unclamped, DuckDB's
    bigint shift raises and Spark's shiftleft silently wraps mod 64
    (weighting the ancient event as if it were fresh). The clamp at 62
    must keep BOTH engines defined and hash-identical."""
    import os

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tests.oracle_harness import _canon_frame

    base = 1700000000_000000  # epoch micros
    day = 86400 * 1000000
    rows = [
        (1, base, 7, "click", 1.0, "{}"),
        (2, base - day * 3, 7, "click", 1.0, "{}"),
        (3, base - day * 500, 9, "click", 1.0, "{}"),  # ancient
        (4, base, 9, "click", 1.0, "{}"),
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    pq.write_table(t, os.path.join(str(tmp_path), "events.parquet"))
    spec = REGISTRY["hh05_decayed_heavy_hitters"]
    got = spec.fn(spark, str(tmp_path)).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp_path}/events.parquet')"
    )
    want = con.execute(spec.oracle).df()
    assert _canon_frame(got) == _canon_frame(want)
    by_user = {int(r.user_id): r for r in got.itertuples()}
    # user 9's ancient event contributes ~2^-71 -> effectively nothing
    assert by_user[9].decayed < 1.000001
    assert by_user[7].decayed > 1.1  # fresh + 3-day-old both count


# --- ts23 / ev24 ---------------------------------------------------------------


def test_ts23_calibration_is_monotone_in_confidence(spark):
    """Higher margin must not mean WORSE accuracy at the extremes — the
    property that makes the curve usable as a threshold; and the bucket
    populations must partition the corpus."""
    pdf = REGISTRY["ts23_langid_calibration"].fn(spark, SF_MED).toPandas()
    assert pdf.n_docs.sum() == 500
    assert (pdf.n_correct <= pdf.n_docs).all()
    lo = pdf.iloc[0]
    hi = pdf.iloc[-1]
    assert hi.margin_bucket > lo.margin_bucket
    assert hi.accuracy >= lo.accuracy
    for row in pdf.itertuples():
        assert row.accuracy == round(row.n_correct / row.n_docs, 6)


def test_ev24_halflife_matches_numpy_polyfit(spark):
    """The closed-form integer-scaled fit must agree with an independent
    numpy least-squares on the same micro-gridded points to ~1e-5."""
    import math

    import duckdb
    import numpy as np

    pdf = REGISTRY["ev24_retention_halflife"].fn(spark, SF_MED).toPandas()
    assert len(pdf) > 0
    cells = duckdb.connect().execute(
        f"""WITH f AS (SELECT user_id, ts,
                min(ts) OVER (PARTITION BY user_id) AS first_ts
                FROM '{SF_MED}/events.parquet')
            SELECT strftime(date_trunc('week', first_ts), '%Y-%m-%d') cw,
                   CAST(date_diff('day', date_trunc('week', first_ts),
                                  date_trunc('week', ts)) // 7 AS INT) k,
                   count(DISTINCT user_id) a
            FROM f GROUP BY 1, 2"""
    ).df()
    for row in pdf.itertuples():
        g = cells[cells.cw == row.cohort_week]
        size = int(g[g.k == 0].a.iloc[0])
        pts = g[(g.k >= 1) & (g.a > 0)]
        xs = pts.k.astype(float).to_numpy()
        ys = np.array(
            [round(math.log(a / size) * 1e6) / 1e6 for a in pts.a]
        )
        b = np.polyfit(xs, ys, 1)[0]
        assert abs(row.slope - b) < 1e-5, (row.cohort_week, row.slope, b)
        if row.slope < 0:
            assert abs(row.half_life_weeks - (-math.log(2) / b)) < 1e-3


def test_io13_ledger_is_exactly_once_on_hostile_content(spark, tmp_path):
    """Waves must partition the corpus exactly (no double-ingest, no
    gap) even when file contents are hostile; the docs-only oracle
    compare regenerates both waves from the parity rule."""
    from tests.test_pipeline_semantics import _write_documents

    texts = ['a "quoted" doc', "newline\nin body", "", "café ​", "plain", "x y z"]
    sf = _write_documents(tmp_path, texts)
    spec = REGISTRY["io13_ingest_manifest"]
    pdf = spec.fn(spark, sf).toPandas()
    assert list(pdf.wave) == [1, 2]
    # the empty doc cannot ride the blob path (zero-length files get no
    # file split — the documented boundary); all others partition 1/2
    assert pdf.n_files.sum() == len(texts) - 1
    _compare_docs_only(spec.fn(spark, sf), spec.oracle, sf)


# --- ts24 ---------------------------------------------------------------------


def test_ts24_kn_matches_independent_python_model(spark, tmp_path):
    """Recompute interpolated KN (d=0.75) in plain Python over a small
    planted corpus and require per-doc agreement to the 1e-6 grid —
    pinning the smoothing arithmetic against a third implementation,
    and checking KN's defining continuation behavior: a word seen often
    but only in ONE context gets a lower continuation share than a
    word seen in many contexts."""
    import math
    from collections import Counter, defaultdict

    from tests.test_pipeline_semantics import _write_documents

    texts = [
        "san francisco is big",
        "san francisco bay",
        "the city is big",
        "the bay is cold",
    ]
    sf = _write_documents(tmp_path, texts)
    pdf = REGISTRY["ts24_kneser_ney_surprisal"].fn(spark, sf).toPandas()
    c2: Counter = Counter()
    for t in texts:
        ws = t.split(" ")
        for a, b in zip(ws, ws[1:]):
            c2[(a, b)] += 1
    cv: dict = defaultdict(int)
    n1p_left: dict = defaultdict(int)
    n1p_right: dict = defaultdict(int)
    for (a, b), c in c2.items():
        cv[a] += c
        n1p_left[a] += 1
        n1p_right[b] += 1
    nbt = len(c2)

    def p_kn(a, b):
        return max(c2[(a, b)] - 0.75, 0.0) / cv[a] + (
            0.75 * n1p_left[a] / cv[a]
        ) * (n1p_right[b] / nbt)

    for i, t in enumerate(texts):
        ws = t.split(" ")
        micros = [round(-math.log(p_kn(a, b)) * 1e6) for a, b in zip(ws, ws[1:])]
        want = round(sum(micros) / (len(micros) * 1e6), 6)
        got = float(pdf[pdf.doc_id == i].kn_surprisal.iloc[0])
        assert abs(got - want) < 1e-9, (i, got, want)
    # continuation behavior: "francisco" completes only 1 context;
    # "is" completes 2 -> francisco's continuation share is lower
    assert n1p_right["francisco"] < n1p_right["is"]


# --- pl21 ---------------------------------------------------------------------


def test_pl21_importance_prefers_the_target_domain(spark):
    """DSIR's defining behavior: documents from the target domain (en)
    must be over-represented in the selected quarter relative to their
    corpus share, and selection must be exactly the top quarter by
    (score, doc_id)."""
    pdf = REGISTRY["pl21_dsir_selection"].fn(spark, SF_MED).toPandas()
    n = len(pdf)
    kept = pdf[pdf.selected == 1]
    assert len(kept) == -(-n // 4)  # ceil(n/4)
    en_share_corpus = (pdf.lang == "en").mean()
    en_share_kept = (kept.lang == "en").mean()
    assert en_share_kept > en_share_corpus  # target domain up-weighted
    # the keep set is exactly the score-ranked head
    srt = pdf.sort_values(["dsir_micro", "doc_id"], ascending=[False, True])
    assert set(srt.head(len(kept)).doc_id) == set(kept.doc_id)


def test_pl21_scores_match_independent_python(spark, tmp_path):
    """Recompute the hashed-bigram importance model in plain Python on a
    planted two-domain corpus and require exact integer agreement."""
    import hashlib as _h
    import math
    from collections import Counter

    from tests.test_pipeline_semantics import _write_documents

    tgt = [f"good clean prose {i} sample" for i in range(4)]
    raw = [f"spam spam buy {i} now" for i in range(4)]
    sf = _write_documents(
        tmp_path, tgt + raw, langs=["en"] * 4 + ["de"] * 4
    )
    pdf = REGISTRY["pl21_dsir_selection"].fn(spark, sf).toPandas()

    def bucket(b):
        return int(_h.md5(b.encode()).hexdigest()[:15], 16) % 64

    ct: Counter = Counter()
    cr: Counter = Counter()
    feats = {}
    for i, t in enumerate(tgt + raw):
        ws = t.split(" ")
        ks = [bucket(f"{a} {b}") for a, b in zip(ws, ws[1:])]
        feats[i] = ks
        for k in ks:
            cr[k] += 1
            if i < 4:
                ct[k] += 1
    tt, tr = sum(ct.values()), sum(cr.values())
    smicro = {
        k: round(
            math.log(((ct[k] + 1) / (tt + 64)) / ((cr[k] + 1) / (tr + 64)))
            * 1e6
        )
        for k in range(64)
    }
    for row in pdf.itertuples():
        want = sum(smicro[k] for k in feats[int(row.doc_id)])
        assert int(row.dsir_micro) == want, (row.doc_id, row.dsir_micro, want)
    # target-domain docs score above spam docs
    assert pdf[pdf.lang == "en"].dsir_micro.min() > pdf[pdf.lang == "de"].dsir_micro.max()
