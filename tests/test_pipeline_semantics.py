"""Semantic grounding for the round-7 second-wave pipeline ops.

The oracle sweep proves Spark == DuckDB on the same arithmetic; these
tests prove the arithmetic finds PLANTED signals: a shared span makes a
dd10 pair, a duplicated document zeroes ts12 novelty, exact duplicates
can never straddle a pl09 split, rule violations trip exactly the ts09
flag they should. Fixtures are tiny crafted documents.parquet dirs fed
through the registry entries' own (spark, sf_dir) contract."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_SMALL
from xarray_sql_spark.queries import REGISTRY


def _write_documents(tmp_path, texts: list[str], langs=None, sources=None) -> str:
    langs = langs or ["en"] * len(texts)
    sources = sources or ["src0"] * len(texts)
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array([len(s) for s in texts], pa.int64()),
        }
    )
    pq.write_table(t, os.path.join(str(tmp_path), "documents.parquet"))
    return str(tmp_path)


def _words(prefix: str, n: int) -> list[str]:
    return [f"{prefix}{i}" for i in range(n)]


def test_dd10_finds_planted_shared_span(spark, tmp_path):
    """Two documents sharing an exact 12-word span (= 5 word-8-grams)
    must pair with n_shared = 5; unrelated documents must not pair."""
    span = _words("shared", 12)
    doc_a = _words("alpha", 10) + span + _words("tailone", 10)
    doc_b = _words("beta", 7) + span + _words("tailtwo", 4)
    doc_c = _words("gamma", 30)
    sf = _write_documents(
        tmp_path, [" ".join(doc_a), " ".join(doc_b), " ".join(doc_c)]
    )
    rows = REGISTRY["dd10_shared_span_pairs"].fn(spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.doc_a, r.doc_b, r.n_shared) == (0, 1, 5)
    # containment = 5 / min(n_grams): doc_b has 23 words -> 16 grams
    assert r.containment == round(5 / 16, 6)


def test_ts12_duplicate_doc_has_zero_novelty(spark, tmp_path):
    """A verbatim duplicate's every 8-gram occurs elsewhere -> novelty 0;
    a fully unique document scores novelty 1."""
    dup = " ".join(_words("copy", 20))
    uniq = " ".join(_words("lonely", 20))
    sf = _write_documents(tmp_path, [dup, dup, uniq])
    out = {
        r.doc_id: r
        for r in REGISTRY["ts12_memorization_score"].fn(spark, sf).collect()
    }
    assert out[0].novelty == 0.0 and out[1].novelty == 0.0
    assert out[2].novelty == 1.0
    assert out[0].n_grams == 13  # 20 words -> 13 distinct 8-grams


def test_ts09_rules_trip_individually(spark, tmp_path):
    """Each crafted violation flips exactly its own flag: doc 0 is clean,
    doc 1 too short, doc 2 has no stopwords, doc 3 is one repeated word
    (diversity floor)."""
    clean = " ".join(["the", "a"] + _words("ok", 38))
    short = " ".join(["the", "a"] + _words("tiny", 8))
    nostop = " ".join(_words("warm", 40))
    repet = " ".join(["the", "a"] + ["dupe"] * 48)
    sf = _write_documents(tmp_path, [clean, short, nostop, repet])
    out = {r.doc_id: r for r in REGISTRY["ts09_gopher_rules"].fn(spark, sf).collect()}
    assert (out[0].ok_len, out[0].ok_stop, out[0].ok_diverse, out[0].keep) == (1, 1, 1, 1)
    assert (out[1].ok_len, out[1].keep) == (0, 0)
    assert (out[2].ok_stop, out[2].keep) == (0, 0)
    assert (out[3].ok_diverse, out[3].keep) == (0, 0)
    for r in out.values():  # no fixture trips the word-length rule
        assert r.ok_wordlen == 1


def test_ts10_rare_vocabulary_scores_higher_surprisal(spark, tmp_path):
    """A document of corpus-common words must score strictly lower
    surprisal than one of corpus-unique words."""
    common = " ".join(["base"] * 30)
    filler = [" ".join(["base"] * 30)] * 8  # make 'base' dominate the LM
    rare = " ".join(_words("hapax", 30))
    sf = _write_documents(tmp_path, [common, rare, *filler])
    out = {
        r.doc_id: r.surprisal
        for r in REGISTRY["ts10_unigram_surprisal"].fn(spark, sf).collect()
    }
    assert out[0] < out[1]


def test_pl09_exact_duplicates_never_straddle_split(spark, tmp_path):
    """Verbatim duplicates form a MinHash component, so pl09 must give
    them one split and the component-min keeper; the split decision
    must equal the pl02 bucket of the KEEPER id for every member."""
    dup = " ".join(_words("twin", 40))
    others = [" ".join(_words(f"solo{k}", 40)) for k in range(4)]
    sf = _write_documents(tmp_path, [dup, dup, *others])
    rows = REGISTRY["pl09_leakage_free_split"].fn(spark, sf).collect()
    by_id = {r.doc_id: r for r in rows}
    assert by_id[0].keeper_doc_id == 0 and by_id[1].keeper_doc_id == 0
    assert by_id[0].split == by_id[1].split
    for r in rows:  # singletons keep themselves
        if r.doc_id > 1:
            assert r.keeper_doc_id == r.doc_id


def test_ts11_planted_dominant_pair_wins(spark, tmp_path):
    """A corpus dominated by one repeated word must rank that word's
    leading character pair first (frequency-weighted counts)."""
    texts = [" ".join(["zz" + "qx" * 3] * 50)] * 4 + [" ".join(_words("mix", 30))]
    sf = _write_documents(tmp_path, texts)
    rows = REGISTRY["ts11_bpe_pair_stats"].fn(spark, sf).collect()
    top = rows[0]
    # word 'zzqxqxqx' x 200 occurrences: pair 'qx' appears 3x per word
    # (positions 3,5,7) -> 600, beating 'zz' (200) and every mixN pair.
    assert top.pair == "qx" and top.total == 600


def test_pl10_copies_bracket_the_planned_factor(spark, tmp_path):
    """Every document's realized copy count must be floor(f8/8) or
    ceil(f8/8) for its source's factor, and the per-source emitted total
    must land between n_docs*floor and n_docs*ceil — the fractional-epoch
    contract."""
    texts = [" ".join(_words(f"doc{i}", 12)) for i in range(40)]
    sf = _write_documents(
        tmp_path, texts, sources=[f"s{i % 4}" for i in range(40)]
    )
    rows = REGISTRY["pl10_repetition_mixing"].fn(spark, sf).collect()
    assert len(rows) == 4
    for r in rows:
        lo, hi = r.factor_eighths // 8, -(-r.factor_eighths // 8)
        assert r.n_docs * lo <= r.n_emitted <= r.n_docs * hi, r


def test_ts13_budget_prefix_is_greedy_and_monotone(spark, tmp_path):
    """cum_tokens must be strictly increasing in output order, in_budget
    must be a prefix property (no 1 after a 0), and the flagged prefix
    must fit the budget."""
    from xarray_sql_spark.queries.pipeline_ops import _TS13_BUDGET

    texts = [" ".join(_words(f"w{i}", 20 + 30 * (i % 5))) for i in range(50)]
    sf = _write_documents(
        tmp_path, texts, sources=[f"s{i % 10}" for i in range(50)]
    )
    rows = REGISTRY["ts13_token_budget_fill"].fn(spark, sf).collect()
    cums = [r.cum_tokens for r in rows]
    assert cums == sorted(cums) and len(set(cums)) == len(cums)
    flags = [r.in_budget for r in rows]
    assert flags == sorted(flags, reverse=True)  # 1s then 0s
    in_budget = [r for r in rows if r.in_budget]
    if in_budget:
        assert in_budget[-1].cum_tokens <= _TS13_BUDGET


def test_ev12_funnel_counts_are_monotone_and_gaps_positive(spark):
    """Funnel step counts must be non-increasing and every gap sum
    non-negative (strictly-after semantics) on the real events table."""
    r = REGISTRY["ev12_funnel_conversion"].fn(spark, SF_SMALL).collect()[0]
    assert r.n_viewed >= r.n_clicked >= r.n_purchased > 0
    assert r.sum_view_to_click_us >= 0 and r.sum_click_to_buy_us >= 0


def test_ts14_vocab_growth_is_monotone_and_bounded(spark, tmp_path):
    """Cumulative vocabulary must be non-decreasing, never exceed
    cumulative tokens, and the final cum_vocab must equal the corpus'
    true distinct-word count."""
    texts = [
        " ".join(_words("common", 5) + _words(f"rare{i}", i % 3)) for i in range(60)
    ]
    sf = _write_documents(tmp_path, texts)
    rows = REGISTRY["ts14_vocab_growth"].fn(spark, sf).collect()
    vocab = [r.cum_vocab for r in rows]
    assert vocab == sorted(vocab)
    for r in rows:
        assert r.cum_vocab <= r.cum_tokens
    truth = len({w for t in texts for w in t.split(" ")})
    assert rows[-1].cum_vocab == truth


def test_ss11_mmr_diversifies_a_planted_clone_cluster(spark, tmp_path):
    """Plant a query whose 4 nearest neighbors are near-clones of each
    other and one slightly-farther but diverse vector: plain top-3 would
    return three clones; MMR's rank-2/3 picks must include the diverse
    vector."""
    import numpy as np

    base = np.zeros(64); base[0] = 1.0
    clones = [base + 1e-3 * (i + 1) * np.eye(64)[1] for i in range(4)]
    diverse = np.zeros(64); diverse[0] = 0.9; diverse[32] = 0.8
    far = [np.full(64, 5.0 + i) for i in range(10)]
    vecs = [base] + clones + [diverse] + far
    # query ids in _PQ_QUERIES are (10, 200, 390); put the query at id 10
    ids, embs = [], []
    for i, v in enumerate(vecs):
        ids.append(10 if i == 0 else (0 if i == 1 else i + 100))
        embs.append([float(x) for x in v])
    t = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array(embs, pa.list_(pa.float32())),
        "label": pa.array([0] * len(ids), pa.int32()),
    })
    pq.write_table(t, os.path.join(str(tmp_path), "embeddings.parquet"))
    rows = REGISTRY["ss11_mmr_diversify"].fn(spark, str(tmp_path)).collect()
    mine = [r for r in rows if r.query_id == 10]
    assert [r.rank for r in mine] == [1, 2, 3]
    assert mine[0].vec_id == 10  # the query itself is its own nearest
    picked = {r.vec_id for r in mine}
    diverse_id = ids[5]
    assert diverse_id in picked, f"MMR failed to diversify: {mine}"


def test_bloom_prefilter_cuts_rows_and_preserves_the_join(spark, tmp_path):
    """The bloom pre-pass must (a) drop most non-matching fact rows before
    the join and (b) leave the join result exactly equal to the plain
    join — false positives are allowed in the pruned set, never in the
    result."""
    from xarray_sql_spark.operators.skew import _bloom_probe, bloom_prefilter_join
    from pyspark.sql import functions as F

    big = spark.range(0, 20000).select(F.col("id").alias("k"), (F.col("id") % 7).alias("v"))
    small = spark.range(0, 20000, 400).select(F.col("id").alias("k"))  # 50 keys
    residues = small.select(_bloom_probe(small, "k", 4096).alias("r"))
    pruned_count = big.filter(
        _bloom_probe(big, "k", 4096).isin(
            [r["r"] for r in residues.distinct().collect()]
        )
    ).count()
    assert pruned_count < 20000 * 0.05  # <=50/4096 slots hit ~ 1.2% expected
    got = sorted(tuple(r) for r in bloom_prefilter_join(big, small, "k").collect())
    want = sorted(tuple(r) for r in big.join(small, "k").collect())
    assert got == want and len(want) == 50


def test_io_roundtrips_survive_hostile_strings(spark, tmp_path):
    """JSONL and CSV cycles must preserve delimiters, quotes, unicode and
    (JSONL only) embedded newlines — the characters raw crawls actually
    contain. CSV's line-splittable contract excludes embedded newlines;
    that constraint is part of the format choice, not a bug."""
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq
    from xarray_sql_spark.queries.io_formats import _DOC_SCHEMA, _roundtrip

    nasty = [
        'comma, "quoted", more',
        "unicode: héllo wörld 你好 🚀",
        "tab\tand backslash \\ and 'single'",
        '"leading quote and trailing "',
    ]
    jsonl_only = ["embedded\nnewline"]

    def write(texts):
        t = pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["s0"] * len(texts), pa.string()),
            "n_chars": pa.array([len(s) for s in texts], pa.int64()),
        })
        d = os.path.join(str(tmp_path), f"n{len(texts)}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(t, os.path.join(d, "documents.parquet"))
        return d

    sf_json = write(nasty + jsonl_only)
    row = REGISTRY["io01_jsonl_roundtrip"].fn(spark, sf_json).collect()[0]
    assert row.n_docs == 5
    assert row.sum_text_len == sum(len(s) for s in nasty + jsonl_only)

    sf_csv = write(nasty)
    row = REGISTRY["io02_csv_roundtrip"].fn(spark, sf_csv).collect()[0]
    assert row.n_docs == 4
    assert row.sum_text_len == sum(len(s) for s in nasty)


def test_io_csv_distinguishes_null_from_empty_string(spark, tmp_path):
    """The CSV cycle must keep NULL and '' apart (writer nullValue=\\N +
    quoteAll): a lang of '' groups as '', a lang of NULL groups as NULL —
    conflating them would silently move documents between rollup groups."""
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["alpha beta", "gamma", "delta"], pa.string()),
        "lang": pa.array(["", None, "en"], pa.string()),
        "source": pa.array(["s0", "s0", "s0"], pa.string()),
        "n_chars": pa.array([10, 5, 5], pa.int64()),
    })
    pq.write_table(t, os.path.join(str(tmp_path), "documents.parquet"))
    for qname in ("io01_jsonl_roundtrip", "io02_csv_roundtrip"):
        rows = {r.lang: r.n_docs for r in REGISTRY[qname].fn(spark, str(tmp_path)).collect()}
        assert rows == {"": 1, None: 1, "en": 1}, (qname, rows)


def test_io_csv_sentinel_collision_is_a_known_format_boundary(spark, tmp_path):
    """Pin the documented CSV boundary: a value literally equal to the
    null sentinel reads back NULL even when quoted (univocity compares
    unquoted content). If a Spark upgrade ever changes this, the io02
    docstring should be updated — this test is the tripwire."""
    df = spark.createDataFrame([(0, "\\N"), (1, "x")], "id long, t string")
    out = str(tmp_path / "sentinel")
    opts = dict(header="true", quoteAll="true", escape='"', nullValue="\\N")
    df.write.mode("overwrite").options(**opts).csv(out)
    back = spark.read.options(**opts).schema("id long, t string").csv(out)
    got = {r.id: r.t for r in back.collect()}
    assert got == {0: None, 1: "x"}


def test_ev22_merge_path_is_nontrivial(spark):
    """The merge == rebuild proof is vacuous if the 90% cutoff puts the
    whole feed on one side — pin that BOTH halves are populated at the
    test SF (a nonempty pre-existing dimension AND a nonempty delta,
    with at least one open interval actually closed by the merge:
    some user must have versions on both sides of the cutoff)."""
    from pyspark.sql import functions as F

    from xarray_sql_spark.session import table

    e = table(spark, SF_SMALL, "events").filter(
        F.col("event_type") == "view"
    ).select("user_id", F.unix_micros("ts").alias("us"))
    mn, mx = e.agg(F.min("us"), F.max("us")).collect()[0]
    cutoff = mn + (mx - mn) * 9 // 10
    hist = e.filter(F.col("us") < cutoff)
    delta = e.filter(F.col("us") >= cutoff)
    n_hist, n_delta = hist.count(), delta.count()
    assert n_hist > 0 and n_delta > 0, (n_hist, n_delta)
    straddlers = hist.select("user_id").intersect(delta.select("user_id"))
    assert straddlers.count() > 0  # the interval-closing branch runs


def test_ev22_no_forced_dim_broadcast(spark):
    """first_new (the per-key first-version aggregate of the CDC delta) is
    data-dependent — one day of a 100-TB feed has 10⁷–10⁸ distinct keys —
    so its join must NOT carry a forced broadcast hint (r9 verdict). The
    only hinted broadcasts allowed in ev22's plan are the 1-row min/max
    cutoff cross joins; the interval-close join (LeftOuter on user_id)
    must be left to AQE's size-aware planning."""
    df = REGISTRY["ev22_scd2_merge"].fn(spark, SF_SMALL)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    for line in plan.splitlines():
        if "strategy=broadcast" in line:
            assert "Join Cross" in line, (
                f"forced broadcast outside the 1-row cutoff cross: {line}"
            )


def test_dd13_char_offsets_are_code_points_not_bytes(spark, tmp_path):
    """dd13's char_start/char_end are CHARACTER offsets: on non-ASCII text
    (multi-byte UTF-8 words) the offsets must still index code points and
    still match the DuckDB oracle — the r9 ADVICE divergence (oracle used
    byte-counting strlen) regressed exactly here. The planted span makes
    the duplicate region start after a multi-byte prefix, so a byte-based
    oracle would disagree; Python's len() (code points) is the referee."""
    import duckdb

    span = _words("répété", 9)  # one shared 9-word span -> 2 grams/doc
    prefix = ["naïve", "café", "übermaß"]
    doc_a = prefix + span
    doc_b = _words("βeta", 5) + span
    sf = _write_documents(tmp_path, [" ".join(doc_a), " ".join(doc_b)])
    spec = REGISTRY["dd13_dup_token_spans"]
    rows = spec.fn(spark, sf).collect()
    assert len(rows) == 2
    by_doc = {r.doc_id: r for r in rows}
    # doc 0's span starts at token 3: char_start = len("naïve café übermaß")+1
    assert by_doc[0].tok_start == 3
    assert by_doc[0].char_start == len(" ".join(prefix)) + 1
    assert by_doc[0].char_end == len(" ".join(doc_a))
    # the oracle must agree on the same non-ASCII fixture
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf}/documents.parquet')"
        )
        duck = con.execute(spec.oracle).fetchall()
    finally:
        con.close()
    got = sorted((r.doc_id, r.tok_start, r.char_start, r.char_end) for r in rows)
    want = sorted((r[0], r[1], r[5], r[6]) for r in duck)
    assert got == want


def test_ss13_multiprobe_recall_dominates_single_probe(spark):
    """Multi-probe candidates are a superset of the single bucket's, and
    both arms rank exact-top-k members consistently (rounded cosine,
    neighbor_id tie-break), so per-query recall_multi >= recall_single by
    construction — and on this fixture the probe width buys a strictly
    positive total lift (the reason ss15 exists)."""
    from tests.conftest import SF_MED

    rows = REGISTRY["ss13_ann_recall"].fn(spark, SF_MED).collect()
    assert len(rows) == 10
    for r in rows:
        assert r.recall_multi >= r.recall_single, r
    assert sum(r.n_hit_multi for r in rows) > sum(r.n_hit_single for r in rows)


def test_pl16_shards_are_contiguous_and_token_bounded(spark):
    """pl16's shards must (a) cover the emitted stream contiguously in
    the deterministic order — each shard's min_seq is its predecessor's
    max_seq + 1 — and (b) hold equal token mass up to one document: a
    doc lands by START offset, so any shard's deviation from the ideal
    size is bounded by the largest emitted doc's token count."""
    from pyspark.sql import functions as F

    from xarray_sql_spark.session import table

    rows = REGISTRY["pl16_shard_materialize"].fn(spark, SF_SMALL).collect()
    assert [r.shard for r in rows] == list(range(len(rows)))
    assert rows[0].min_seq == 1
    for prev, cur in zip(rows, rows[1:]):
        assert cur.min_seq == prev.max_seq + 1
    from xarray_sql_spark.queries.bpe_tokenizer import bpe_doc_counts

    total = sum(r.shard_tokens for r in rows)
    size = (total + 7) // 8
    max_doc = (
        bpe_doc_counts(spark, SF_SMALL).agg(F.max("n_tok")).collect()[0][0]
    )
    for r in rows[:-1]:
        assert abs(r.shard_tokens - size) <= max_doc, r
    assert rows[-1].shard_tokens <= size + max_doc


def test_dd14_flags_planted_cross_split_contamination(spark, tmp_path):
    """A val-split document sharing an 8-gram span with a train-split
    document must be flagged contaminated; an overlap-free val document
    must not be. Split membership is pl02's md5(doc_id) rule, so the
    test derives each candidate id's split first and plants texts
    accordingly."""
    import hashlib

    def split_of(i: int) -> str:
        b = int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % 100
        return "train" if b < 80 else ("val" if b < 90 else "test")

    n = 60
    splits = {i: split_of(i) for i in range(n)}
    train_id = next(i for i in range(n) if splits[i] == "train")
    val_ids = [i for i in range(n) if splits[i] == "val"]
    assert len(val_ids) >= 2, splits  # need a dirty and a clean val doc
    dirty, clean = val_ids[0], val_ids[1]
    span = _words("leak", 8)
    texts = []
    for i in range(n):
        if i == train_id:
            texts.append(" ".join(_words("trainpad", 4) + span))
        elif i == dirty:
            texts.append(" ".join(span + _words("valpad", 4)))
        elif i == clean:
            texts.append(" ".join(_words(f"clean{i}x", 12)))
        else:
            texts.append(" ".join(_words(f"fill{i}y", 12)))
    sf = _write_documents(tmp_path, texts)
    rows = {
        r.eval_split: r
        for r in REGISTRY["dd14_split_contamination"].fn(spark, sf).collect()
    }
    assert rows["val"].n_contaminated_docs == 1
    assert rows["val"].n_shared_gram_slots == 1  # exactly the planted gram
    if "test" in rows:
        assert rows["test"].n_contaminated_docs == 0
